"""Adam with per-variable learning rates, as a pure pytree transform.

Functional counterpart of ``mi.ad.Adam`` as the reference drives it
(``/root/reference/python/shape_opt.py:53``, per-key adaptive LR injection at
``variables.py:28-36,179-183``): one (m, v, t) state per parameter dict key,
learning rate passed *per step* so schedules (``32/res · lr/(1+0.02·i)``,
halvings at 480/500) stay outside the jitted update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["adam_init", "adam_step", "simple_lr_decay"]

_BETA1 = 0.9
_BETA2 = 0.999
_EPS = 1e-8


def adam_init(params: dict) -> dict:
    zeros = lambda p: jax.tree_util.tree_map(jnp.zeros_like, p)
    return {
        "m": zeros(params),
        "v": zeros(params),
        # per-key step counters: mi.ad.Adam resets a parameter's t (not just
        # m/v) when it changes shape, e.g. at grid upsampling
        "t": {k: jnp.zeros((), jnp.int32) for k in params},
    }


def adam_step(params: dict, grads: dict, state: dict, lr: dict, mask_updates: bool = False):
    """One Adam update.  ``lr`` maps each top-level key of ``params`` to a
    scalar learning rate (traced — schedules don't retrigger compilation).
    ``mask_updates`` reproduces ``mi.ad.Adam(mask_updates=True)``: state and
    parameters only move where the gradient is non-zero."""
    new_t = {k: state["t"][k] + 1 for k in params}

    new_params, new_m, new_v = {}, {}, {}
    for k in params:
        tf = new_t[k].astype(jnp.float32)
        c1 = 1.0 - _BETA1 ** tf
        c2 = 1.0 - _BETA2 ** tf

        def upd(p, g, m, v, c1=c1, c2=c2):
            m2 = _BETA1 * m + (1.0 - _BETA1) * g
            v2 = _BETA2 * v + (1.0 - _BETA2) * g * g
            if mask_updates:
                nz = g != 0
                m2 = jnp.where(nz, m2, m)
                v2 = jnp.where(nz, v2, v)
            step = lr[k] * (m2 / c1) / (jnp.sqrt(v2 / c2) + _EPS)
            if mask_updates:
                step = jnp.where(g != 0, step, 0.0)
            return p - step, m2, v2

        out = jax.tree_util.tree_map(upd, params[k], grads[k], state["m"][k], state["v"][k])
        # unzip the 3-tuples
        new_params[k] = jax.tree_util.tree_map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        new_m[k] = jax.tree_util.tree_map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        new_v[k] = jax.tree_util.tree_map(lambda o: o[2], out, is_leaf=lambda x: isinstance(x, tuple))
    return new_params, {"m": new_m, "v": new_v, "t": new_t}


def simple_lr_decay(initial_lr: float, decay: float, i) -> jnp.ndarray:
    """Reference LR schedule (variables.py:28-36): lr/(1+decay·i), further
    halved after iterations 480 and 500."""
    lr = initial_lr / (1.0 + decay * i)
    lr = jnp.where(i > 480, lr / 2.0, lr)
    lr = jnp.where(i > 500, lr / 2.0, lr)
    return lr
