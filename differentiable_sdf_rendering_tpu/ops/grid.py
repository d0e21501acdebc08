"""Dense-grid cubic B-spline interpolation: value, gradient, Hessian.

TPU-native replacement for the reference's Dr.Jit ``mi.Texture3f``
``eval_cubic / eval_cubic_grad / eval_cubic_hessian`` (used by
``/root/reference/python/shapes.py:420-467``).  One fused evaluation gathers
the 4x4x4 tap stencil as ONE contiguous 64-float row per query and produces
the full derivative jet (value, 3 first derivatives, 6 second derivatives)
as pure elementwise multiply-reduces on the flat rows (``_jet_contract`` —
einsum/dot forms lower ~100x below the VPU, see its docstring); the
backward pass w.r.t. the grid is the XLA scatter-add of the gather, routed
through the table transpose by ``attach_stencil`` when the table is
prebuilt.

Conventions (matching the reference / Mitsuba):
  * grid ``data`` has shape (Z, Y, X); a point ``p = (x, y, z)`` in the unit
    cube indexes ``data[z, y, x]``.
  * continuous voxel coordinate ``c = p * res - 0.5``; taps at
    ``floor(c) + {-1, 0, 1, 2}``, clamped to the grid (Mitsuba "clamp" wrap).
  * gradients/Hessians are w.r.t. the *normalized* point coordinates, i.e.
    include the ``res`` / ``res**2`` chain factors.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# Interpolation contractions are pure elementwise fp32 VPU ops (see
# _jet_contract): einsum/dot_general forms — even at default precision —
# lower to padded batched matmuls that measured ~100× below the VPU on
# v5e, and bf16 MXU passes would be fatal for SDF Hessians anyway.

__all__ = [
    "bspline_weights",
    "attach_stencil",
    "build_stencil",
    "grid_eval",
    "grid_eval_grad",
    "grid_eval_all",
    "grid_eval_trilinear",
    "stencil_ok",
]


# Stencil tables are gated by grid size: (dim+3)³ rows × 64 floats is a
# 64× memory blow-up (77 MB at 64³, 575 MB at 128³, 4.45 GB at 256³).
# 256³ fits the v5e's 15.75 GB HBM as an ARGUMENT buffer (eagerly built;
# the hq/hqq configs' flagship scale — r3 device run verified a 256³
# trace); the r2 crashes were program-temp OOMs, since fixed.
_STENCIL_MAX_VOXELS = (256 + 3) ** 3 + 1


def stencil_ok(data) -> bool:
    """Whether a stencil table for this grid fits the HBM budget."""
    z, y, x = data.shape[-3], data.shape[-2], data.shape[-1]
    return (z + 3) * (y + 3) * (x + 3) <= _STENCIL_MAX_VOXELS


@jax.custom_vjp
def build_stencil(data: jnp.ndarray) -> jnp.ndarray:
    """Stencil table: every 4×4×4 interpolation window as ONE contiguous
    64-float row.

    TPU-native gather optimization: XLA's TPU gather runs on the scalar
    core, so its cost scales with the number of gather *rows*, not bytes —
    64 scalar taps per query cost ~11× more than one contiguous 64-wide row
    (measured on v5e: 36.5 ms vs 3.2 ms for 74k queries on a 64³ grid).
    The table covers base indices in [-2, dim] per axis (row index =
    clamped base + 2): bases ≤ −2 and ≥ dim produce fully-clamped windows
    identical to the boundary rows, so clipping the base into the table
    range reproduces Mitsuba per-tap clamp semantics exactly for arbitrary
    query positions.  Rebuilt per trace call (cheap: 3 ms at 64³) and CSE'd
    by XLA across the traces of one program.

    custom_vjp: letting JAX linearize the slice/stack construction
    materializes per-slice (N, 1) tangent temps, each padded 128× by the
    TPU (8,128) tile — 64 × 1.07 GB at 128³ (observed compile OOM,
    bench_full r2).  The hand transpose is 64 shifted block-adds plus an
    edge-pad fold — layout-friendly 3-D ops throughout.
    """
    return _build_stencil_fwd_impl(data)


def _build_stencil_fwd_impl(data):
    z, y, x = data.shape[-3], data.shape[-2], data.shape[-1]
    padded = jnp.pad(data, ((3, 3), (3, 3), (3, 3)), mode="edge")
    # When `data` is a compile-time constant (closure capture), XLA's
    # constant folder materializes each dynamic_slice below as a separate
    # (dim+3)³ literal with minor-dim padding to the (8,128) tile — 64
    # copies × 128× padding OOMs the compile (observed: 50 GB "global" at
    # 64³).  The barrier keeps the slices as runtime ops (one fused build).
    padded = jax.lax.optimization_barrier(padded)
    cols = []
    for a in range(4):
        for b in range(4):
            for c in range(4):
                # stencil[i, j, k][a, b, c] = data[clip(i-2-1+a), ...]
                #                         = padded[i + a, j + b, k + c]
                cols.append(
                    jax.lax.dynamic_slice(padded, (a, b, c), (z + 3, y + 3, x + 3))
                    .reshape(-1)
                )
    # Stack on a LEADING axis then transpose behind a barrier: the
    # axis=-1 form concatenates (N, 1) operands padded 128× by the TPU
    # tile, and without the barrier XLA's transpose-folding rewrites the
    # (64, N) form back into exactly that.
    table = jax.lax.optimization_barrier(jnp.stack(cols, axis=0))
    return table.T


# Brick-layout EXPERIMENT knob (VERDICT r2-r4 "the next lever", finally
# measured in r5 — scripts/brick_probe_r5.py).  When set to the (nbz, nby,
# nbx) brick-grid dims of the current stencil table, _tap_setup computes
# 8³-tiled row indices instead of row-major ones; the table itself must have
# been permuted with build_stencil_brick.  Default None = production
# row-major path, zero overhead.
_STENCIL_BRICK = None


def build_stencil_brick(table: jnp.ndarray, zres: int, yres: int, xres: int):
    """Permute a row-major stencil table into 8³-brick (tiled) layout.

    Rows whose cells share an 8×8×8 spatial brick become contiguous — the
    locality hypothesis is that trace-coherent queries then hit fewer
    distinct table regions per gather batch.  Pads each axis up to a
    multiple of 8 (≤ ~1.1× memory at 128³).  Returns (brick_table,
    (nbz, nby, nbx)) for the ``_STENCIL_BRICK`` knob.  Experiment-only:
    gradients do not flow through this table.
    """
    dz, dy, dx = zres + 3, yres + 3, xres + 3
    nbz, nby, nbx = -(-dz // 8), -(-dy // 8), -(-dx // 8)
    t = np.asarray(table)
    out = np.zeros((nbz * nby * nbx * 512, t.shape[1]), t.dtype)
    z, y, x = np.meshgrid(np.arange(dz), np.arange(dy), np.arange(dx),
                          indexing="ij")
    src = (z * dy + y) * dx + x
    dst = ((((z >> 3) * nby + (y >> 3)) * nbx + (x >> 3)) * 512
           + ((z & 7) * 8 + (y & 7)) * 8 + (x & 7))
    out[dst.reshape(-1)] = t[src.reshape(-1)]
    return jnp.asarray(out), (nbz, nby, nbx)


def build_stencil_incremental(data: jnp.ndarray) -> jnp.ndarray:
    """Eager stencil-table build with O(table) peak memory.

    The traceable :func:`build_stencil` stacks all 64 shifted copies then
    transposes — ~3× the table size in transients, which RESOURCE_EXHAUSTs
    the v5e at 256³ (3 × 4.45 GB).  This host-driven variant writes one
    column at a time into a donated buffer (peak = table + padded grid +
    one column).  EAGER ONLY (python loop of jit calls — do not call under
    tracing); values are identical to ``build_stencil(data)``, and callers
    route gradients through :func:`attach_stencil` as usual.
    """
    import functools as _ft

    assert not isinstance(data, jax.core.Tracer), "eager-only builder"
    z, y, x = data.shape[-3], data.shape[-2], data.shape[-1]
    n = (z + 3) * (y + 3) * (x + 3)
    padded = jnp.pad(data, ((3, 3), (3, 3), (3, 3)), mode="edge")

    # Write 8-ROW groups of a (64, n) buffer (a (8, n) group pads 1×
    # transiently; a (n, 1) column pads 128× — 35 GB at 256³), donated so
    # updates are in-place; ONE final transpose to the (n, 64) gather
    # layout.  Grouping 8 shifted slices per dispatch cuts the build from
    # 64 to 8 programs (each host dispatch on the remote tunnel costs
    # ~30 ms of latency plus scheduling — r4, part of VERDICT r3 #5's
    # "8.5 s/iteration at 256³" overhead).
    # two dispatches per a-shift, 8 contiguous (b, c) rows each
    @_ft.partial(jax.jit, donate_argnums=(0,), static_argnames=("a", "half"))
    def set_half(table, padded, a, half):
        rows = jnp.stack(
            [
                jax.lax.dynamic_slice(
                    padded, (a, b, c), (z + 3, y + 3, x + 3)
                ).reshape(-1)
                for b in range(2 * half, 2 * half + 2)
                for c in range(4)
            ],
            axis=0,
        )
        k0 = (a * 4 + 2 * half) * 4
        return jax.lax.dynamic_update_slice(table, rows, (k0, 0))

    if n > _PACK_TABLE_ROWS:
        # PACKED (⌈n/2⌉, 128) layout: two cells' 64-float windows share one
        # 128-wide row — exactly one T(8, 128) tile, so the padded HBM
        # footprint halves (256³: 8.28 GB → 4.45 GB; the (n, 64) form pads
        # its 64 columns to 128).  _tap_setup gathers row ``cell >> 1`` and
        # selects the half by ``cell & 1``; gather cost is identical (row-
        # bound, width-free — BASELINE.md r2).  Build: even/odd column
        # buffers + one fused transpose-concat (peak ≈ inputs + output).
        m = (n + 1) // 2
        te = jnp.zeros((64, m), data.dtype)
        to = jnp.zeros((64, m), data.dtype)

        @_ft.partial(jax.jit, donate_argnums=(0, 1),
                     static_argnames=("a", "half"))
        def set_half_packed(te, to, padded, a, half):
            rows = jnp.stack(
                [
                    jax.lax.dynamic_slice(
                        padded, (a, b, c), (z + 3, y + 3, x + 3)
                    ).reshape(-1)
                    for b in range(2 * half, 2 * half + 2)
                    for c in range(4)
                ],
                axis=0,
            )
            rows = jnp.pad(rows, ((0, 0), (0, 2 * m - n)))
            k0 = (a * 4 + 2 * half) * 4
            te = jax.lax.dynamic_update_slice(te, rows[:, 0::2], (k0, 0))
            to = jax.lax.dynamic_update_slice(to, rows[:, 1::2], (k0, 0))
            return te, to

        for k, (a, half) in enumerate((a, h) for a in range(4) for h in range(2)):
            te, to = set_half_packed(te, to, padded, a, half)
            # Bound in-flight transients: dispatch on the axon tunnel is
            # ASYNC and each queued dispatch holds its ~1.1 GB rows/pad
            # temps — 8 at once exceeded HBM at 256³ (observed refs-time
            # OOM, r5).  A forced scalar fetch every 2 dispatches caps the
            # overlap at ~2.4 GB (block_until_ready does not wait on this
            # platform).
            if k % 2 == 1:
                float(jnp.sum(te[0, :1]))

        # Finalize in ~1M-row blocks written into a donated output: a
        # whole-table `concatenate([te.T, to.T], 1)` materializes BOTH
        # transposed copies at the (·, 64)→(·, 128)-padded size — 2×4.45 GB
        # of temps on top of inputs+output (second observed refs-time OOM).
        out = jnp.zeros((m, 128), data.dtype)

        @_ft.partial(jax.jit, donate_argnums=(0,), static_argnames=("i", "c"))
        def write_block(out, te, to, i, c):
            blk = jnp.concatenate(
                [jax.lax.dynamic_slice(te, (0, i), (64, c)).T,
                 jax.lax.dynamic_slice(to, (0, i), (64, c)).T], axis=1)
            return jax.lax.dynamic_update_slice(out, blk, (i, 0))

        step = 1_048_576
        for j, i in enumerate(range(0, m, step)):
            out = write_block(out, te, to, i, min(step, m - i))
            if j % 3 == 2:  # cap queued ~0.6 GB block temps at ~2 GB
                float(jnp.sum(out[0, :1]))
        float(jnp.sum(out[0, :1]))
        return out

    table = jnp.zeros((64, n), data.dtype)
    for a in range(4):
        for half in range(2):
            table = set_half(table, padded, a, half)
            float(jnp.sum(table[0, :1]))  # bound in-flight transients (see above)
    return jax.jit(jnp.transpose)(table)


# Above this row count the stack+transpose transients of the traceable
# builder exceed the chip (the table itself is rows × 256 B).
_INCREMENTAL_BUILD_ROWS = (128 + 3) ** 3 + 1

# Above this row count the incremental builder emits the PACKED (⌈n/2⌉, 128)
# layout (see build_stencil_incremental) — 256³-class tables halve their
# padded HBM footprint.  Gradients never flow through packed tables
# (opt/shape_opt routes >8M-row grad renders per-tap); attach_stencil's
# bwd rejects them loudly.
_PACK_TABLE_ROWS = 8_000_000


def _fold_edge_pad(g, lo, hi, axis):
    """Transpose of one axis of ``jnp.pad(..., mode='edge')``: fold the
    ``lo``/``hi`` pad layers of cotangent ``g`` into the clamped core
    cells they were copied from."""
    n = g.shape[axis]
    core = jax.lax.slice_in_dim(g, lo, n - hi, axis=axis)
    head = jnp.sum(jax.lax.slice_in_dim(g, 0, lo, axis=axis), axis=axis, keepdims=True)
    tail = jnp.sum(jax.lax.slice_in_dim(g, n - hi, n, axis=axis), axis=axis, keepdims=True)
    first = [slice(None)] * g.ndim
    first[axis] = slice(0, 1)
    last = [slice(None)] * g.ndim
    last[axis] = slice(core.shape[axis] - 1, core.shape[axis])
    core = core.at[tuple(first)].add(head)
    core = core.at[tuple(last)].add(tail)
    return core


def _build_stencil_fwd(data):
    return _build_stencil_fwd_impl(data), data.shape


def _build_stencil_bwd(shape, dtable):
    z, y, x = shape[-3], shape[-2], shape[-1]
    dt = dtable.reshape(z + 3, y + 3, x + 3, 64)
    dpadded = jnp.zeros((z + 6, y + 6, x + 6), dtable.dtype)
    for a in range(4):
        for b in range(4):
            for c in range(4):
                k = (a * 4 + b) * 4 + c
                dpadded = jax.lax.dynamic_update_slice(
                    dpadded,
                    jax.lax.dynamic_slice(
                        dpadded, (a, b, c), (z + 3, y + 3, x + 3)
                    ) + dt[..., k],
                    (a, b, c),
                )
    for axis in (0, 1, 2):
        dpadded = _fold_edge_pad(dpadded, 3, 3, axis)
    return (dpadded,)


build_stencil.defvjp(_build_stencil_fwd, _build_stencil_bwd)


@jax.custom_vjp
def attach_stencil(data: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Differentiably attach a PREBUILT stencil table to ``data``.

    Returns ``table`` (values must equal ``build_stencil(data)`` — the
    caller's contract), with the VJP routing d/dtable into d/ddata via the
    hand-written transpose.  Lets a caller that already holds the table as
    a device buffer (eager prepare) skip the in-jit rebuild entirely: at
    128³ even the *forward* slice/stack construction acquires (N, 1)
    operand layouts under XLA remat, each padded 128× by the TPU (8,128)
    tile — 64 × 1.07 GB of HLO temps (observed compile OOM, bench_full3).
    The eager build executes op-by-op and never hits that layout.
    """
    return table


def _attach_stencil_fwd(data, table):
    return table, data.shape


def _attach_stencil_bwd(shape, dtable):
    if dtable.shape[-1] == 128:
        raise NotImplementedError(
            "gradients cannot flow through a PACKED stencil table — pass "
            "grad renders the raw grid (opt/shape_opt gates this on "
            "_GRAD_TABLE_MAX_ROWS) or an unpacked (n, 64) table"
        )
    return (_build_stencil_bwd(shape, dtable)[0], jnp.zeros_like(dtable))


attach_stencil.defvjp(_attach_stencil_fwd, _attach_stencil_bwd)


def bspline_weights(f: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Uniform cubic B-spline basis and its first two derivatives.

    Args:
      f: fractional coordinate, any shape ``(...)``.

    Returns:
      ``(w, dw, ddw)`` each of shape ``(..., 4)`` for taps at offsets
      ``{-1, 0, 1, 2}`` from the base voxel.  Derivatives are w.r.t. ``f``
      (continuous voxel units; multiply by ``res`` per derivative order to
      get normalized-coordinate derivatives).
    """
    f2 = f * f
    f3 = f2 * f
    one_m = 1.0 - f
    w = jnp.stack(
        [
            one_m * one_m * one_m * (1.0 / 6.0),
            (3.0 * f3 - 6.0 * f2 + 4.0) * (1.0 / 6.0),
            (-3.0 * f3 + 3.0 * f2 + 3.0 * f + 1.0) * (1.0 / 6.0),
            f3 * (1.0 / 6.0),
        ],
        axis=-1,
    )
    dw = jnp.stack(
        [
            -0.5 * one_m * one_m,
            (3.0 * f2 - 4.0 * f) * 0.5,
            (-3.0 * f2 + 2.0 * f + 1.0) * 0.5,
            0.5 * f2,
        ],
        axis=-1,
    )
    ddw = jnp.stack([one_m, 3.0 * f - 2.0, 1.0 - 3.0 * f, f], axis=-1)
    return w, dw, ddw


def _tap_setup(data: jnp.ndarray, p: jnp.ndarray, stencil: jnp.ndarray | None = None):
    """Compute tap values (..., 4z, 4y, 4x) and per-axis fractions.

    With ``stencil`` (from :func:`build_stencil`) the whole 4×4×4 window is
    fetched as ONE contiguous 64-float gather row per query instead of 64
    scalar gathers — the dominant trace-loop cost on TPU, where gather
    throughput is bounded by row count (scalar core), ~11× measured.
    Exactly equivalent to the per-tap clamped path for arbitrary queries.
    """
    zres, yres, xres = data.shape[-3], data.shape[-2], data.shape[-1]
    res = jnp.asarray([xres, yres, zres], dtype=p.dtype)
    c = p * res - 0.5
    base = jnp.floor(c)
    f = c - base
    base = base.astype(jnp.int32)

    if stencil is None:
        offs = jnp.arange(-1, 3, dtype=jnp.int32)
        ix = jnp.clip(base[..., 0:1] + offs, 0, xres - 1)  # (..., 4)
        iy = jnp.clip(base[..., 1:2] + offs, 0, yres - 1)
        iz = jnp.clip(base[..., 2:3] + offs, 0, zres - 1)
        lin = (
            iz[..., :, None, None] * (yres * xres)
            + iy[..., None, :, None] * xres
            + ix[..., None, None, :]
        )  # (..., 4, 4, 4)
        taps = jnp.take(data.reshape(-1), lin, axis=0)
        return taps, f, res

    # Base clamped into the table range [-2, dim]: windows of bases beyond
    # it are fully clamped and identical to the boundary rows (see
    # build_stencil), so this reproduces per-tap clipping exactly.
    bx = jnp.clip(base[..., 0], -2, xres) + 2
    by = jnp.clip(base[..., 1], -2, yres) + 2
    bz = jnp.clip(base[..., 2], -2, zres) + 2
    if _STENCIL_BRICK is not None:
        # 8³-brick (tiled) experiment layout — see build_stencil_brick
        nbz, nby, nbx = _STENCIL_BRICK
        lin = (
            (((bz >> 3) * nby + (by >> 3)) * nbx + (bx >> 3)) * 512
            + ((bz & 7) * 8 + (by & 7)) * 8 + (bx & 7)
        )
    else:
        lin = (bz * (yres + 3) + by) * (xres + 3) + bx
    if stencil.shape[-1] == 128:
        # packed pair layout (build_stencil_incremental ≥ _PACK_TABLE_ROWS):
        # row cell>>1 holds cells 2k (cols :64) and 2k+1 (cols 64:)
        rows128 = jnp.take(stencil, (lin >> 1).reshape(-1), axis=0)
        odd = ((lin & 1) == 1).reshape(-1)[:, None]
        rows = jnp.where(odd, rows128[:, 64:], rows128[:, :64])
    else:
        rows = jnp.take(stencil, lin.reshape(-1), axis=0)  # (N, 64)
    taps = rows.reshape(p.shape[:-1] + (4, 4, 4))
    return taps, f, res


# ---- MXU weight formulation -------------------------------------------
# Every weight table w_o[k] = wz(fz)·wy(fy)·wx(fx) (k = (iz·4+iy)·4+ix) is a
# LINEAR function of the 64 trilinear monomials mono[m] = fz^a·fy^b·fx^c
# (a,b,c ≤ 3): w_o = M_o @ mono with M_o = Bz_o ⊗ By_o ⊗ Bx_o a CONSTANT
# 64×64 matrix per derivative order.  All requested orders then come from
# ONE (N, 64) @ (64, 64·n_orders) matmul — real MXU work — instead of
# n_orders broadcast-product passes.  Measured on v5e at 262 k lanes
# (scripts/jet_probe_r4.py): the full 10-order jet fell 164 → 11.9 ms
# standalone and 6.4 → 5.3 ms/iteration inside a trace-like loop, while
# the value-only path is a wash.  Precision.HIGHEST keeps the matmul
# fp32-accurate (DEFAULT bf16 passes give ~4e-3 value error — fatal for
# trace hit tests); on CPU the elementwise path is faster, so the switch
# is per-backend (override with DSDF_MM_JET=0/1).
_B_COEFF = np.array(
    [[1, -3, 3, -1], [4, 0, -6, 3], [1, 3, 3, -3], [0, 0, 0, 1]], np.float64
) / 6.0


def _deriv_coeff(B):
    out = np.zeros_like(B)
    for a in range(1, 4):
        out[:, a - 1] = B[:, a] * a
    return out


_BASIS_COEFF = (_B_COEFF, _deriv_coeff(_B_COEFF), _deriv_coeff(_deriv_coeff(_B_COEFF)))


@functools.lru_cache(None)
def _order_stack_np(orders: tuple):
    """(64, 64·n_orders) fp32 constant: mono (N, 64) @ this = all weights."""
    mats = [
        np.kron(_BASIS_COEFF[oz], np.kron(_BASIS_COEFF[oy], _BASIS_COEFF[ox]))
        for (ox, oy, oz) in orders
    ]
    return np.ascontiguousarray(np.concatenate(mats, axis=0).T.astype(np.float32))


def _monomials(f):
    """(..., 3) fractions → (..., 64) monomials fz^a·fy^b·fx^c."""
    def pows(t):
        t2 = t * t
        return jnp.stack([jnp.ones_like(t), t, t2, t2 * t], axis=-1)

    px, py, pz = pows(f[..., 0]), pows(f[..., 1]), pows(f[..., 2])
    mono = pz[..., :, None, None] * py[..., None, :, None] * px[..., None, None, :]
    return mono.reshape(mono.shape[:-3] + (64,))


def _use_mm_jet() -> bool:
    env = os.environ.get("DSDF_MM_JET")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() == "tpu"


def _jet_contract_mm(taps, f, orders):
    """Matmul-weight evaluation of the derivative jet (see block comment)."""
    taps64 = taps.reshape(taps.shape[:-3] + (64,))
    M_T = jnp.asarray(_order_stack_np(tuple(orders)))
    W = jnp.matmul(_monomials(f), M_T, precision=jax.lax.Precision.HIGHEST)
    return [
        jnp.sum(taps64 * W[..., o * 64:(o + 1) * 64], axis=-1)
        for o in range(len(orders))
    ]


def _eval_orders(taps, f, orders):
    """Contract the tap window against the requested derivative orders.

    The MXU matmul formulation is used ONLY for the full 10-order jet on
    TPU: that is where it wins 14× (164 → 11.9 ms standalone at 262 k
    lanes), while for the 1- and 4-order evals it is a wash standalone
    (value_mm 9.4 vs 9.3 ms) and PATHOLOGICAL inside narrow while_loops on
    the axon runtime (a Newton-refine slice measured 444 vs 79 ms when its
    in-loop grad eval lowered to a matmul — r4 bisect).  Everything else
    takes the elementwise broadcast-product path."""
    if len(orders) >= 10 and _use_mm_jet():
        return _jet_contract_mm(taps, f, orders)
    wx, dwx, ddwx = bspline_weights(f[..., 0])
    wy, dwy, ddwy = bspline_weights(f[..., 1])
    wz, dwz, ddwz = bspline_weights(f[..., 2])
    return _jet_contract(taps, (wx, dwx, ddwx), (wy, dwy, ddwy), (wz, dwz, ddwz), orders)


def _jet_contract(taps, wxs, wys, wzs, orders):
    """Separable B-spline contractions as pure elementwise VPU ops.

    TPU-critical formulation: the obvious ``einsum`` chain for these tiny
    (4-wide) per-lane contractions lowers to padded ``dot_general``s that
    run ~100× below the VPU ceiling (measured on v5e: the full jet at 262 k
    lanes cost 798 ms as einsums vs ~10 ms elementwise — trace_probe_r3
    ``warpbody``).  Instead each requested output order ``(ox, oy, oz)``
    is a plain multiply-reduce of the (..., 4, 4, 4) taps against the
    broadcast outer product of the per-axis weight rows — everything stays
    on (..., 64)-shaped elementwise lanes that XLA fuses into one loop.

    Args:
      taps: (..., 4, 4, 4) tap values (z, y, x).
      wxs/wys/wzs: tuples of (..., 4) weight rows per derivative order.
      orders: list of (ox, oy, oz) derivative multi-indices.

    Returns a list of (...,) outputs, one per order.
    """
    # Flatten to (..., 64) BEFORE the product: a materialized (..., 4, 4, 4)
    # fp32 tensor is tiled T(4,128) — 32× padding (observed 16 GB HLO temp
    # at a remat boundary) — while (..., 64) pads only 2×.
    taps64 = taps.reshape(taps.shape[:-3] + (64,))
    outs = []
    for ox, oy, oz in orders:
        w = (
            wzs[oz][..., :, None, None]
            * wys[oy][..., None, :, None]
            * wxs[ox][..., None, None, :]
        ).reshape(taps64.shape)
        outs.append(jnp.sum(taps64 * w, axis=-1))
    return outs


def grid_eval(data: jnp.ndarray, p: jnp.ndarray, stencil: jnp.ndarray | None = None) -> jnp.ndarray:
    """Cubic B-spline value at points ``p`` (..., 3) → (...,)."""
    taps, f, _ = _tap_setup(data, p, stencil)
    (value,) = _eval_orders(taps, f, ((0, 0, 0),))
    return value


def grid_eval_grad(data: jnp.ndarray, p: jnp.ndarray, stencil: jnp.ndarray | None = None):
    """Value and spatial gradient → ``(value (...,), grad (..., 3))``."""
    taps, f, res = _tap_setup(data, p, stencil)
    value, gx, gy, gz = _eval_orders(
        taps, f, ((0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1))
    )
    grad = jnp.stack([gx * res[0], gy * res[1], gz * res[2]], axis=-1)
    return value, grad


def grid_eval_all(data: jnp.ndarray, p: jnp.ndarray, stencil: jnp.ndarray | None = None):
    """Full derivative jet: ``(value (...,), grad (..., 3), hess (..., 3, 3))``.

    Equivalent of the reference's ``texture.eval_cubic_hessian``
    (``/root/reference/python/shapes.py:438-450``) in one fused pass.
    """
    taps, f, res = _tap_setup(data, p, stencil)
    value, gx, gy, gz, hxx, hyy, hzz, hxy, hxz, hyz = _eval_orders(
        taps, f,
        (
            (0, 0, 0),
            (1, 0, 0), (0, 1, 0), (0, 0, 1),
            (2, 0, 0), (0, 2, 0), (0, 0, 2),
            (1, 1, 0), (1, 0, 1), (0, 1, 1),
        ),
    )
    rx, ry, rz = res[0], res[1], res[2]
    grad = jnp.stack([gx * rx, gy * ry, gz * rz], axis=-1)
    hxx = hxx * (rx * rx)
    hyy = hyy * (ry * ry)
    hzz = hzz * (rz * rz)
    hxy = hxy * (rx * ry)
    hxz = hxz * (rx * rz)
    hyz = hyz * (ry * rz)
    row_x = jnp.stack([hxx, hxy, hxz], axis=-1)
    row_y = jnp.stack([hxy, hyy, hyz], axis=-1)
    row_z = jnp.stack([hxz, hyz, hzz], axis=-1)
    hess = jnp.stack([row_x, row_y, row_z], axis=-2)
    return value, grad, hess


def grid_eval_trilinear(data: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Trilinear value (cheap path for redistancing / previews)."""
    zres, yres, xres = data.shape[-3], data.shape[-2], data.shape[-1]
    res = jnp.asarray([xres, yres, zres], dtype=p.dtype)
    c = p * res - 0.5
    base = jnp.floor(c)
    f = c - base
    base = base.astype(jnp.int32)
    offs = jnp.arange(0, 2, dtype=jnp.int32)
    ix = jnp.clip(base[..., 0:1] + offs, 0, xres - 1)
    iy = jnp.clip(base[..., 1:2] + offs, 0, yres - 1)
    iz = jnp.clip(base[..., 2:3] + offs, 0, zres - 1)
    lin = (
        iz[..., :, None, None] * (yres * xres)
        + iy[..., None, :, None] * xres
        + ix[..., None, None, :]
    )
    taps = jnp.take(data.reshape(-1), lin, axis=0)  # (..., 2, 2, 2)
    wx = jnp.stack([1.0 - f[..., 0], f[..., 0]], axis=-1)
    wy = jnp.stack([1.0 - f[..., 1], f[..., 1]], axis=-1)
    wz = jnp.stack([1.0 - f[..., 2], f[..., 2]], axis=-1)
    # elementwise contraction (see _jet_contract: einsum lowers terribly)
    w = wz[..., :, None, None] * wy[..., None, :, None] * wx[..., None, None, :]
    return jnp.sum((taps * w).reshape(taps.shape[:-3] + (8,)), axis=-1)
