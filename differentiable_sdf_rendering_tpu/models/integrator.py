"""Reparameterized integrators and the wavefront render pipeline.

TPU-native re-design of the reference integrator stack
(``/root/reference/python/integrators/``): one jit-compiled wavefront over
``(W+2b)·(H+2b)·spp`` ray lanes per (view, mode), with

  * primal mode   — fast non-diff sphere trace, detached splat positions
    (reparam.py:120-185 with reparam=False),
  * grad mode     — warp-field reparameterized directions, attached
    determinants, attached film-position/filter-weight reweighting
    (reparam.py:82-118, sdf_direct_reparam.py:16-111).

Integrators (registered by name, like the reference's Mitsuba plugins):
  * ``sdf_silhouette_reparam``      — binary coverage × det
  * ``sdf_simple_shading_reparam``  — headlight n·l debug shading × det
  * ``sdf_direct_reparam``          — direct illumination with detached NEE,
    reparameterized shadow rays at depth 1, optional MIS BSDF sampling.

The primal/grad split mirrors the reference's usage: the training loop
renders primal at high spp, takes dLoss/dimage, and pulls it back through a
(lower-spp) grad-mode render via ``jax.vjp`` — exactly ``mi.render(...,
spp, spp_grad)`` + ``dr.backward`` (shape_opt.py:78-83).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.film import BORDER, develop, splat
from ..ops.interaction import compute_surface_interaction, coordinate_frame
from ..ops.sampling import lane_uniforms, mis_weight
from ..ops.sdf import GridSDF, TraceParams
from ..ops.trace import sphere_trace
from ..ops.vecmath import normalize, replace_grad
from ..ops.warp import WarpConfig, reparameterize
from ..ops.warp_conv import ConvWarpConfig

__all__ = ["RenderConfig", "render", "render_primal", "render_grad"]


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render settings (one jit cache entry per distinct config)."""

    integrator: str = "sdf_direct_reparam"
    spp: int = 64
    use_mis: bool = False           # sdf_direct_reparam.py props
    hide_emitters: bool = False
    sample_border: bool = True
    detach_indirect_si: bool = False   # ablations (sdf_direct_reparam.py:13-14)
    decouple_reparam: bool = False
    # debug ablations (gradient-decomposition tooling; all off by default)
    debug_detach_nee_throughput: bool = False
    debug_detach_normals: bool = False
    debug_nondiff_si: bool = False
    debug_detach_splat: bool = False
    shadow_eps: float = 1e-3
    warp: WarpConfig = WarpConfig()
    trace: TraceParams = TraceParams()
    max_depth: int = 4
    # False ⇒ DummyWarpField semantics: no reparameterization, det ≡ 1,
    # shading gradients only (reference warp.py:179-196, 'onlyshadinggrad')
    use_warp: bool = True
    # 'warp' (ours) | 'conv' (Bangaru et al. baseline) | 'dummy'
    warp_kind: str = "warp"
    conv: ConvWarpConfig = ConvWarpConfig()
    # mirrored pixel-jitter pairs (reparam.py:19,167-178; used in evaluation)
    antithetic_sampling: bool = False
    # Scatter-free film accumulation (ops/film.splat_pixel_major) whenever
    # the wavefront is pixel-major and spp-aligned — a large TPU win (XLA
    # scatter-add is row-serial).  Escape hatch for callers that hand
    # render_lane_block a non-contiguous lane set.
    dense_splat: bool = True


def _ray_intersect(scene, o, d, depth, cfg: RenderConfig, mode, uni_conv=None, maxt=jnp.inf,
                   occlusion=False):
    """Hybrid intersect (reparam.py:201-232): SDF sphere trace merged with
    the optional auxiliary TriangleMesh by nearest t.  Returns
    (its_t, d_reparam, det, mesh_aux) where ``mesh_aux`` is None for
    pure-SDF scenes and ``(mesh_t, mesh_n)`` otherwise.  ``maxt`` bounds the
    ray extent (finite-distance shadow rays to area emitters,
    sdf_direct_reparam.py:39-53).

    ``occlusion=True`` marks a binary visibility query: the 10-step
    intersection refinement is skipped (it moves ``its_t`` by O(ε) but never
    flips finite↔inf, so ``isfinite(its_t)`` — the only consumed bit — is
    invariant; skipping saves ~10 grid evals on every shadow-hit lane).
    ``occlusion`` may also be a per-lane bool array: refinement then runs
    masked to the non-occlusion lanes, letting one merged trace carry shadow
    and scattering rays together (the adjoint's NEE+MIS fusion)."""
    refine_active = True
    if isinstance(occlusion, jnp.ndarray):
        refine_active = ~occlusion
    elif occlusion and cfg.trace.refine_intersection:
        cfg = dataclasses.replace(cfg, trace=dataclasses.replace(cfg.trace, refine_intersection=False))
    reparam = mode != "primal" and cfg.use_warp and cfg.warp_kind != "dummy"
    if reparam and cfg.warp.max_reparam_depth >= 0 and depth > cfg.warp.max_reparam_depth:
        reparam = False
    if not reparam:
        its_t = sphere_trace(scene.sdf, o, d, cfg.trace, maxt=maxt,
                             refine_active=refine_active)
        d1, det = d, jnp.ones(o.shape[:-1], o.dtype)
    elif cfg.warp_kind == "conv":
        from ..ops.warp_conv import conv_reparameterize

        its_t = sphere_trace(scene.sdf, o, d, cfg.trace, maxt=maxt)
        n_aux = cfg.conv.n_aux_rays
        u = uni_conv.reshape(uni_conv.shape[:-1] + (n_aux, 2))
        d1, det = conv_reparameterize(scene.sdf, o, d, u, cfg.conv, cfg.trace)
    else:
        its_t, d1, det = reparameterize(scene.sdf, o, d, cfg.warp, cfg.trace, maxt=maxt,
                                        refine_active=refine_active)
    if scene.mesh is None:
        return its_t, d1, det, None
    from ..ops.mesh_intersect import mesh_intersect_full

    # Intersect the *reparameterized* ray, like the reference's hybrid path
    # (reparam.py:218-223): mesh radiance seen past a moving SDF silhouette
    # then carries the correct boundary gradient through d1.
    mt, mn, malb, mmir = mesh_intersect_full(scene.mesh, o, d1)
    its_t = jnp.minimum(its_t, mt)
    return its_t, d1, det, (mt, mn, malb, mmir)


def _compute_si(scene, o, d1, its_t, maux, differentiable):
    """Surface interaction of the merged hit: SDF SI, overridden on lanes
    whose nearest hit is the mesh (geometric mesh normal, hit point
    attached through d1 and the Möller–Trumbore t).  Returns (si, is_mesh)."""
    si = compute_surface_interaction(scene.sdf, o, d1, its_t, differentiable=differentiable)
    if maux is None:
        return si, jnp.zeros(its_t.shape, bool)
    mt, mn = maux[0], maux[1]
    is_mesh = jnp.isfinite(mt) & (mt <= its_t)
    t_m = jnp.where(is_mesh, mt, 0.0)
    p_m = o + t_m[..., None] * d1
    n_m = mn
    s_m, b_m = coordinate_frame(jax.lax.stop_gradient(n_m))
    m3 = is_mesh[..., None]
    si = si.replace(
        valid=si.valid | is_mesh,
        t=jnp.where(is_mesh, t_m, si.t),
        p=jnp.where(m3, p_m, si.p),
        n=jnp.where(m3, n_m, si.n),
        s=jnp.where(m3, s_m, si.s),
        b=jnp.where(m3, b_m, si.b),
    )
    # wi lives in the local frame — recompute it in the overridden frame
    si = si.replace(wi=jnp.where(m3, si.to_local(-d1), si.wi))
    return si, is_mesh


def _si_where(m, a, b):
    """Per-lane select between two SurfaceInteractions (bool mask (N,))."""
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(m.reshape(m.shape + (1,) * (x.ndim - m.ndim)), x, y), a, b
    )


def _mesh_diffuse(albedo, wo_local):
    """Lambertian eval/pdf of an auxiliary-mesh surface — mixed scenes give
    extra geometry BSDFs distinct from the SDF's (result_utils.py studio
    rig).  ``albedo``: the per-lane hit-triangle reflectance (..., 3)."""
    cos = jnp.maximum(wo_local[..., 2], 0.0)
    return albedo * (cos / jnp.pi)[..., None], cos / jnp.pi


def _conv_uni(uni, cfg, depth):
    if cfg.warp_kind != "conv":
        return None
    n = 2 * cfg.conv.n_aux_rays
    return uni[:, 6 + depth * n : 6 + (depth + 1) * n]


def _sample_silhouette(scene, o, d, uni, cfg, mode):
    its_t, d1, det, _ = _ray_intersect(scene, o, d, 0, cfg, mode, _conv_uni(uni, cfg, 0))
    hit = jnp.isfinite(its_t).astype(o.dtype)
    rgb = (hit * det)[..., None] * jnp.ones((3,), o.dtype)
    return rgb, jnp.ones_like(hit, bool), det, d1


def _sample_simple_shading(scene, o, d, uni, cfg, mode):
    its_t, d1, det, maux = _ray_intersect(scene, o, d, 0, cfg, mode, _conv_uni(uni, cfg, 0))
    si, _ = _compute_si(scene, o, d1, its_t, maux, differentiable=mode != "primal")
    l_dir = normalize(jnp.asarray([1.0, 1.0, 1.0], o.dtype))
    shade = jnp.maximum(jnp.sum(si.n * l_dir, -1), 0.0)
    shade = jnp.where(si.valid, shade, 0.0)
    rgb = (shade * det)[..., None] * jnp.ones((3,), o.dtype)
    return rgb, jnp.ones_like(shade, bool), det, d1


def _emitted_along(scene, p, d):
    """Total emitted radiance arriving at ``p`` from direction ``d`` plus the
    occlusion distance of the nearest emitter-geometry hit (inf = none): the
    area-emitter rect is opaque scene geometry whose front face emits
    (``si.emitter(scene).eval(si)``, sdf_direct_reparam.py:31); past it (or
    with no rect) the environment emitter is seen."""
    env = scene.emitter.eval(d)
    if scene.area_emitter is None:
        return env, jnp.full(d.shape[:-1], jnp.inf)
    t_geo = scene.area_emitter.occlude_t(p, d)
    t_front = scene.area_emitter.ray_hit(p, d)
    rad = jnp.where(
        jnp.isfinite(t_front)[..., None],
        jnp.broadcast_to(scene.area_emitter.radiance, env.shape),
        jnp.where(jnp.isfinite(t_geo)[..., None], 0.0, env),
    )
    return rad, t_geo


def _area_select_prob(scene):
    """Probability of picking the area emitter in the NEE mixture,
    proportional to approximate emitter power (Mitsuba importance-weights
    emitter selection; a 50/50 split wastes half the budget on a dim
    ambient in ``plane_area``-style scenes).  Detached scalar, clipped away
    from {0, 1} so both mixture components keep nonzero density wherever
    they carry radiance (unbiasedness of the MIS weights)."""
    pa = scene.area_emitter.power_proxy()
    pe = scene.emitter.power_proxy()
    p = pa / jnp.maximum(pa + pe, 1e-12)
    return jax.lax.stop_gradient(jnp.clip(p, 0.02, 0.98))


def _emitter_pdf(scene, p, d):
    """Solid-angle density of :func:`_nee_sample` at ``p`` producing ``d``
    (Mitsuba's ``scene.pdf_emitter_direction`` for MIS)."""
    pdf = scene.emitter.pdf_direction(d)
    if scene.area_emitter is None:
        return pdf
    p_area = _area_select_prob(scene)
    return (1.0 - p_area) * pdf + p_area * scene.area_emitter.pdf_direction_from(p, d)


def _nee_sample(scene, p, u2):
    """Sample an emitter direction from ``p`` (detached, like the
    reference's detached emitter sampling): returns
    ``(d, pdf, radiance, maxt)`` where ``maxt`` is the distance to the
    emitter surface (inf for environment directions) that bounds the shadow
    ray.  With both an environment and an area emitter present the sampler
    is a power-proportional direction mixture (:func:`_area_select_prob`)."""
    if scene.area_emitter is None:
        d, pdf, rad = scene.emitter.sample_direction(u2)
        return d, pdf, rad, jnp.full(pdf.shape, jnp.inf)
    p_area = _area_select_prob(scene)
    pick_area = u2[..., 0] < p_area
    # re-stretch the selector uniform for reuse in the chosen branch
    u0 = jnp.where(
        pick_area, u2[..., 0] / p_area, (u2[..., 0] - p_area) / (1.0 - p_area)
    )
    u = jnp.stack([jnp.clip(u0, 0.0, 1.0), u2[..., 1]], -1)
    d_env, _, _ = scene.emitter.sample_direction(u)
    d_area, _, _, _ = scene.area_emitter.sample_from(p, u)
    d = jnp.where(pick_area[..., None], d_area, d_env)
    pdf = _emitter_pdf(scene, p, d)
    rad, t_geo = _emitted_along(scene, p, d)
    return d, pdf, rad, t_geo


def _sample_direct(scene, o, d, uni, cfg: RenderConfig, mode):
    """Direct illumination with NEE (sdf_direct_reparam.py:16-111)."""
    reparametrize = mode != "primal"
    its_t, d1, det, maux = _ray_intersect(scene, o, d, 0, cfg, mode, _conv_uni(uni, cfg, 0))
    si, is_mesh = _compute_si(
        scene, o, d1, its_t, maux,
        differentiable=reparametrize and not cfg.debug_nondiff_si,
    )
    if cfg.debug_detach_normals:
        si = si.replace(n=jax.lax.stop_gradient(si.n), wi=jax.lax.stop_gradient(si.wi))

    tint = jnp.ones(o.shape[:-1] + (3,), o.dtype)
    m_alb = maux[2] if maux is not None else None
    if scene.mesh is not None and scene.mesh.material != "diffuse":
        # One specular bounce (the reference's mirror-opt scene,
        # opt_configs.py:257-273): lanes whose nearest hit is a mirror
        # triangle continue along the reflected ray.  The depth-1
        # re-intersect is itself reparameterized, so silhouette gradients of
        # the SDF *seen in the mirror* flow through the reflected direction —
        # the nested/indirect-reparam capability the scene demonstrates.
        # With material="mixed" the bounce applies per lane (hit-triangle
        # mirror bit); diffuse-mesh lanes keep their Lambertian shading.
        assert cfg.warp_kind != "conv", "mirror scenes unsupported with conv warp"
        assert not cfg.decouple_reparam, "mirror scenes unsupported with decouple_reparam"
        is_mirror = is_mesh & maux[3]
        n_m = si.n  # mirror lanes carry the (static) facet normal
        d_r = d1 - 2.0 * jnp.sum(d1 * n_m, -1, keepdims=True) * n_m
        o_r = jnp.where(is_mirror[..., None], si.p + d_r * cfg.shadow_eps, o)
        d_r = jnp.where(is_mirror[..., None], d_r, d1)
        t2, d2, det2, maux2 = _ray_intersect(scene, o_r, d_r, 1, cfg, mode, None)
        si2, is_mesh2 = _compute_si(
            scene, o_r, d2, t2, maux2,
            differentiable=reparametrize and not cfg.debug_nondiff_si,
        )
        # merge: mirror lanes take the reflected-hit state; a second mesh
        # hit seen in the mirror absorbs (planar mirror: only grazing lanes
        # can re-hit the mirror; reflected diffuse-mesh shading is a
        # documented simplification)
        si = _si_where(is_mirror, si2.replace(valid=si2.valid & ~is_mesh2), si)
        its_t = jnp.where(is_mirror, t2, its_t)
        o = jnp.where(is_mirror[..., None], o_r, o)
        dl = jnp.where(is_mirror[..., None], d2, d1)  # emitted-lookup dir
        det = det * jnp.where(is_mirror, det2, 1.0)
        tint = jnp.where(is_mirror[..., None], m_alb, tint)
        is_mesh = is_mesh & ~is_mirror
        if scene.mesh.material == "mirror":
            maux = None  # compile the Lambertian mesh shading out entirely
            m_alb = None
    else:
        dl = d1

    throughput = det[..., None] * tint  # (N, 3): reparam det × mirror tint
    # Emitted radiance seen by the (possibly mirror-reflected) ray:
    # environment on escaped lanes, the area emitter's front face where its
    # rect is the nearest hit (attached direction → silhouette gradients of
    # the background, sdf_direct_reparam.py:31)
    emitted, t_light = _emitted_along(scene, o, dl)
    light_first = jnp.isfinite(t_light) & (t_light < its_t)
    # surface shading only where the SDF/mesh hit is nearest
    shade = si.valid & ~light_first
    see_emitted = (light_first | ~si.valid) & (not cfg.hide_emitters)
    result = jnp.where(see_emitted[..., None], emitted, 0.0) * throughput
    valid_ray = si.valid | light_first | (not cfg.hide_emitters)

    # ---------------- Emitter sampling (NEE) ----------------
    active_e = shade
    si_p_det = jax.lax.stop_gradient(si.p)
    ds_d, ds_pdf, ds_rad, ds_dist = _nee_sample(
        scene, si_p_det, jax.lax.stop_gradient(uni[:, 2:4])
    )
    ds_d = jax.lax.stop_gradient(ds_d)
    ds_pdf = jax.lax.stop_gradient(ds_pdf)
    ds_dist = jax.lax.stop_gradient(ds_dist)
    active_e = active_e & (ds_pdf > 0)
    if cfg.detach_indirect_si:
        shadow_o = si_p_det
    elif cfg.decouple_reparam:
        # spawn from the interaction of the *unreparameterized* ray
        # (sdf_direct_reparam.py:46-47 'si_d0'): p attached through the
        # implicit depth but not through the warped direction
        si_d0 = compute_surface_interaction(scene.sdf, o, d, its_t, differentiable=reparametrize)
        shadow_o = si_d0.p
    else:
        shadow_o = si.p  # attached: nested-reparam (sdf_direct_reparam.py:49)
    shadow_o = shadow_o + ds_d * cfg.shadow_eps
    # Finite-distance shadow ray: stop just short of the emitter sample
    # (sdf_direct_reparam.py:39-53's ds.dist-bounded ray_test); inf for
    # environment directions.
    shadow_maxt = jnp.where(
        jnp.isfinite(ds_dist), ds_dist * (1.0 - 1e-3) - cfg.shadow_eps, jnp.inf
    )

    # Fused depth-1 trace: the NEE shadow ray and the MIS BSDF ray run as
    # ONE trace of 2N lanes instead of two sequential while_loops — the
    # trace cost is dominated by loop machinery + straggler tails (~3 M
    # lanes/s per pass on v5e regardless of width at these sizes), so
    # halving the number of passes is nearly free throughput.  Pure lane
    # concatenation: compaction reorders lanes anyway, per-lane math is
    # bit-identical, and the occlusion mask keeps refinement off the shadow
    # half.  Conv-warp keeps separate calls (per-call aux-uniform columns).
    fuse_mis = cfg.use_mis and cfg.warp_kind != "conv"
    if fuse_mis:
        si_det = jax.lax.stop_gradient(si)
        bs_wo, bs_pdf, bs_weight = scene.bsdf.sample(si_det, jax.lax.stop_gradient(uni[:, 4:6]))
        bsdf_d = jax.lax.stop_gradient(si_det.to_world(bs_wo))
        bsdf_o = si.p + bsdf_d * cfg.shadow_eps
        n_l = shadow_o.shape[0]
        t_m, d_m, det_m, _ = _ray_intersect(
            scene,
            jnp.concatenate([shadow_o, bsdf_o], 0),
            jnp.concatenate([ds_d, bsdf_d], 0),
            1, cfg, mode, None,
            maxt=jnp.concatenate([shadow_maxt, jnp.full_like(shadow_maxt, jnp.inf)], 0),
            occlusion=jnp.concatenate(
                [jnp.ones(n_l, bool), jnp.zeros(n_l, bool)], 0
            ),
        )
        occluded_t, det_e = t_m[:n_l], det_m[:n_l]
        t_b, d_b, det_b = t_m[n_l:], d_m[n_l:], det_m[n_l:]
    else:
        occluded_t, _, det_e, _ = _ray_intersect(
            scene, shadow_o, ds_d, 1, cfg, mode, _conv_uni(uni, cfg, 1), maxt=shadow_maxt,
            occlusion=True,
        )
    visibility = jnp.where(jnp.isfinite(occluded_t), 0.0, 1.0)

    wo = si.to_local(ds_d)
    emitter_val = jnp.where(
        (active_e & (ds_pdf > 0))[..., None], ds_rad / jnp.maximum(ds_pdf, 1e-12)[..., None], 0.0
    )
    if cfg.use_mis:
        bsdf_val, bsdf_pdf = scene.bsdf.eval_pdf(si, wo)
        if maux is not None:
            mesh_val, mesh_pdf = _mesh_diffuse(m_alb, wo)
            bsdf_val = jnp.where(is_mesh[..., None], mesh_val, bsdf_val)
            bsdf_pdf = jnp.where(is_mesh, mesh_pdf, bsdf_pdf)
        w_mis = mis_weight(ds_pdf, jax.lax.stop_gradient(bsdf_pdf))
        nee = visibility[..., None] * bsdf_val * emitter_val * w_mis[..., None]
    else:
        bsdf_val = scene.bsdf.eval(si, wo)
        if maux is not None:
            bsdf_val = jnp.where(is_mesh[..., None], _mesh_diffuse(m_alb, wo)[0], bsdf_val)
        nee = visibility[..., None] * bsdf_val * emitter_val
    nee_throughput = (
        jax.lax.stop_gradient(throughput) if cfg.debug_detach_nee_throughput else throughput
    )
    result = result + jnp.where(
        active_e[..., None], nee_throughput * nee * det_e[..., None], 0.0
    )

    # ---------------- BSDF sampling (MIS) ----------------
    if cfg.use_mis:
        if not fuse_mis:
            si_det = jax.lax.stop_gradient(si)
            bs_wo, bs_pdf, bs_weight = scene.bsdf.sample(
                si_det, jax.lax.stop_gradient(uni[:, 4:6])
            )
            bsdf_d = jax.lax.stop_gradient(si_det.to_world(bs_wo))
            bsdf_o = si.p + bsdf_d * cfg.shadow_eps
            t_b, d_b, det_b, _ = _ray_intersect(
                scene, bsdf_o, bsdf_d, 1, cfg, mode, _conv_uni(uni, cfg, 2)
            )
        active_b = shade & (bs_pdf > 0)
        bsdf_val = scene.bsdf.eval(si, bs_wo)
        if maux is not None:
            # mesh lanes: Lambertian f with the mesh albedo; bs_pdf stays the
            # sampler's true pdf, so the estimator remains unbiased (for the
            # default diffuse scene BSDF the cosine sampler matches exactly)
            bsdf_val = jnp.where(is_mesh[..., None], _mesh_diffuse(m_alb, bs_wo)[0], bsdf_val)
        # Emitted radiance the BSDF ray reaches: environment if it escapes
        # the SDF/mesh, the area emitter if its rect is the nearest hit.
        L_b, t_light_b = _emitted_along(scene, jax.lax.stop_gradient(bsdf_o), d_b)
        reach_emitter = jnp.where(
            jnp.isfinite(t_light_b), t_light_b < t_b, ~jnp.isfinite(t_b)
        )
        emitter_pdf = _emitter_pdf(scene, jax.lax.stop_gradient(bsdf_o), bsdf_d)
        if getattr(scene.bsdf, "delta", False):
            # Delta scene BSDF (ConductorBSDF): eval ≡ 0, the lobe carries
            # its value in the sample weight, and emitter sampling cannot
            # match it → MIS weight 1 (Mitsuba delta-lobe conventions).
            w_mis_b = jnp.ones_like(bs_pdf)
            contrib = bs_weight * L_b
        else:
            w_mis_b = mis_weight(bs_pdf, emitter_pdf)
            contrib = (
                bsdf_val
                / jnp.maximum(bs_pdf, 1e-12)[..., None]
                * L_b
                * w_mis_b[..., None]
            )
        result = result + jnp.where(
            (active_b & reach_emitter)[..., None],
            throughput * contrib * det_b[..., None],
            0.0,
        )

    return jnp.where(valid_ray[..., None], result, 0.0), valid_ray, det, d1


def _sample_prb(scene, o, d, uni, cfg, mode):
    from .prb import sample_prb

    return sample_prb(scene, o, d, uni, cfg, mode)


_INTEGRATORS = {
    "sdf_silhouette_reparam": _sample_silhouette,
    "sdf_simple_shading_reparam": _sample_simple_shading,
    "sdf_direct_reparam": _sample_direct,
    "sdf_prb_reparam": _sample_prb,
}


def render_lane_block(scene, camera, lane, seed, cfg: RenderConfig, mode="primal",
                      dense_groups: int | None = None):
    """Render a set of wavefront lanes and splat them into a film block.

    ``lane``: (M,) uint32 *global* lane indices in [0, (W+2b)(H+2b)·spp) —
    the RNG is keyed by global lane id, so any partition of the lane axis
    across devices reproduces the single-chip estimate bit-for-bit
    (SURVEY.md §2.4, deterministic per-ray RNG).  Returns the un-normalized
    (H+2b, W+2b, 5) block; blocks from lane shards sum (psum) before
    :func:`develop`.

    ``dense_groups``: lanes-per-pixel of THIS block for the scatter-free
    splat (defaults to ``cfg.spp``).  Spp-STRIDED lane partitions — every
    pixel's spp-slots ``[c·k, (c+1)·k)`` per chunk — pass ``k`` here; they
    are the preferred slicing on TPU: slices covering ALL pixels mix the
    straggler pixels into every program instead of concentrating them
    (contiguous few-pixel slices measured 141 ms vs 78 ms per 270 k lanes
    on v5e — the trace loop pays its slice's worst lane).
    """
    # Prepare the ATTACHED stencil table once per program: every attached
    # SDF evaluation (surface normals, warp field jets) then rides the
    # contiguous-row gather (~10× the per-tap path on TPU, ops/grid.py),
    # and the VJP becomes a row-wise scatter into the table plus the dense
    # fold of build_stencil's pad/slice — both TPU-friendly — instead of 64
    # scalar scatters per query.  Values are exactly equivalent; gradients
    # flow data → stencil → taps.  stencil_ok gates the 64× memory blow-up.
    if isinstance(scene.sdf, GridSDF) and scene.sdf.stencil is None:
        scene = scene.replace(sdf=scene.sdf.prepare())

    W, H = camera.resx, camera.resy
    b = BORDER if cfg.sample_border else 0
    pw = W + 2 * b
    spp = cfg.spp

    pix = lane // spp
    py = (pix // pw).astype(jnp.float32) - b
    px = (pix % pw).astype(jnp.float32) - b
    n_uni = 6 + (8 * cfg.max_depth if cfg.integrator == "sdf_prb_reparam" else 0)
    if cfg.warp_kind == "conv":
        # primary + NEE-shadow + (optionally) MIS-BSDF reparam each need an
        # independent aux-ray block
        n_uni += (6 if cfg.use_mis else 4) * cfg.conv.n_aux_rays
    uni = lane_uniforms(seed, lane, n_uni)

    jx, jy = uni[:, 0], uni[:, 1]
    if cfg.antithetic_sampling:
        # Mirrored jitter pairs WITHIN a pixel (position_sample2 = pos - r
        # + 1, reparam.py:173): sample s pairs with s^1; with odd spp the
        # last sample of each pixel has no partner and stays unmirrored.
        s_idx = lane % jnp.uint32(spp)
        partner_s = jnp.where(
            (s_idx ^ 1) < spp, s_idx ^ jnp.uint32(1), s_idx
        )
        partner_lane = lane - s_idx + partner_s
        partner = lane_uniforms(seed, partner_lane, 2)
        odd = (s_idx & 1) == 1
        jx = jnp.where(odd, 1.0 - partner[:, 0], jx)
        jy = jnp.where(odd, 1.0 - partner[:, 1], jy)
    pos = jnp.stack([px + jx, py + jy], axis=-1)  # unpadded px coords
    o, d = camera.sample_ray(pos)

    sample_fn = _INTEGRATORS[cfg.integrator]
    rgb, valid, det, d1 = sample_fn(scene, o, d, uni, cfg, mode)

    if mode == "primal" or cfg.debug_detach_splat:
        splat_pos = pos
        rw = jnp.ones_like(det)
    else:
        # Re-evaluate the film position/importance with the attached
        # (reparameterized) direction (reparam.py:99-104)
        it_p = o + d1
        splat_pos, imp = camera.project(it_p)
        rw = replace_grad(jnp.ones_like(imp), imp / jax.lax.stop_gradient(imp))

    alpha = valid.astype(rgb.dtype)
    weight_ch = replace_grad(jnp.ones_like(det), det * rw)
    values = jnp.concatenate(
        [rgb * rw[..., None], alpha[..., None], weight_ch[..., None]], axis=-1
    )
    # Scatter-free fast path: this function's own lane→pixel mapping
    # (pix = lane // spp with ``k`` consecutive spp-slots per pixel, pixels
    # in order — true for render/render_chunked/render_sharded/bench
    # wavefronts, contiguous or spp-strided) satisfies splat_pixel_major's
    # pixel-major contract.  The splat position's *primal value* always
    # lies inside the lane's own pixel even in grad mode (d1's value equals
    # d under replace_grad), so the 6×6 window always contains the filter
    # support.
    k = dense_groups if dense_groups is not None else spp
    if cfg.dense_splat and lane.ndim == 1 and lane.shape[0] % k == 0:
        from ..ops.film import splat_pixel_major

        return splat_pixel_major(pix, splat_pos, values, H, W, k, border=b)
    return splat(splat_pos, values, H, W, border=b)


def render(scene, view_idx: int | None = None, seed=0, cfg: RenderConfig = RenderConfig(), mode="primal", camera=None):
    """Render one view → (H, W, 4) rgb+alpha image.

    ``mode='primal'`` gives the detached estimate; ``mode='grad'`` builds the
    differentiable estimator (reparameterized directions, attached film
    weights) whose vjp/jvp carry the shape gradients.
    """
    if camera is None:
        camera = scene.cameras.view(view_idx if view_idx is not None else 0)
    W, H = camera.resx, camera.resy
    b = BORDER if cfg.sample_border else 0
    n = (W + 2 * b) * (H + 2 * b) * cfg.spp
    lane = jnp.arange(n, dtype=jnp.uint32)
    block = render_lane_block(scene, camera, lane, seed, cfg, mode)
    return develop(block, border=b)


def render_aovs(scene, view_idx=0, seed=0, cfg: RenderConfig = RenderConfig(), camera=None):
    """Diagnostic AOV images (reference aov_names, reparam.py:263-267):
    returns a dict of (H, W) arrays — depth, warp_t, weight_sum, trace
    iteration count, divergence, normal, sdf value at the warp point."""
    from ..ops.trace import sphere_trace_warp
    from ..ops.warp import warp_eval

    if camera is None:
        camera = scene.cameras.view(view_idx)
    W, H = camera.resx, camera.resy
    n = W * H * cfg.spp
    lane = jnp.arange(n, dtype=jnp.uint32)
    pix = lane // cfg.spp
    py = (pix // W).astype(jnp.float32)
    px = (pix % W).astype(jnp.float32)
    uni = lane_uniforms(seed, lane, 2)
    pos = jnp.stack([px + uni[:, 0], py + uni[:, 1]], axis=-1)
    o, d = camera.sample_ray(pos)

    res = sphere_trace_warp(scene.sdf, o, d, cfg.trace)
    x = o + jnp.where(jnp.isfinite(res.warp_t), res.warp_t, 0.0)[..., None] * d
    _, div = warp_eval(
        scene.sdf, x, d, res.warp_t, res.warp_t_d, cfg.warp,
        warp_weight_mult=res.warp_weight, warp_weight_mult_d=res.warp_weight_d,
    )
    si = compute_surface_interaction(scene.sdf, o, d, res.its_t, differentiable=False)
    f_warp = scene.sdf.eval(jnp.where(jnp.isfinite(res.warp_t)[..., None], x, 0.5))

    def img(v):
        v = jnp.where(jnp.isfinite(v), v, 0.0)
        return v.reshape(H, W, cfg.spp).mean(-1)

    return {
        "depth": img(res.its_t),
        "warp_t": img(res.warp_t),
        "weight_sum": img(res.weight_sum),
        "i": img(res.num_steps.astype(jnp.float32)),
        "div": img(div),
        "sdf_value": img(f_warp),
        "nx": img(si.n[..., 0]),
        "ny": img(si.n[..., 1]),
        "nz": img(si.n[..., 2]),
        "warp_t_dx": img(res.warp_t_d[..., 0]),
        "warp_t_dy": img(res.warp_t_d[..., 1]),
        "warp_t_dz": img(res.warp_t_d[..., 2]),
    }


def render_chunked(scene, view_idx=0, seed=0, cfg: RenderConfig = RenderConfig(), mode="primal", camera=None, n_chunks: int = 1, remat: bool = True):
    """Render with the wavefront split into contiguous lane chunks to bound
    peak memory (the role of Dr.Jit's wavefront-size cap, reparam.py:47-50).
    Matches :func:`render` up to float32 accumulation order (the same
    samples are splatted, grouped per chunk).

    The chunk loop is a ``lax.scan`` with a rematerialized body: one copy of
    the trace program regardless of chunk count, and the backward pass
    recomputes per-chunk intermediates instead of storing the whole
    wavefront (``jax.checkpoint`` ≙ trading FLOPs for HBM).

    ``remat=False`` stores the chunk residuals instead: the VJP skips the
    second forward (~25% of a train step's gradient render), at the price of
    residual HBM for the WHOLE wavefront — callers gate this on a lane
    budget (opt/shape_opt.py picks it when the grad wavefront is small
    enough).  Identical values either way.
    """
    if camera is None:
        camera = scene.cameras.view(view_idx)
    W, H = camera.resx, camera.resy
    b = BORDER if cfg.sample_border else 0
    pw = (W + 2 * b) * (H + 2 * b)
    n = pw * cfg.spp
    assert n % n_chunks == 0, (n, n_chunks)
    if n_chunks == 1:
        return render(scene, view_idx, seed, cfg, mode, camera)
    sz = n // n_chunks

    if cfg.spp % n_chunks == 0:
        # SPP-STRIDED chunks: chunk c renders ALL pixels × spp-slots
        # [c·k, (c+1)·k).  Same global lane ids (same samples, same RNG) as
        # contiguous chunking, regrouped — but straggler pixels are mixed
        # into every chunk instead of concentrated in a few, and the trace
        # loop pays per-chunk worst-lane cost (contiguous few-pixel chunks
        # measured 1.8× slower at 270 k lanes on v5e).
        k = cfg.spp // n_chunks
        i = jnp.arange(pw * k, dtype=jnp.uint32)
        base = (i // k) * jnp.uint32(cfg.spp) + (i % k)
        groups = k

        def lane_of(c):
            return base + c * jnp.uint32(k)
    else:
        base = jnp.arange(sz, dtype=jnp.uint32)
        groups = None

        def lane_of(c):
            return base + c * jnp.uint32(sz)

    def body(carry, c):
        lane = lane_of(c)
        return carry + render_lane_block(
            scene, camera, lane, seed, cfg, mode, dense_groups=groups
        ), None

    if remat:
        body = jax.checkpoint(body)
    init = jnp.zeros((H + 2 * b, W + 2 * b, 5), jnp.float32)
    block, _ = jax.lax.scan(body, init, jnp.arange(n_chunks, dtype=jnp.uint32))
    return develop(block, border=b)


def render_primal(scene, view_idx=0, seed=0, cfg=RenderConfig(), camera=None):
    return render(scene, view_idx, seed, cfg, mode="primal", camera=camera)


def render_grad(scene, view_idx=0, seed=0, cfg=RenderConfig(), camera=None):
    return render(scene, view_idx, seed, cfg, mode="grad", camera=camera)
