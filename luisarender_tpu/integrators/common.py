"""Shared path-tracing bounce step used by the megakernel and wavefront
integrators.

This is the body of mega_path.cpp:49-156's per-depth loop, restructured as a
pure function over a batched SoA path-state carry (per-path depth, so the
wavefront integrator can advance states of mixed depths in one call).
Conventions follow integrators/mega_path.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..accel import traverse
from ..core import sampling
from ..core import types as ct
from ..core.spectrum import safe_div
from ..scene.geometry import surface_interaction
from ..surfaces import base as surf_base


# See bounce_step: deferred+fused shadow tracing measured slower end-to-end
# on v5e; flip to re-evaluate on other hardware.
FUSE_SHADOW_TRACES = False


def init_carry(ray, beta, state, swl, pixel_index=None, cone=None):
    """Fresh path state for a batch of camera rays.

    cone: optional (width0, spread) from camera.ray_cone() — enables
    ray-cone texture LOD tracking through the bounce loop."""
    n = ray.origin.shape[0]
    c = beta.shape[-1]
    zero_f = jnp.zeros_like(ray.origin[..., 0])
    carry = {
        "ray": ray,
        "beta": beta,
        "L": jnp.broadcast_to(zero_f[..., None], (n, c)),
        "active": zero_f < 1.0,
        "state": state,
        "pdf_bsdf": zero_f + 1e16,
        "eta_scale": zero_f + 1.0,
        "depth": zero_f.astype(jnp.int32),
        "swl": swl,
        "n_rays": jnp.sum(zero_f).astype(jnp.int32),
        # deferred NEE shadow ray (traced fused with the next bounce's
        # closest ray when the scene is all-opaque — see bounce_step)
        "shadow_ray": ray._replace(t_max=zero_f),
        "shadow_contrib": jnp.broadcast_to(zero_f[..., None], (n, c)),
        "shadow_pending": zero_f > 1.0,
    }
    if pixel_index is not None:
        carry["pixel_index"] = pixel_index
    if cone is not None:
        width0, spread = cone
        carry["cone_width"] = zero_f + jnp.float32(width0)
        carry["cone_spread"] = zero_f + jnp.float32(spread)
    return carry


def has_work(carry):
    """Loop condition for integrators driving bounce_step: live paths OR
    deferred shadow rays awaiting their fused trace."""
    return jnp.any(carry["active"]) | jnp.any(carry["shadow_pending"])


def shade_surface(
    compiled,
    arrays,
    light_sampler,
    it,
    wo,
    swl,
    L,
    ray,
    beta,
    pdf_bsdf,
    eta_scale,
    active,
    n_rays,
    uniforms,
    time=0.0,
    detach_sampling=False,
    defer_shadow=False,
):
    """NEE + BSDF sampling at surface hits (mega_path.cpp:100-144), shared by
    the surface and volumetric integrators. uniforms = (u_sel, u_light (2),
    u_lobe, u_bsdf (2)). Returns updated (L, ray, beta, pdf_bsdf, eta_scale,
    active, n_rays, event) — and with defer_shadow=True an extra dict
    {ray, contrib, pending}: the shadow ray is NOT traced here; the caller
    traces it fused with the next bounce's closest ray (bounce_step) and
    adds `contrib` for unoccluded lanes.

    detach_sampling=True stops gradients at sampled directions and pdfs (the
    detached-sampling estimator for differentiable rendering: gradients flow
    through BSDF values and radiance, not through the sampling decisions)."""
    ctx = compiled.context(arrays)
    geom = compiled.trace_geometry(arrays)
    plan = compiled.plan
    n = it.p.shape[0]
    c = plan.spectral_dim
    u_sel, u_light, u_lobe, u_bsdf = uniforms

    detach = (
        (lambda x: jax.lax.stop_gradient(x)) if detach_sampling else (lambda x: x)
    )

    do_nee = plan.num_lights > 0 or plan.has_environment
    if do_nee:
        ls = light_sampler.sample(ctx, it, u_sel, u_light, swl, time)
        ls = {**ls, "pdf": detach(ls["pdf"]), "wi": detach(ls["wi"]),
              "p": detach(ls["p"]), "ng": detach(ls["ng"])}
        wi_nee = ls["wi"]
    else:
        wi_nee = wo

    # --- surface closures: NEE evaluate + BSDF sample in ONE tag-sorted
    # region (wave_path_v2.cpp:891-928) or the compute-all dispatch ---
    init_eval = {
        "f": jnp.zeros((n, c), jnp.float32),
        "pdf": jnp.zeros((n,), jnp.float32),
    }
    init_sample = {
        "f": jnp.zeros((n, c), jnp.float32),
        "pdf": jnp.zeros((n,), jnp.float32),
        "wi": jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3)
        ),
        "event": jnp.zeros((n,), jnp.int32),
        "eta": jnp.ones((n,), jnp.float32),
    }
    if surf_base.use_tag_sort(ctx, n):
        init_tree = {"ev": init_eval, "s": init_sample} if do_nee else {
            "s": init_sample
        }

        def shade_one(cls, t, index_blk, it_blk, inputs_blk):
            rows = surf_base._gather_rows(
                surf_base.params_arrays(ctx, t), index_blk
            )
            swl_b = inputs_blk["swl"]
            out = {
                "s": cls.sample(
                    rows, ctx, it_blk, swl_b, inputs_blk["wo"],
                    inputs_blk["u_lobe"], inputs_blk["u_bsdf"],
                )
            }
            if do_nee:
                out["ev"] = cls.evaluate(
                    rows, ctx, it_blk, swl_b, inputs_blk["wo"],
                    inputs_blk["wi_nee"],
                )
            return out

        inputs = {
            "swl": swl, "wo": wo, "wi_nee": wi_nee,
            "u_lobe": u_lobe, "u_bsdf": u_bsdf,
        }
        res = surf_base.blocked_tag_apply(
            ctx, it, inputs, init_tree, shade_one
        )
        f_eval = res.get("ev", init_eval)
        s = res["s"]
    else:
        if do_nee:
            f_eval = surf_base.dispatch(
                ctx, it, "evaluate", swl, wo, wi_nee, init=init_eval
            )
        s = surf_base.dispatch(
            ctx, it, "sample", swl, wo, u_lobe, u_bsdf, init=init_sample
        )

    # --- NEE contribution (mega_path.cpp:100-110) ---
    shadow_out = None
    if do_nee:
        shadow_ray = ct.spawn_ray_to(it, ls["p"], ls["ng"])
        shadow_pending = active & (ls["pdf"] > 0)
        shadow_ray = shadow_ray._replace(
            t_max=jnp.where(shadow_pending, shadow_ray.t_max, 0.0)
        )
        n_rays = n_rays + jnp.sum(shadow_pending.astype(jnp.int32))
        w_mis = safe_div(
            sampling.balance_heuristic(ls["pdf"], f_eval["pdf"]), ls["pdf"]
        )
        contrib = beta * f_eval["f"] * ls["L"] * w_mis[..., None]
        contrib = jnp.where(shadow_pending[..., None], contrib, 0.0)
        if defer_shadow:
            shadow_out = {
                "ray": shadow_ray,
                "contrib": contrib,
                "pending": shadow_pending,
            }
        else:
            occluded = traverse.trace_any(geom, shadow_ray)
            nee_ok = shadow_pending & ~occluded
            L = jnp.where(nee_ok[..., None], L + contrib, L)
    elif defer_shadow:
        zero_f = jnp.zeros_like(ray.origin[..., 0])
        shadow_out = {
            "ray": ray._replace(t_max=zero_f),
            "contrib": jnp.zeros((n, c), jnp.float32),
            "pending": zero_f > 1.0,
        }

    # --- BSDF sampling result (mega_path.cpp:131-144) ---
    s = {**s, "wi": detach(s["wi"]), "pdf": detach(s["pdf"])}
    new_ray = ct.spawn_ray(it, s["wi"])
    ray = ct.Ray(
        origin=jnp.where(active[..., None], new_ray.origin, ray.origin),
        direction=jnp.where(active[..., None], new_ray.direction, ray.direction),
        t_min=jnp.where(active, new_ray.t_min, ray.t_min),
        t_max=jnp.where(active, new_ray.t_max, ray.t_max),
    )
    pdf_bsdf = jnp.where(active, s["pdf"], pdf_bsdf)
    beta_new = beta * safe_div(s["f"], s["pdf"][..., None])
    beta_new = jnp.where(jnp.isfinite(beta_new), beta_new, 0.0)
    beta = jnp.where(active[..., None], beta_new, beta)
    eta = s["eta"]
    eta_scale_new = jnp.where(
        s["event"] == surf_base.EVENT_ENTER,
        eta_scale * eta * eta,
        jnp.where(
            s["event"] == surf_base.EVENT_EXIT,
            eta_scale / jnp.maximum(eta * eta, 1e-12),
            eta_scale,
        ),
    )
    eta_scale = jnp.where(active, eta_scale_new, eta_scale)
    active = active & (s["pdf"] > 0) & jnp.any(beta > 0, axis=-1)
    if defer_shadow:
        return (
            L, ray, beta, pdf_bsdf, eta_scale, active, n_rays, s["event"],
            shadow_out,
        )
    return L, ray, beta, pdf_bsdf, eta_scale, active, n_rays, s["event"]


def bounce_step(
    compiled,
    arrays,
    sampler,
    light_sampler,
    carry,
    *,
    max_depth,
    rr_depth,
    rr_threshold,
    time=0.0,
    detach_sampling=False,
):
    """Advance every active path by one bounce. Returns the updated carry.

    Paths that terminate this bounce have active=False afterwards; their L
    holds the final radiance estimate.
    """
    ctx = compiled.context(arrays)
    geom = compiled.trace_geometry(arrays)
    plan = compiled.plan
    spectrum = compiled.spectrum
    n = carry["ray"].origin.shape[0]
    c = plan.spectral_dim

    ray = carry["ray"]
    beta = carry["beta"]
    L = carry["L"]
    active = carry["active"]
    state = carry["state"]
    pdf_bsdf = carry["pdf_bsdf"]
    eta_scale = carry["eta_scale"]
    depth = carry["depth"]
    swl = carry["swl"]

    n_rays = carry["n_rays"] + jnp.sum(active.astype(jnp.int32))
    wo = -ray.direction
    # DEAD-LANE MASK (PERF.md round-3 item 2): terminated lanes keep their
    # last real ray in the carry, so without this the closest trace pays
    # full price on every bounce — the cluster tracer sorts t_max<=t_min
    # lanes to the tail and early-exits whole packets of them (measured
    # 106 -> 60 ms on the mixed bench's bounce-2 wave at 33% alive).
    trace_ray = ray._replace(t_max=jnp.where(active, ray.t_max, 0.0))
    # Fused trace: the previous bounce's DEFERRED shadow rays ride in the
    # same batched trace as this bounce's closest rays. MEASURED SLOWER on
    # v5e Cornell (4.3 vs 6.7 Mray/s): the +1 flush iteration and the
    # closest-hit machinery on shadow rays outweigh the launch savings, so
    # it is off by default; only valid when no shadow-transparent geometry
    # exists (the combined closest trace treats shadow rays like any ray).
    fuse = plan.all_opaque and FUSE_SHADOW_TRACES
    if fuse:
        s_ray = carry["shadow_ray"]
        rays_cat = ct.Ray(
            origin=jnp.concatenate([ray.origin, s_ray.origin]),
            direction=jnp.concatenate([ray.direction, s_ray.direction]),
            t_min=jnp.concatenate([ray.t_min, s_ray.t_min]),
            t_max=jnp.concatenate([trace_ray.t_max, s_ray.t_max]),
        )
        hit_cat = traverse.trace_closest(geom, rays_cat)
        hit = ct.Hit(
            inst=hit_cat.inst[:n],
            prim=hit_cat.prim[:n],
            bary=hit_cat.bary[:n],
            t=hit_cat.t[:n],
        )
        occluded_prev = hit_cat.prim[n:] >= 0
        nee_ok = carry["shadow_pending"] & ~occluded_prev
        L = jnp.where(nee_ok[..., None], L + carry["shadow_contrib"], L)
    else:
        hit = traverse.trace_closest(geom, trace_ray)
    cone_width = None
    if "cone_width" in carry:
        # ray-cone LOD: the cone widens linearly with distance; surface
        # curvature/roughness growth is intentionally ignored (under-
        # estimating LOD only sharpens)
        cone_width = carry["cone_width"] + carry["cone_spread"] * jnp.where(
            jnp.isfinite(hit.t), hit.t, 0.0
        )
    it = surface_interaction(
        arrays, hit, ray, needs_uv=plan.needs_uv, cone_width=cone_width
    )
    it = it._replace(valid=it.valid & active)

    # --- miss: environment (mega_path.cpp:68-76) ---
    if plan.has_environment:
        env_eval = light_sampler.evaluate_miss(ctx, ray.direction, swl, time)
        mis_w = sampling.balance_heuristic(pdf_bsdf, env_eval["pdf"])
        contrib = beta * env_eval["L"] * mis_w[..., None]
        L = jnp.where((active & ~it.valid)[..., None], L + contrib, L)
    active = active & it.valid

    # --- hit an emissive instance (mega_path.cpp:79-87) ---
    if plan.num_lights > 0:
        has_light = arrays["instances"]["light_tag"][it.inst] >= 0
        le = light_sampler.evaluate_hit(ctx, it, ray.origin, swl, time)
        mis_w = sampling.balance_heuristic(pdf_bsdf, le["pdf"])
        contrib = beta * le["L"] * mis_w[..., None]
        L = jnp.where((active & has_light)[..., None], L + contrib, L)

    # --- no surface -> path ends (mega_path.cpp:89) ---
    has_surface = arrays["instances"]["surface_tag"][it.inst] >= 0
    active = active & has_surface

    # --- dispersion (mega_path.cpp:117-119) ---
    if not spectrum.is_fixed and surf_base.any_dispersive(ctx):
        disp = surf_base.dispersive_mask(ctx, it) & active
        terminated = swl.terminate_secondary()
        swl = swl._replace(
            pdf=jnp.where(disp[..., None], terminated.pdf, swl.pdf)
        )

    # --- uniform draws ---
    state, u_sel = sampler.generate_1d(state)
    state, u_light = sampler.generate_2d(state)
    state, u_lobe = sampler.generate_1d(state)
    state, u_bsdf = sampler.generate_2d(state)
    state, u_rr = sampler.generate_1d(state)

    result = shade_surface(
        compiled,
        arrays,
        light_sampler,
        it,
        wo,
        swl,
        L,
        ray,
        beta,
        pdf_bsdf,
        eta_scale,
        active,
        n_rays,
        (u_sel, u_light, u_lobe, u_bsdf),
        time=time,
        detach_sampling=detach_sampling,
        defer_shadow=fuse,
    )
    if fuse:
        (L, ray, beta, pdf_bsdf, eta_scale, active, n_rays, event,
         shadow_out) = result
    else:
        L, ray, beta, pdf_bsdf, eta_scale, active, n_rays, event = result
        shadow_out = None

    # --- Russian roulette (mega_path.cpp:146-153) ---
    q = jnp.maximum(jnp.max(beta, axis=-1) * eta_scale, 0.05)
    do_rr = (depth + 1 >= rr_depth) & active
    kill = do_rr & (q < rr_threshold) & (u_rr >= q)
    boost = jnp.where(do_rr & (q < rr_threshold), 1.0 / jnp.maximum(q, 1e-6), 1.0)
    beta = beta * boost[..., None]
    active = active & ~kill

    depth = depth + 1
    active = active & (depth < max_depth)

    zero_f = jnp.zeros_like(ray.origin[..., 0])
    out = {
        "ray": ray,
        "beta": beta,
        "L": L,
        "active": active,
        "state": state,
        "pdf_bsdf": pdf_bsdf,
        "eta_scale": eta_scale,
        "depth": depth,
        "swl": swl,
        "n_rays": n_rays,
        "shadow_ray": shadow_out["ray"] if shadow_out else ray._replace(t_max=zero_f),
        "shadow_contrib": shadow_out["contrib"]
        if shadow_out
        else jnp.broadcast_to(zero_f[..., None], (n, c)),
        "shadow_pending": shadow_out["pending"]
        if shadow_out
        else zero_f > 1.0,
    }
    # integrator-specific fields (pixel_index, wavefront next_sample /
    # unsplatted, ...) ride along untouched
    for k, v in carry.items():
        if k not in out:
            out[k] = v
    if cone_width is not None:
        out["cone_width"] = jnp.where(active, cone_width, carry["cone_width"])
    return out
