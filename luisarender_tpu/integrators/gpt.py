"""Gradient-domain path tracing (GPT).

TPU-native equivalent of /root/reference/src/integrators/gpt.cpp:28-1273
(Kettunen et al. 2015 shift mapping): each pixel traces a main path plus 4
shifted paths (right/bottom/left/top neighbors) in lockstep, sharing every
random number. Shifted paths follow the main path through three connection
states (gpt.cpp:77-81):

- NOT_CONNECTED: the shifted path has its own vertex chain. At a diffuse
  chain (roughness > shift_threshold) it RECONNECTS to the main path's next
  vertex with a geometric Jacobian (gpt.cpp:355-383 reconnect_shift /
  environment_shift); at glossy chains it copies the tangent-space half
  vector (gpt.cpp:291-353 half_vector_shift).
- RECENTLY_CONNECTED: wo differs but wi follows main; one more BSDF eval at
  the main vertex, then -> CONNECTED.
- CONNECTED: the shifted path reuses every main sample exactly.

Contributions are combined with the path-pdf-ratio MIS of the reference
(shifted.pdf/main.pdf carried multiplicatively, gpt.cpp:86,605-645,800-850);
failed shifts fall back to central radiance for the main path and zero for
the offset (gpt.cpp:693-698,1063-1068).

Outputs (gpt.cpp:1118-1191): the primal film (central pixel weighted 8x
emission + 2x MIS radiance at effective spp 4; each neighbor splat weighted
2x at spp 1), plus gradient_x / gradient_y / variance / effective buffers
saved alongside the film file. On top of the reference we optionally run the
screened-Poisson L2 reconstruction (Kettunen eq. 8, alpha = 0.2) as a jitted
CG solve — the reference leaves reconstruction to an external tool.

TPU mapping: the 4 shifted paths live on a (4N,) flattened lane axis
(shift-major) so every surface/light dispatch runs as one batched call; the
per-lane $switch(connection_status) of the reference becomes masked selects.

Both half-vector branches are implemented: reflective (gpt.cpp:340-352) and
transmissive (gpt.cpp:301-337, generalized Walter half vector with the
closure etas and the |h'|^2/|h|^2 Jacobian). Remaining failed shifts (TIR,
eta==1 transmission) fall back to unbiased central radiance, exactly as the
reference's shift_failed_flag path does.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..accel import traverse
from ..core import frame as fr
from ..core import sampling
from ..core import types as ct
from ..core.spectrum import safe_div
from ..scene.geometry import surface_interaction
from ..scene.node import SceneNodeTag
from ..scene.registry import register
from ..surfaces import base as surf_base
from .base import ProgressiveIntegrator

D_EPS = 1e-8

NOT_CONNECTED = 0
RECENTLY_CONNECTED = 1
CONNECTED = 2

# gpt.cpp:130-135 pixel_shifts: right, bottom, left, top
PIXEL_SHIFTS = ((1, 0), (0, 1), (-1, 0), (0, -1))


def _tile4(x):
    """Tile a main-path array (N, ...) to the shift-major (4N, ...) axis."""
    return jnp.tile(x, (4,) + (1,) * (x.ndim - 1))


def _tile4_tree(tree):
    return jax.tree_util.tree_map(_tile4, tree)


def _sel(mask, new, old):
    """Masked select broadcasting the (L,) mask over trailing dims."""
    return jnp.where(
        mask.reshape(mask.shape + (1,) * (new.ndim - mask.ndim)), new, old
    )


def _sel_tree(mask, new, old):
    return jax.tree_util.tree_map(partial(_sel, mask), new, old)


def _eval_surface(ctx, it, swl, wo, wi):
    n = it.p.shape[0]
    c = swl.dimension
    return surf_base.dispatch(
        ctx, it, "evaluate", swl, wo, wi,
        init={
            "f": jnp.zeros((n, c), jnp.float32),
            "pdf": jnp.zeros((n,), jnp.float32),
        },
    )


def _vertex_diffuse(ctx, it, threshold):
    """gpt.cpp:271-289 get_vertex_type: roughness above the shift threshold
    classifies as diffuse (reconnectable)."""
    rough = surf_base.dispatch(
        ctx, it, "roughness",
        init=jnp.zeros(it.p.shape[:-1] + (2,), jnp.float32),
    )
    return jnp.mean(rough, axis=-1) > threshold


def _shading_frame(it):
    return fr.frame_from_z_and_hint(it.ns, it.tangent)


def _emitter_at(compiled, ctx, arrays, light_sampler, it, ray, swl, time):
    """Radiance + light pdf for a path ray arriving at `it` (or escaping)."""
    plan = compiled.plan
    n = it.p.shape[0]
    c = swl.dimension
    L = jnp.zeros((n, c), jnp.float32)
    pdf = jnp.zeros((n,), jnp.float32)
    hit_emitter = jnp.zeros((n,), bool)
    if plan.num_lights > 0:
        has_light = (arrays["instances"]["light_tag"][it.inst] >= 0) & it.valid
        le = light_sampler.evaluate_hit(ctx, it, ray.origin, swl, time)
        L = jnp.where(has_light[..., None], le["L"], L)
        pdf = jnp.where(has_light, le["pdf"], pdf)
        hit_emitter = hit_emitter | has_light
    if plan.has_environment:
        miss = ~it.valid
        ev = light_sampler.evaluate_miss(ctx, ray.direction, swl, time)
        L = jnp.where(miss[..., None], ev["L"], L)
        pdf = jnp.where(miss, ev["pdf"], pdf)
        hit_emitter = hit_emitter | miss
    return L, pdf, hit_emitter


def gpt_trace_batch(
    compiled,
    arrays,
    camera,
    sampler,
    light_sampler,
    pixel_xy,
    sample_index,
    *,
    max_depth,
    rr_depth,
    rr_threshold,
    shift_threshold,
    central=False,
    time=0.0,
):
    """One GPT sample per pixel. Returns a dict of per-pixel rgb outputs:
    very_direct (N,3), radiance (N,3) [main MIS], neighbor (4N,3),
    gradient (4N,3), shift_alive (4N,) plus the filter weight (N,)."""
    spectrum = compiled.spectrum
    ctx = compiled.context(arrays)
    geom = compiled.trace_geometry(arrays)
    plan = compiled.plan
    n = pixel_xy.shape[0]
    c = plan.spectral_dim

    state = sampler.start(pixel_xy, sample_index)
    state, u_filter = sampler.generate_pixel_2d(state)
    if camera.requires_lens_sampling:
        state, u_lens = sampler.generate_2d(state)
    else:
        u_lens = jnp.full((n, 2), 0.5, jnp.float32)
    if spectrum.is_fixed:
        swl = spectrum.sample_wavelengths(jnp.zeros((n, 1), jnp.float32))
    else:
        state, u_swl = sampler.generate_1d(state)
        swl = spectrum.sample_wavelengths(u_swl[..., None])
    swl4 = _tile4_tree(swl)

    # main + 4 shifted camera rays share u_filter/u_lens (gpt.cpp:404-440)
    m_ray, _, m_cam_w = camera.generate_rays(pixel_xy, u_filter, u_lens, time)
    offs = jnp.asarray(PIXEL_SHIFTS, jnp.int32)  # (4, 2)
    sh_pixels = (
        _tile4(pixel_xy) + jnp.repeat(offs, n, axis=0)
    )
    s_ray, _, s_cam_w = camera.generate_rays(
        sh_pixels, _tile4(u_filter), _tile4(u_lens), time
    )

    m_hit = traverse.trace_closest(geom, m_ray)
    m_it = surface_interaction(arrays, m_hit, m_ray, needs_uv=plan.needs_uv)
    s_hit = traverse.trace_closest(geom, s_ray)
    s_it = surface_interaction(arrays, s_hit, s_ray, needs_uv=plan.needs_uv)

    # very direct: first-hit emission / environment (gpt.cpp:513-527)
    vd_L, _, _ = _emitter_at(
        compiled, ctx, arrays, light_sampler, m_it, m_ray, swl, time
    )
    very_direct = vd_L * m_cam_w[..., None]

    has_surface = arrays["instances"]["surface_tag"][m_it.inst] >= 0
    carry = {
        "state": state,
        "depth": jnp.zeros((), jnp.int32),
        "m_ray": m_ray,
        "m_it": m_it,
        "m_weight": jnp.broadcast_to(m_cam_w[..., None], (n, c)).astype(
            jnp.float32
        ),
        "m_radiance": jnp.zeros((n, c), jnp.float32),
        "m_alive": m_it.valid & has_surface,
        "s_ray": s_ray,
        "s_it": s_it,
        "s_weight": jnp.broadcast_to(s_cam_w[..., None], (4 * n, c)).astype(
            jnp.float32
        ),
        "s_pdf_div": jnp.ones((4 * n,), jnp.float32),
        "s_radiance": jnp.zeros((4 * n, c), jnp.float32),
        "s_gradient": jnp.zeros((4 * n, c), jnp.float32),
        "s_alive": s_it.valid,
        "s_status": jnp.full((4 * n,), NOT_CONNECTED, jnp.int32),
    }

    def cond(carry):
        return (carry["depth"] < max_depth) & jnp.any(carry["m_alive"])

    def body(carry):
        state = carry["state"]
        depth = carry["depth"]
        m_ray, m_it = carry["m_ray"], carry["m_it"]
        m_weight = carry["m_weight"]
        m_alive = carry["m_alive"]
        s_ray, s_it = carry["s_ray"], carry["s_it"]
        s_weight = carry["s_weight"]
        s_pdf_div = carry["s_pdf_div"]
        s_alive = carry["s_alive"]
        s_status = carry["s_status"]
        m_radiance = carry["m_radiance"]
        s_radiance = carry["s_radiance"]
        s_gradient = carry["s_gradient"]

        last_segment = depth + 1 >= max_depth
        wo = -m_ray.direction
        m_diffuse = _vertex_diffuse(ctx, m_it, shift_threshold)
        s_diffuse = _vertex_diffuse(ctx, s_it, shift_threshold)

        # ================= NEE (gpt.cpp:560-705) ========================
        state, u_sel = sampler.generate_1d(state)
        state, u_light = sampler.generate_2d(state)
        if plan.num_lights > 0 or plan.has_environment:
            ls = light_sampler.sample(ctx, m_it, u_sel, u_light, swl, time)
            m_shadow = ct.spawn_ray_to(m_it, ls["p"], ls["ng"])
            m_shadow = m_shadow._replace(
                t_max=jnp.where(m_alive & (ls["pdf"] > 0), m_shadow.t_max, 0.0)
            )
            m_occ = traverse.trace_any(geom, m_shadow)
            nee_valid = m_alive & (ls["pdf"] > 0) & ~m_occ
            m_f = _eval_surface(ctx, m_it, swl, wo, ls["wi"])
            m_d2 = jnp.sum((m_it.p - ls["p"]) ** 2, axis=-1)
            m_cos = fr.dot(ls["ng"], fr.normalize(m_it.p - ls["p"]))
            # tiled main quantities on the shift axis
            t_nee = _tile4(nee_valid)
            t_ls_pdf, t_f_pdf = _tile4(ls["pdf"]), _tile4(m_f["pdf"])
            t_fL = _tile4(m_f["f"] * ls["L"])
            t_weight = _tile4(m_weight)
            t_it = _tile4_tree(m_it)

            # fallback (shift failed): pure main MIS (gpt.cpp:693-698)
            mc_fb = t_fL * t_weight / jnp.maximum(
                t_ls_pdf + t_f_pdf, D_EPS
            )[..., None]
            mc, sc = mc_fb, jnp.zeros_like(mc_fb)
            ok = jnp.zeros((4 * n,), bool)

            # CONNECTED: reuse main sample exactly (gpt.cpp:605-621)
            denom_c = t_ls_pdf + t_f_pdf + s_pdf_div * (t_f_pdf + t_ls_pdf)
            is_c = s_alive & (s_status == CONNECTED)
            mc = _sel(is_c, t_fL * t_weight / jnp.maximum(denom_c, D_EPS)[..., None], mc)
            sc = _sel(
                is_c,
                t_fL * s_weight * s_pdf_div[..., None]
                / jnp.maximum(denom_c, D_EPS)[..., None],
                sc,
            )
            ok = ok | is_c

            # RECENTLY_CONNECTED: eval at main vertex with shifted wo
            # (gpt.cpp:622-644)
            inc = fr.normalize(s_it.p - t_it.p)
            r_eval = _eval_surface(ctx, t_it, swl4, inc, _tile4(ls["wi"]))
            denom_r = t_ls_pdf + t_f_pdf + s_pdf_div * (
                r_eval["pdf"] + t_ls_pdf
            )
            is_r = s_alive & (s_status == RECENTLY_CONNECTED)
            mc = _sel(is_r, t_fL * t_weight / jnp.maximum(denom_r, D_EPS)[..., None], mc)
            sc = _sel(
                is_r,
                r_eval["f"] * _tile4(ls["L"]) * s_weight
                * s_pdf_div[..., None] / jnp.maximum(denom_r, D_EPS)[..., None],
                sc,
            )
            ok = ok | is_r

            # NOT_CONNECTED + both diffuse: shifted does its own NEE with the
            # SAME randoms (gpt.cpp:645-687)
            s_ls = light_sampler.sample(
                ctx, s_it, _tile4(u_sel), _tile4(u_light), swl4, time
            )
            is_n = (
                s_alive
                & (s_status == NOT_CONNECTED)
                & _tile4(m_diffuse)
                & s_diffuse
            )
            s_shadow = ct.spawn_ray_to(s_it, s_ls["p"], s_ls["ng"])
            s_shadow = s_shadow._replace(
                t_max=jnp.where(
                    is_n & t_nee & (s_ls["pdf"] > 0), s_shadow.t_max, 0.0
                )
            )
            s_occ = traverse.trace_any(geom, s_shadow)
            n_ok = is_n & (s_ls["pdf"] > 0) & ~s_occ
            s_d2 = jnp.sum((s_it.p - s_ls["p"]) ** 2, axis=-1)
            s_cos = fr.dot(s_ls["ng"], fr.normalize(s_it.p - s_ls["p"]))
            s_f = _eval_surface(
                ctx, s_it, swl4, -s_ray.direction, s_ls["wi"]
            )
            jac = jnp.abs(s_cos * _tile4(m_d2)) / (
                D_EPS + jnp.abs(_tile4(m_cos) * s_d2)
            )
            denom_n = t_ls_pdf + t_f_pdf + jac * s_pdf_div * (
                s_f["pdf"] + s_ls["pdf"]
            )
            mc = _sel(n_ok, t_fL * t_weight / jnp.maximum(denom_n, D_EPS)[..., None], mc)
            sc = _sel(
                n_ok,
                (jac * s_pdf_div)[..., None] * s_f["f"] * s_ls["L"] * s_weight
                / jnp.maximum(denom_n, D_EPS)[..., None],
                sc,
            )
            ok = ok | n_ok

            if central:
                # plain PT NEE, added once (gpt.cpp:587-589)
                m_radiance = m_radiance + jnp.where(
                    nee_valid[..., None],
                    m_f["f"] * ls["L"] * m_weight
                    / jnp.maximum(ls["pdf"] + m_f["pdf"], D_EPS)[..., None],
                    0.0,
                )
            else:
                mc = jnp.where(t_nee[..., None], mc, 0.0)
                sc = jnp.where((t_nee & ok)[..., None], sc, 0.0)
                m_radiance = m_radiance + mc.reshape(4, n, c).sum(axis=0)
                s_radiance = s_radiance + sc
                s_gradient = s_gradient + (sc - mc)

        # ============ BSDF sampling + emitter (gpt.cpp:707-1090) =========
        state, u_lobe = sampler.generate_1d(state)
        state, u_bsdf = sampler.generate_2d(state)
        state, u_rr = sampler.generate_1d(state)
        smp = surf_base.dispatch(
            ctx, m_it, "sample", swl, wo, u_lobe, u_bsdf,
            init={
                "f": jnp.zeros((n, c), jnp.float32),
                "pdf": jnp.zeros((n,), jnp.float32),
                "wi": jnp.broadcast_to(
                    jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3)
                ),
                "event": jnp.zeros((n,), jnp.int32),
                "eta": jnp.ones((n,), jnp.float32),
            },
        )
        m_alive2 = m_alive & (smp["pdf"] > 0)

        prev_it, prev_ray = m_it, m_ray
        new_ray = ct.spawn_ray(prev_it, smp["wi"])
        new_ray = new_ray._replace(
            t_max=jnp.where(m_alive2, new_ray.t_max, 0.0)
        )
        new_hit = traverse.trace_closest(geom, new_ray)
        new_it = surface_interaction(
            arrays, new_hit, new_ray, needs_uv=plan.needs_uv
        )
        new_it = new_it._replace(valid=new_it.valid & m_alive2)
        m_emit, m_lum_pdf, m_hit_emitter = _emitter_at(
            compiled, ctx, arrays, light_sampler, new_it, new_ray, swl, time
        )
        m_emit = jnp.where(m_alive2[..., None], m_emit, 0.0)
        m_next_diffuse = jnp.where(
            new_it.valid,
            _vertex_diffuse(ctx, new_it, shift_threshold),
            True,  # environment counts as diffuse (gpt.cpp:755)
        )
        env_escape = m_alive2 & ~new_it.valid
        if not plan.has_environment:
            # escaped with no environment: no emitter, path just dies
            m_hit_emitter = m_hit_emitter & new_it.valid

        m_pdf = smp["pdf"]
        m_prev_weight = m_weight
        m_weight = jnp.where(
            m_alive2[..., None],
            m_weight * safe_div(smp["f"], m_pdf[..., None]),
            m_weight,
        )
        m_weight_mis2 = m_prev_weight / jnp.maximum(
            m_lum_pdf + m_pdf, D_EPS
        )[..., None]

        # ---- tiled main quantities for the shifted update ----
        t_alive2 = _tile4(m_alive2)
        t_pdf = _tile4(m_pdf)
        t_lum = _tile4(m_lum_pdf)
        t_emit = _tile4(m_emit)
        t_f = _tile4(smp["f"])
        t_prev_w = _tile4(m_prev_weight)
        t_prev_it = _tile4_tree(prev_it)
        t_new_it = _tile4_tree(new_it)
        t_new_dir = _tile4(new_ray.direction)
        prev_pdf_div = s_pdf_div

        upd = s_alive & t_alive2  # lanes whose shifted state evolves
        mc = jnp.where(
            t_alive2[..., None],
            _tile4(m_weight_mis2) * t_emit * t_f,
            0.0,
        )  # failed-shift fallback (gpt.cpp:1063-1068)
        sc = jnp.zeros_like(mc)
        s_end = jnp.zeros((4 * n,), bool)  # postponed_shift_end

        # --- CONNECTED (gpt.cpp:793-809) ---
        s_prev_weight = carry["s_weight"]  # pre-update weight for contribs
        is_c = upd & (s_status == CONNECTED)
        denom_c = t_lum + t_pdf + prev_pdf_div * (t_pdf + t_lum)
        s_weight = _sel_tree(
            is_c, s_prev_weight * safe_div(t_f, t_pdf[..., None]), s_weight
        )
        mc = _sel(
            is_c,
            t_f * t_emit * t_prev_w / jnp.maximum(denom_c, D_EPS)[..., None],
            mc,
        )
        sc = _sel(
            is_c,
            t_f * t_emit * s_prev_weight * prev_pdf_div[..., None]
            / jnp.maximum(denom_c, D_EPS)[..., None],
            sc,
        )

        # --- RECENTLY_CONNECTED (gpt.cpp:810-840) ---
        is_r = upd & (s_status == RECENTLY_CONNECTED)
        inc_r = fr.normalize(s_it.p - t_prev_it.p)
        r_eval = _eval_surface(ctx, t_prev_it, swl4, inc_r, t_new_dir)
        r_dead = is_r & (r_eval["pdf"] <= 0)
        r_live = is_r & (r_eval["pdf"] > 0)
        s_weight = _sel_tree(
            r_live,
            s_prev_weight * safe_div(t_f * 0 + r_eval["f"], r_eval["pdf"][..., None]),
            s_weight,
        )
        s_pdf_div = jnp.where(
            r_live, prev_pdf_div * r_eval["pdf"] / jnp.maximum(t_pdf, D_EPS),
            s_pdf_div,
        )
        s_status = jnp.where(r_live, CONNECTED, s_status)
        denom_r = t_lum + t_pdf + prev_pdf_div * (r_eval["pdf"] + t_lum)
        mc = _sel(r_live, t_f * t_emit * t_prev_w / jnp.maximum(denom_r, D_EPS)[..., None], mc)
        sc = _sel(
            r_live,
            r_eval["f"] * t_emit * s_prev_weight * prev_pdf_div[..., None]
            / jnp.maximum(denom_r, D_EPS)[..., None],
            sc,
        )
        s_alive = s_alive & ~r_dead

        # --- NOT_CONNECTED: reconnection shift (gpt.cpp:841-920) ---
        recon_class = (
            _tile4(m_diffuse) & _tile4(m_next_diffuse) & s_diffuse
        )
        is_nc = upd & (s_status == NOT_CONNECTED)
        try_recon = is_nc & recon_class & (
            ~_tile4(last_segment & jnp.ones((n,), bool)) | _tile4(m_hit_emitter)
        )
        # visibility shifted.vertex -> main.next vertex
        vis_ray = ct.spawn_ray_to(s_it, t_new_it.p, t_new_it.ng)
        vis_ray = vis_ray._replace(
            t_max=jnp.where(
                try_recon & _tile4(new_it.valid), vis_ray.t_max, 0.0
            )
        )
        vis_occ = traverse.trace_any(geom, vis_ray)
        # env shift: shifted origin, main escape direction (gpt.cpp:385-400)
        env_ray = ct.spawn_ray(s_it, t_new_dir)
        env_ray = env_ray._replace(
            t_max=jnp.where(try_recon & _tile4(env_escape), env_ray.t_max, 0.0)
        )
        env_occ = traverse.trace_any(geom, env_ray)

        main_edge = t_prev_it.p - t_new_it.p
        shift_edge = s_it.p - t_new_it.p
        m_el2 = jnp.sum(main_edge**2, axis=-1)
        s_el2 = jnp.sum(shift_edge**2, axis=-1)
        recon_wo = -shift_edge / jnp.sqrt(jnp.maximum(s_el2, 1e-20))[..., None]
        m_opp_cos = fr.dot(main_edge, t_new_it.ns) / jnp.sqrt(
            jnp.maximum(m_el2, 1e-20)
        )
        s_opp_cos = fr.dot(recon_wo, t_new_it.ns)
        jac_geo = jnp.abs(s_opp_cos * m_el2) / (
            D_EPS + jnp.abs(m_opp_cos * s_el2)
        )
        hit_case = _tile4(new_it.valid)
        shift_wo = jnp.where(hit_case[..., None], recon_wo, t_new_dir)
        shift_jac = jnp.where(hit_case, jac_geo, 1.0)
        shift_vis = jnp.where(hit_case, ~vis_occ, ~env_occ)
        recon_ok = try_recon & shift_vis

        rc_eval = _eval_surface(ctx, s_it, swl4, -s_ray.direction, shift_wo)
        rc_live = recon_ok & (rc_eval["pdf"] > 0)
        s_weight = _sel_tree(
            rc_live,
            s_prev_weight * safe_div(rc_eval["f"], rc_eval["pdf"][..., None]),
            s_weight,
        )
        s_pdf_div = jnp.where(
            rc_live,
            prev_pdf_div * shift_jac * rc_eval["pdf"] / jnp.maximum(t_pdf, D_EPS),
            s_pdf_div,
        )
        s_status = jnp.where(rc_live, RECENTLY_CONNECTED, s_status)
        # emission seen through the reconnection (gpt.cpp:888-918)
        sh_le = light_sampler.evaluate_hit(ctx, t_new_it, s_it.p, swl4, time)
        sh_emit = jnp.where(
            hit_case[..., None],
            jnp.where(_tile4(m_hit_emitter & new_it.valid)[..., None], sh_le["L"], 0.0),
            t_emit,
        )
        sh_lum = jnp.where(
            hit_case,
            jnp.where(_tile4(m_hit_emitter & new_it.valid), sh_le["pdf"], 0.0),
            t_lum,
        )
        denom_rc = t_lum + t_pdf + shift_jac * prev_pdf_div * (
            rc_eval["pdf"] + sh_lum
        )
        rc_contrib = rc_live & _tile4(m_hit_emitter)
        mc = _sel(rc_contrib, t_f * t_emit * t_prev_w / jnp.maximum(denom_rc, D_EPS)[..., None], mc)
        sc = _sel(
            rc_contrib,
            rc_eval["f"] * sh_emit * s_prev_weight
            * (shift_jac * prev_pdf_div)[..., None]
            / jnp.maximum(denom_rc, D_EPS)[..., None],
            sc,
        )
        s_alive = s_alive & ~(try_recon & ~rc_live)
        s_alive = s_alive & ~(is_nc & recon_class & ~try_recon)

        # --- NOT_CONNECTED: half-vector shift (gpt.cpp:921-1070) ---
        is_hv = is_nc & ~recon_class
        m_frame = _shading_frame(t_prev_it)
        s_frame = _shading_frame(s_it)
        ts_m_wo = fr.to_local(m_frame, _tile4(-prev_ray.direction))
        ts_m_wi = fr.to_local(m_frame, _tile4(smp["wi"]))
        ts_s_wi = fr.to_local(s_frame, -s_ray.direction)
        reflect_case = fr.cos_theta(ts_m_wi) * fr.cos_theta(ts_m_wo) >= 0.0

        # reflective branch (gpt.cpp:340-352): copy the classic half vector
        h = fr.normalize(ts_m_wo + ts_m_wi)
        ts_s_wo_r = fr.reflect(ts_s_wi, h)
        jac_r = jnp.abs(fr.dot(ts_s_wo_r, h)) / (
            D_EPS + jnp.abs(fr.dot(ts_m_wo, h))
        )
        ok_r = fr.cos_theta(ts_s_wi) * fr.cos_theta(ts_s_wo_r) > 0.0

        # transmissive branch (gpt.cpp:301-337): generalized (Walter)
        # half vector scaled by the closure etas; refract the shifted wi
        # about it with the SHIFTED vertex's eta; Jacobian = ratio of the
        # unnormalized generalized-half-vector norms x |m_wi.h|/|s_wo.h|.
        eta_m = _tile4(
            surf_base.dispatch(
                ctx, prev_it, "eta_value", swl,
                init=jnp.ones((n,), jnp.float32),
            )
        )
        eta_s = surf_base.dispatch(
            ctx, s_it, "eta_value", swl4,
            init=jnp.ones((4 * n,), jnp.float32),
        )
        # reference arg names: main_wi := our ts_m_wo (toward camera),
        # main_wo := our ts_m_wi (sampled), shifted_wi := our ts_s_wi.
        h_nn_main = jnp.where(
            (fr.cos_theta(ts_m_wo) < 0.0)[..., None],
            -(ts_m_wo * eta_m[..., None] + ts_m_wi),
            -(ts_m_wo + ts_m_wi * eta_m[..., None]),
        )
        h_t = fr.normalize(h_nn_main)
        # refract ts_s_wi about h_t with interior IOR eta_s (orient h to the
        # incident side; fr.refract takes eta = eta_i/eta_t)
        cos_sh = fr.dot(ts_s_wi, h_t)
        h_or = jnp.where((cos_sh < 0.0)[..., None], -h_t, h_t)
        eta_rel = jnp.where(cos_sh > 0.0, 1.0 / eta_s, eta_s)
        refr_ok, ts_s_wo_t = fr.refract(ts_s_wi, h_or, eta_rel)
        h_nn_shift = jnp.where(
            (fr.cos_theta(ts_s_wi) < 0.0)[..., None],
            -(ts_s_wi * eta_s[..., None] + ts_s_wo_t),
            -(ts_s_wi + ts_s_wo_t * eta_s[..., None]),
        )
        jac_t = (
            jnp.sum(h_nn_shift * h_nn_shift, axis=-1)
            / (D_EPS + jnp.sum(h_nn_main * h_nn_main, axis=-1))
        ) * (
            jnp.abs(fr.dot(ts_m_wi, h_t))
            / (D_EPS + jnp.abs(fr.dot(ts_s_wo_t, h_t)))
        )
        ok_t = (
            refr_ok
            & (eta_m > 1.0 + 1e-6)
            & (eta_s > 1.0 + 1e-6)
            & (fr.cos_theta(ts_s_wi) * fr.cos_theta(ts_s_wo_t) < 0.0)
        )

        ts_s_wo = jnp.where(reflect_case[..., None], ts_s_wo_r, ts_s_wo_t)
        jac_hv = jnp.where(reflect_case, jac_r, jac_t)
        hv_geom_ok = jnp.where(reflect_case, ok_r, ok_t)
        hv_wo = fr.to_world(s_frame, ts_s_wo)
        hv_eval = _eval_surface(ctx, s_it, swl4, -s_ray.direction, hv_wo)
        hv_live = is_hv & hv_geom_ok & (hv_eval["pdf"] > 0)
        s_weight = _sel_tree(
            hv_live,
            s_prev_weight * safe_div(hv_eval["f"], hv_eval["pdf"][..., None]),
            s_weight,
        )
        s_pdf_div = jnp.where(
            hv_live,
            prev_pdf_div * jac_hv * hv_eval["pdf"] / jnp.maximum(t_pdf, D_EPS),
            s_pdf_div,
        )
        # advance the shifted ray through its own geometry
        hv_ray = ct.spawn_ray(s_it, hv_wo)
        hv_ray = hv_ray._replace(t_max=jnp.where(hv_live, hv_ray.t_max, 0.0))
        hv_hit = traverse.trace_closest(geom, hv_ray)
        hv_it = surface_interaction(arrays, hv_hit, hv_ray, needs_uv=plan.needs_uv)
        hv_it = hv_it._replace(valid=hv_it.valid & hv_live)
        hv_emit, hv_lum, _ = _emitter_at(
            compiled, ctx, arrays, light_sampler, hv_it, hv_ray, swl4, time
        )
        hv_next_diffuse = jnp.where(
            hv_it.valid, _vertex_diffuse(ctx, hv_it, shift_threshold), True
        )
        hv_miss = hv_live & ~hv_it.valid
        # structural compatibility checks (gpt.cpp:995-1040)
        die = jnp.zeros((4 * n,), bool)
        if plan.has_environment:
            die = die | (hv_miss & hit_case)  # shifted escaped, main did not
            die = die | (hv_miss & ~hit_case & _tile4(m_diffuse) & s_diffuse)
        else:
            die = die | hv_miss
        die = die | (hv_live & hv_it.valid & ~hit_case)
        die = die | (
            hv_live & hv_it.valid & hit_case
            & _tile4(m_diffuse) & s_diffuse & hv_next_diffuse
        )
        hv_ok = hv_live & ~die
        bh_main = sampling.balance_heuristic(t_pdf, t_lum)
        bh_shift = sampling.balance_heuristic(hv_eval["pdf"], hv_lum)
        d_hv_main = 1.0 / jnp.maximum(bh_main, D_EPS) + s_pdf_div / jnp.maximum(
            bh_shift, D_EPS
        )
        d_hv_shift = 1.0 / jnp.maximum(bh_main * s_pdf_div, D_EPS) + 1.0 / jnp.maximum(
            bh_shift, D_EPS
        )
        mc = _sel(hv_ok, _tile4(m_weight) * t_emit / jnp.maximum(d_hv_main, D_EPS)[..., None], mc)
        sc = _sel(hv_ok, s_weight * hv_emit / jnp.maximum(d_hv_shift, D_EPS)[..., None], sc)
        # failed half-vector shift evaluates central radiance then ends
        hv_failed = is_hv & (~hv_geom_ok | (hv_eval["pdf"] <= 0) | die)
        mc = _sel(
            hv_failed,
            _tile4(m_weight) * t_emit
            * _tile4(sampling.balance_heuristic(m_pdf, m_lum_pdf))[..., None],
            mc,
        )
        sc = _sel(hv_failed, jnp.zeros_like(sc), sc)
        s_end = s_end | hv_failed | (hv_miss & hv_ok)
        # shifted path state advances only in the half-vector branch
        s_ray = _sel_tree(hv_ok, hv_ray, s_ray)
        s_it = _sel_tree(hv_ok, hv_it, s_it)

        # --- accumulate (gpt.cpp:1070-1082) ---
        if central:
            # plain PT emission MIS, added once (gpt.cpp:769-771)
            m_radiance = m_radiance + jnp.where(
                m_alive2[..., None], m_weight_mis2 * m_emit * smp["f"], 0.0
            )
        else:
            mc = jnp.where(t_alive2[..., None], mc, 0.0)
            sc = jnp.where((t_alive2 & carry["s_alive"])[..., None], sc, 0.0)
            m_radiance = m_radiance + mc.reshape(4, n, c).sum(axis=0)
            s_radiance = s_radiance + sc
            s_gradient = s_gradient + (sc - mc)
        s_alive = s_alive & ~s_end

        # main path advances
        m_it = new_it
        m_ray = new_ray
        m_alive = m_alive2 & new_it.valid & (
            arrays["instances"]["surface_tag"][new_it.inst] >= 0
        )

        # --- russian roulette on the main weight (gpt.cpp:1091-1103) ---
        q = jnp.maximum(jnp.max(m_weight, axis=-1), 0.05)
        do_rr = (depth >= rr_depth) & (q < rr_threshold)
        kill = do_rr & (u_rr >= q)
        m_alive = m_alive & ~kill
        scale = jnp.where(do_rr & ~kill, 1.0 / q, 1.0)
        m_weight = m_weight * scale[..., None]
        s_weight = s_weight * _tile4(scale)[..., None]

        return {
            "state": state,
            "depth": depth + 1,
            "m_ray": m_ray,
            "m_it": m_it,
            "m_weight": m_weight,
            "m_radiance": m_radiance,
            "m_alive": m_alive,
            "s_ray": s_ray,
            "s_it": s_it,
            "s_weight": s_weight,
            "s_pdf_div": s_pdf_div,
            "s_radiance": s_radiance,
            "s_gradient": s_gradient,
            "s_alive": s_alive,
            "s_status": s_status,
        }

    final = jax.lax.while_loop(cond, body, carry)

    def to_rgb(x, w):
        return spectrum.srgb(x, w)

    return {
        "very_direct": to_rgb(very_direct, swl),
        "radiance": to_rgb(final["m_radiance"], swl),
        "neighbor": to_rgb(final["s_radiance"], swl4),
        "gradient": to_rgb(final["s_gradient"], swl4),
        "shift_alive": final["s_alive"],
        "weight": jnp.ones((n,), jnp.float32),
    }


@partial(jax.jit, static_argnames=("alpha", "iters"))
def reconstruct_l2(primal, grad_x, grad_y, alpha=0.2, iters=60):
    """Screened-Poisson L2 reconstruction (Kettunen et al. 2015 eq. 8):
    solve (alpha^2 I + nabla^T nabla) x = alpha^2 p + nabla^T g by conjugate
    gradients. Gradients use forward differences with gx[i] ~ I[x+1]-I[x].

    The reference ships raw gradient buffers and reconstructs offline; here
    the solve is one jitted XLA program over (H, W, 3) images (it used to
    run eagerly: ~60 CG iterations x ~12 ops dispatched one by one through
    the axon tunnel dominated GPT's warm render time)."""

    def dx(img):
        return jnp.concatenate(
            [img[:, 1:] - img[:, :-1], jnp.zeros_like(img[:, :1])], axis=1
        )

    def dy(img):
        return jnp.concatenate(
            [img[1:] - img[:-1], jnp.zeros_like(img[:1])], axis=0
        )

    def dxT(gx):
        # adjoint of forward-difference in x
        left = jnp.concatenate([jnp.zeros_like(gx[:, :1]), gx[:, :-1]], axis=1)
        g = gx.at[:, -1].set(0.0)
        return left - g

    def dyT(gy):
        up = jnp.concatenate([jnp.zeros_like(gy[:1]), gy[:-1]], axis=0)
        g = gy.at[-1].set(0.0)
        return up - g

    a2 = alpha * alpha

    def A(x):
        return a2 * x + dxT(dx(x)) + dyT(dy(x))

    b = a2 * primal + dxT(grad_x) + dyT(grad_y)

    def cg_step(state, _):
        x, r, p, rs = state
        Ap = A(p)
        pAp = jnp.sum(p * Ap)
        alpha_k = rs / jnp.maximum(pAp, 1e-20)
        x = x + alpha_k * p
        r = r - alpha_k * Ap
        rs_new = jnp.sum(r * r)
        p = r + (rs_new / jnp.maximum(rs, 1e-20)) * p
        return (x, r, p, rs_new), None

    x0 = primal
    r0 = b - A(x0)
    (x, _, _, _), _ = jax.lax.scan(
        cg_step, (x0, r0, r0, jnp.sum(r0 * r0)), None, length=iters
    )
    return x


@register(SceneNodeTag.INTEGRATOR, "gpt", "GPT", "gradient", "GradientPathTracing")
class GradientPathTracing(ProgressiveIntegrator):
    """gpt.cpp:28-52 defaults: depth 10 (ref uses max_depth -1 = unbounded;
    we bound), shift_threshold 0.1, rr; central_radiance switches off the
    gradient machinery; `reconstruct` (ours) runs the L2 Poisson solve."""

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.max_depth = desc.int("depth", 10)
        self.rr_depth = desc.int("rr_depth", 0)
        self.rr_threshold = desc.float("rr_threshold", 0.95)
        self.shift_threshold = desc.float("shift_threshold", 0.1)
        self.central_radiance = desc.bool("central_radiance", False)
        self.reconstruct = desc.bool("reconstruct", True)
        self.recon_alpha = desc.float("reconstruct_alpha", 0.2)
        self._aux_buffers = {}

    def _render_one_camera(self, compiled, camera):
        w, h = camera.film.resolution
        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.int32),
            jnp.arange(w, dtype=jnp.int32),
            indexing="ij",
        )
        pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
        n = pixel_xy.shape[0]
        spp = camera.spp
        spd = max(min(self.samples_per_pass, spp), 1)
        film = camera.film
        offs = jnp.asarray(PIXEL_SHIFTS, jnp.int32)
        sh_pixels = _tile4(pixel_xy) + jnp.repeat(offs, n, axis=0)
        in_bounds = (
            (sh_pixels[:, 0] >= 0) & (sh_pixels[:, 0] < w)
            & (sh_pixels[:, 1] >= 0) & (sh_pixels[:, 1] < h)
        )

        # cached per (scene, camera): a fresh jit closure per render()
        # call recompiles the whole pass
        cache = getattr(self, "_pass_cache", None)
        if cache is None:
            cache = self._pass_cache = {}
        ckey = (id(compiled), id(camera), self.render_time)
        render_pass = cache.get(ckey)
        if render_pass is not None:
            return self._run_passes(film, spp, spd, compiled, render_pass)

        @partial(jax.jit, static_argnums=(3,), donate_argnums=(1,))
        def render_pass(arrays, bufs, sample_index0, n_samples):
            def one_sample(i, bufs):
                accum, gx, gy, eff = bufs
                out = gpt_trace_batch(
                    compiled, arrays, camera, self.sampler,
                    self.light_sampler, pixel_xy, sample_index0 + i,
                    max_depth=self.max_depth,
                    rr_depth=self.rr_depth,
                    rr_threshold=self.rr_threshold,
                    shift_threshold=self.shift_threshold,
                    central=self.central_radiance,
                    time=self.render_time,
                )
                if self.central_radiance:
                    rgb = out["very_direct"] + out["radiance"]
                    accum = film.accumulate_image(
                        accum, rgb.reshape(h, w, 3), out["weight"].reshape(h, w)
                    )
                    return accum, gx, gy, eff
                # central pixel: 8x emission + 2x MIS radiance at effective
                # spp 4 (gpt.cpp:1161-1177). accumulate_image multiplies by
                # the sample weight, so pass the per-sample mean (value/4).
                rgb_c = 2.0 * out["very_direct"] + 0.5 * out["radiance"]
                accum = film.accumulate_image(
                    accum, rgb_c.reshape(h, w, 3), 4.0 * out["weight"].reshape(h, w)
                )
                # neighbor splats: 2x shifted radiance at spp 1. Every
                # GPT shift is a CONSTANT +-1-pixel offset, so all splats
                # are dense jnp.roll's with a zeroed border instead of
                # scatter-adds — six 65k-262k-index scatters per sample
                # were ~85%% of warm render time (TPU scatters are the
                # documented slow path; the trace itself is 32 ms).
                def roll_img(img, dx, dy):
                    r = jnp.roll(img, shift=(dy, dx), axis=(0, 1))
                    if dx == 1:
                        r = r.at[:, 0].set(0.0)
                    elif dx == -1:
                        r = r.at[:, -1].set(0.0)
                    if dy == 1:
                        r = r.at[0].set(0.0)
                    elif dy == -1:
                        r = r.at[-1].set(0.0)
                    return r

                nb4 = (2.0 * out["neighbor"]).reshape(4, h, w, 3)
                alive4 = out["shift_alive"].astype(jnp.float32).reshape(
                    4, h, w
                )
                wones = jnp.ones((h, w), jnp.float32)
                for k, (sdx, sdy) in enumerate(PIXEL_SHIFTS):
                    accum = film.accumulate_image(
                        accum, roll_img(nb4[k], sdx, sdy),
                        roll_img(wones, sdx, sdy),
                    )
                    eff = eff + roll_img(alive4[k], sdx, sdy)
                # gradients: right/bottom at the pixel (+), left/top at the
                # shifted pixel (-) (gpt.cpp:1179-1189); the main-grid adds
                # are raster-order -> plain reshaped adds, the left/top
                # ones are (-1, 0)/(0, -1) rolls
                gdiff = 2.0 * (
                    out["gradient"]
                    - _tile4(out["very_direct"])
                )
                g4 = gdiff.reshape(4, h, w, 3)
                gx = gx + jnp.concatenate(
                    [g4[0] + roll_img(-g4[2], -1, 0),
                     (wones + roll_img(wones, -1, 0))[..., None]], axis=-1
                )
                gy = gy + jnp.concatenate(
                    [g4[1] + roll_img(-g4[3], 0, -1),
                     (wones + roll_img(wones, 0, -1))[..., None]], axis=-1
                )
                return accum, gx, gy, eff

            return jax.lax.fori_loop(0, n_samples, one_sample, bufs)

        cache[ckey] = render_pass
        return self._run_passes(film, spp, spd, compiled, render_pass)

    def _run_passes(self, film, spp, spd, compiled, render_pass):
        w, h = film.resolution
        camera_file = [
            c.file for c in compiled.scene.cameras if c.film is film
        ][0]
        bufs = (
            film.prepare(),
            jnp.zeros((h, w, 4), jnp.float32),  # gx rgb + splat count
            jnp.zeros((h, w, 4), jnp.float32),  # gy rgb + splat count
            jnp.zeros((h, w), jnp.float32),
        )
        done = 0
        while done < spp:
            k = min(spd, spp - done)
            bufs = render_pass(compiled.arrays, bufs, jnp.int32(done), k)
            done += k
        accum, gx, gy, eff = bufs
        primal = film.develop(accum)
        if self.central_radiance:
            return primal
        gx = gx[..., :3] / jnp.maximum(gx[..., 3:4], 1.0)
        gy = gy[..., :3] / jnp.maximum(gy[..., 3:4], 1.0)
        self._aux_buffers[camera_file] = {
            "gradient_x": gx,
            "gradient_y": gy,
            "effective": eff[..., None] / spp * jnp.ones((1, 1, 3)),
        }
        if self.reconstruct:
            return reconstruct_l2(primal, gx, gy, alpha=self.recon_alpha)
        return primal

    def render(self, compiled, save: bool = False) -> dict:
        import os

        import numpy as np

        from ..utils import imageio

        results = super().render(compiled, save=save)
        for file, bufs in self._aux_buffers.items():
            stem, ext = os.path.splitext(file)
            for key, img in bufs.items():
                name = f"{stem}_{key}{ext}"
                results[name] = np.asarray(jax.device_get(img))
                if save:
                    imageio.save_image(name, results[name])
        self._aux_buffers = {}
        return results
