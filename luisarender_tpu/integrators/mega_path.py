"""Megakernel unidirectional path tracer with NEE + MIS.

TPU-native equivalent of /root/reference/src/integrators/mega_path.cpp:49-156:
single fused kernel per pass, NEE with balance-heuristic MIS, BSDF sampling,
Russian roulette with eta scale, carried pdf_bsdf for hit-light MIS.

The reference's per-pixel megakernel becomes a *batched SoA* program: all rays
advance together through a `lax.while_loop` over bounces with an active mask —
i.e. a wavefront without compaction. XLA fuses the whole bounce body into a
small number of TPU kernels; the whole pass (camera rays -> bounces -> film)
is one jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

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


def path_trace_batch(
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
    time=0.0,
    with_stats=False,
):
    """Trace one sample for each pixel in pixel_xy (N, 2).

    Returns (rgb (N, 3), filter_weight (N,)); with_stats=True appends a dict
    with 'rays' = total rays traced (closest + shadow), for Mray/s benches.
    """
    ctx = compiled.context(arrays)
    geom = compiled.trace_geometry(arrays)
    plan = compiled.plan
    spectrum = compiled.spectrum
    n = pixel_xy.shape[0]
    c = plan.spectral_dim

    state = sampler.start(pixel_xy, sample_index)
    state, u_filter = sampler.generate_pixel_2d(state)
    if camera.requires_lens_sampling:
        state, u_lens = sampler.generate_2d(state)
    else:
        u_lens = jnp.full((n, 2), 0.5, jnp.float32)
    ray, _, cam_weight = camera.generate_rays(pixel_xy, u_filter, u_lens, time)
    if spectrum.is_fixed:
        swl = spectrum.sample_wavelengths(jnp.zeros((n, 1), jnp.float32))
    else:
        state, u_swl = sampler.generate_1d(state)
        swl = spectrum.sample_wavelengths(u_swl[..., None])

    def loop_cond(carry):
        depth = carry["depth"]
        return (depth < max_depth) & jnp.any(carry["active"])

    def loop_body(carry):
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
        hit = traverse.trace_closest(geom, ray)
        it = surface_interaction(arrays, hit, ray)
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

        # --- dispersion: collapse to the hero wavelength on dispersive hits
        # (mega_path.cpp:117-119 swl.terminate_secondary) ---
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

        # --- NEE: sample one light + shadow ray (mega_path.cpp:100-110) ---
        if plan.num_lights > 0 or plan.has_environment:
            ls = light_sampler.sample(ctx, it, u_sel, u_light, swl, time)
            shadow_ray = ct.spawn_ray_to(it, ls["p"], ls["ng"])
            # inactive lanes carry a degenerate ray; give them zero extent
            shadow_ray = shadow_ray._replace(
                t_max=jnp.where(active & (ls["pdf"] > 0), shadow_ray.t_max, 0.0)
            )
            n_rays = n_rays + jnp.sum(
                (active & (ls["pdf"] > 0)).astype(jnp.int32)
            )
            occluded = traverse.trace_any(geom, shadow_ray)
            wi_nee = ls["wi"]
            f_eval = surf_base.dispatch(
                ctx,
                it,
                "evaluate",
                swl,
                wo,
                wi_nee,
                init={
                    "f": jnp.zeros((n, c), jnp.float32),
                    "pdf": jnp.zeros((n,), jnp.float32),
                },
            )
            w_mis = safe_div(
                sampling.balance_heuristic(ls["pdf"], f_eval["pdf"]), ls["pdf"]
            )
            nee_ok = active & (ls["pdf"] > 0) & ~occluded
            contrib = beta * f_eval["f"] * ls["L"] * w_mis[..., None]
            L = jnp.where(nee_ok[..., None], L + contrib, L)

        # --- BSDF sampling (mega_path.cpp:131-144) ---
        s = surf_base.dispatch(
            ctx,
            it,
            "sample",
            swl,
            wo,
            u_lobe,
            u_bsdf,
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

        # --- Russian roulette (mega_path.cpp:146-153) ---
        q = jnp.maximum(jnp.max(beta, axis=-1) * eta_scale, 0.05)
        do_rr = (depth + 1 >= rr_depth) & active
        kill = do_rr & (q < rr_threshold) & (u_rr >= q)
        boost = jnp.where(do_rr & (q < rr_threshold), 1.0 / jnp.maximum(q, 1e-6), 1.0)
        beta = beta * boost[..., None]
        active = active & ~kill

        return {
            "ray": ray,
            "beta": beta,
            "L": L,
            "active": active,
            "state": state,
            "pdf_bsdf": pdf_bsdf,
            "eta_scale": eta_scale,
            "depth": depth + 1,
            "swl": swl,
            "n_rays": n_rays,
        }

    # inits derive from per-ray data so shard_map's varying-axes tracking
    # treats the whole carry as device-varying (see accel/traverse.py)
    zero_f = jnp.zeros_like(cam_weight)
    init = {
        "ray": ray,
        "beta": jnp.broadcast_to(cam_weight[..., None], (n, c)),
        "L": jnp.broadcast_to(zero_f[..., None], (n, c)),
        "active": zero_f < 1.0,
        "state": state,
        "pdf_bsdf": zero_f + 1e16,
        "eta_scale": zero_f + 1.0,
        "depth": jnp.int32(0),
        "swl": swl,
        "n_rays": jnp.sum(zero_f).astype(jnp.int32),
    }
    final = jax.lax.while_loop(loop_cond, loop_body, init)
    rgb = spectrum.srgb(final["L"], final["swl"])
    weight = jnp.ones((n,), jnp.float32)
    if with_stats:
        return rgb, weight, {"rays": final["n_rays"]}
    return rgb, weight


@register(SceneNodeTag.INTEGRATOR, "megapath", "MegaPath", "path", "Path")
class MegakernelPathTracing(ProgressiveIntegrator):
    """mega_path.cpp:23-25 defaults: depth 10, rr_depth 0, rr_threshold 0.95
    (BASELINE.md pins depth 10, rr defaults)."""

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.max_depth = desc.int("depth", 10)
        self.rr_depth = desc.int("rr_depth", 0)
        self.rr_threshold = desc.float("rr_threshold", 0.95)

    def _render_one_camera(self, compiled, camera):
        w, h = camera.film.resolution
        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.int32), jnp.arange(w, dtype=jnp.int32), indexing="ij"
        )
        pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
        spp = camera.spp
        spd = max(min(self.samples_per_pass, spp), 1)
        sampler = self.sampler
        light_sampler = self.light_sampler
        film = camera.film

        @partial(jax.jit, static_argnums=(3,), donate_argnums=(1,))
        def render_pass(arrays, accum, sample_index0, n_samples):
            def one_sample(i, acc):
                rgb, weight = path_trace_batch(
                    compiled,
                    arrays,
                    camera,
                    sampler,
                    light_sampler,
                    pixel_xy,
                    sample_index0 + i,
                    max_depth=self.max_depth,
                    rr_depth=self.rr_depth,
                    rr_threshold=self.rr_threshold,
                )
                return film.accumulate_image(
                    acc, rgb.reshape(h, w, 3), weight.reshape(h, w)
                )

            return jax.lax.fori_loop(0, n_samples, one_sample, accum)

        accum = film.prepare()
        done = 0
        while done < spp:
            n = min(spd, spp - done)
            accum = render_pass(compiled.arrays, accum, jnp.int32(done), n)
            done += n
        return film.develop(accum)
