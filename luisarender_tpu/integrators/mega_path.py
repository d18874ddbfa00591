"""Megakernel unidirectional path tracer with NEE + MIS.

TPU-native equivalent of /root/reference/src/integrators/mega_path.cpp:49-156:
single fused kernel per pass, NEE with balance-heuristic MIS, BSDF sampling,
Russian roulette with eta scale, carried pdf_bsdf for hit-light MIS.

The reference's per-pixel megakernel becomes a *batched SoA* program: all rays
advance together through a `lax.while_loop` over bounces with an active mask —
i.e. a wavefront without compaction (the bounce body itself lives in
integrators/common.py and is shared with the true wavefront integrator).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..scene.node import SceneNodeTag
from ..scene.registry import register
from . import common
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
    spectrum = compiled.spectrum
    n = pixel_xy.shape[0]
    c = compiled.plan.spectral_dim

    from ..ops import fused_path

    if fused_path.use_fused(compiled, sampler, light_sampler):
        cam = fused_path.camgen_params(camera, time)
        if cam is not None:
            cam = {**cam, "sampler_seed": sampler.seed & 0xFFFFFFFF}
            rgb, n_rays = fused_path.trace_paths_fused_camgen(
                compiled, arrays, cam, pixel_xy, sample_index,
                max_depth=max_depth, rr_depth=rr_depth,
                rr_threshold=rr_threshold,
                interpret=fused_path.FORCE_INTERPRET,
                light_sampler=light_sampler,
            )
        else:
            state0 = sampler.start(pixel_xy, sample_index)
            state0, u_filter = sampler.generate_pixel_2d(state0)
            if camera.requires_lens_sampling:
                state0, u_lens = sampler.generate_2d(state0)
            else:
                u_lens = jnp.full((n, 2), 0.5, jnp.float32)
            ray, _, cam_weight = camera.generate_rays(
                pixel_xy, u_filter, u_lens, time
            )
            rgb, n_rays = fused_path.trace_paths_fused(
                compiled, arrays, ray, cam_weight, state0,
                max_depth=max_depth, rr_depth=rr_depth,
                rr_threshold=rr_threshold,
                interpret=fused_path.FORCE_INTERPRET,
                light_sampler=light_sampler,
            )
        weight = jnp.ones((n,), jnp.float32)
        if with_stats:
            return rgb, weight, {"rays": n_rays}
        return rgb, weight

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

    init = common.init_carry(
        ray,
        jnp.broadcast_to(cam_weight[..., None], (n, c)),
        state,
        swl,
        cone=camera.ray_cone(),
    )

    def loop_cond(carry):
        return common.has_work(carry)

    def loop_body(carry):
        return common.bounce_step(
            compiled,
            arrays,
            sampler,
            light_sampler,
            carry,
            max_depth=max_depth,
            rr_depth=rr_depth,
            rr_threshold=rr_threshold,
            time=time,
        )

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

    persistent = False  # MegawaveIntegrator flips this

    def _use_persistent(self, compiled, camera):
        from ..ops import fused_path

        return (
            self.persistent
            and fused_path.use_fused(compiled, self.sampler, self.light_sampler)
            and fused_path.camgen_params(camera, self.render_time) is not None
            # env scenes take the unrolled megapath (pre-sampled candidates
            # need static per-bounce draw offsets; see fused_path)
            and not getattr(compiled.plan, "has_environment", False)
        )

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

        if self._use_persistent(compiled, camera):
            from ..ops import fused_path

            cam = fused_path.camgen_params(camera, self.render_time)
            cam = {**cam, "sampler_seed": sampler.seed & 0xFFFFFFFF}

            @partial(jax.jit, static_argnums=(3,), donate_argnums=(1,))
            def render_pass_p(arrays, accum, sample_index0, n_samples):
                rgb_sum, _ = fused_path.trace_paths_fused_persistent(
                    compiled, arrays, cam, pixel_xy, sample_index0,
                    n_samples, max_depth=self.max_depth,
                    rr_depth=self.rr_depth, rr_threshold=self.rr_threshold,
                    interpret=fused_path.FORCE_INTERPRET,
                )
                # accumulate the per-sample MEAN with weight n (the relative
                # clamp then acts on the mean — per-sample-equivalent)
                return film.accumulate_image(
                    accum, rgb_sum.reshape(h, w, 3) / float(n_samples),
                    jnp.full((h, w), float(n_samples), jnp.float32),
                )

            accum = self._progressive_loop(
                film, spp, spd,
                lambda accum, done, n: render_pass_p(
                    compiled.arrays, accum, jnp.int32(done), n
                ),
            )
            return film.develop(accum)

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
                    time=self.render_time,
                )
                return film.accumulate_image(
                    acc, rgb.reshape(h, w, 3), weight.reshape(h, w)
                )

            return jax.lax.fori_loop(0, n_samples, one_sample, accum)

        accum = self._progressive_loop(
            film,
            spp,
            spd,
            lambda accum, done, n: render_pass(
                compiled.arrays, accum, jnp.int32(done), n
            ),
        )
        return film.develop(accum)


@register(SceneNodeTag.INTEGRATOR, "megawave", "MegaWave")
class MegawaveIntegrator(MegakernelPathTracing):
    """Persistent-threads megakernel (megawave.cpp:300-470): the whole
    sample budget of a pass runs inside ONE kernel launch; lanes that finish
    a path splat it to an in-register accumulator and immediately regenerate
    their pixel's next sample (ops/fused_path.py persistent mode), so no
    lane idles at a path boundary — the TPU equivalent of the reference's
    block-level work redistribution. Scenes outside the fused-kernel class
    fall back to the plain megapath pass loop."""

    persistent = True
