"""Auxiliary integrators: normal visualizer, direct lighting, AOV, group.

TPU-native equivalents of /root/reference/src/integrators/{normal,direct,
aov,group}.cpp:
- normal (normal.cpp:21-22): shading or geometric normal AOV, optional
  [-1,1] -> [0,1] remap;
- direct (direct.cpp:29-44): one-bounce direct lighting; importance_sampling
  = light | surface | both (MIS);
- aov (aov.cpp:19-230): renders auxiliary buffers (normal/albedo/depth/
  roughness/mask + full 'sample') to per-component images;
- group (group.cpp:10-35): runs child integrators sequentially.
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
from .base import Integrator, ProgressiveIntegrator
from . import common


def _camera_rays(compiled, camera, sampler, pixel_xy, sample_index):
    n = pixel_xy.shape[0]
    spectrum = compiled.spectrum
    state = sampler.start(pixel_xy, sample_index)
    state, u_filter = sampler.generate_pixel_2d(state)
    u_lens = jnp.full((n, 2), 0.5, jnp.float32)
    if camera.requires_lens_sampling:
        state, u_lens = sampler.generate_2d(state)
    ray, _, weight = camera.generate_rays(pixel_xy, u_filter, u_lens, 0.0)
    if spectrum.is_fixed:
        swl = spectrum.sample_wavelengths(jnp.zeros((n, 1), jnp.float32))
    else:
        state, u_swl = sampler.generate_1d(state)
        swl = spectrum.sample_wavelengths(u_swl[..., None])
    return ray, state, swl, weight


class _SimpleProgressive(ProgressiveIntegrator):
    """Shared per-pass plumbing for single-bounce integrators."""

    def _sample_radiance(self, compiled, arrays, camera, pixel_xy, sample_index):
        raise NotImplementedError

    def _render_one_camera(self, compiled, camera):
        w, h = camera.film.resolution
        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.int32),
            jnp.arange(w, dtype=jnp.int32),
            indexing="ij",
        )
        pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
        film = camera.film
        spp = camera.spp
        spd = max(min(self.samples_per_pass, spp), 1)

        @partial(jax.jit, static_argnums=(3,), donate_argnums=(1,))
        def render_pass(arrays, accum, s0, k):
            def one(i, acc):
                rgb, weight = self._sample_radiance(
                    compiled, arrays, camera, pixel_xy, s0 + i
                )
                return film.accumulate_image(
                    acc, rgb.reshape(h, w, 3), weight.reshape(h, w)
                )

            return jax.lax.fori_loop(0, k, one, accum)

        accum = film.prepare()
        done = 0
        while done < spp:
            k = min(spd, spp - done)
            accum = render_pass(compiled.arrays, accum, jnp.int32(done), k)
            done += k
        return film.develop(accum)


@register(SceneNodeTag.INTEGRATOR, "normal", "Normal")
class NormalVisualizer(_SimpleProgressive):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.shading = desc.string("normal", "shading").lower() != "geometric"
        self.remap = desc.bool("remap", True)

    def _sample_radiance(self, compiled, arrays, camera, pixel_xy, sample_index):
        ray, state, swl, weight = _camera_rays(
            compiled, camera, self.sampler, pixel_xy, sample_index
        )
        geom = compiled.trace_geometry(arrays)
        hit = traverse.trace_closest(geom, ray)
        it = surface_interaction(arrays, hit, ray)
        n = it.ns if self.shading else it.ng
        n = jnp.where(it.valid[..., None], n, 0.0)
        if self.remap:
            n = n * 0.5 + 0.5
            n = jnp.where(it.valid[..., None], n, 0.0)
        return n, weight


@register(SceneNodeTag.INTEGRATOR, "direct", "Direct")
class DirectLighting(_SimpleProgressive):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        mode = desc.string("importance_sampling", "both").lower()
        if mode not in ("light", "surface", "both"):
            raise ValueError(f"invalid importance_sampling '{mode}'")
        self.mode = mode

    def _sample_radiance(self, compiled, arrays, camera, pixel_xy, sample_index):
        sampler = self.sampler
        light_sampler = self.light_sampler
        ctx = compiled.context(arrays)
        geom = compiled.trace_geometry(arrays)
        plan = compiled.plan
        n = pixel_xy.shape[0]
        c = plan.spectral_dim

        ray, state, swl, cam_weight = _camera_rays(
            compiled, camera, sampler, pixel_xy, sample_index
        )
        wo = -ray.direction
        hit = traverse.trace_closest(geom, ray)
        it = surface_interaction(arrays, hit, ray)
        L = jnp.zeros((n, c), jnp.float32)
        beta = jnp.broadcast_to(cam_weight[..., None], (n, c))

        if plan.has_environment:
            env = light_sampler.evaluate_miss(ctx, ray.direction, swl, 0.0)
            L = jnp.where((~it.valid)[..., None], L + beta * env["L"], L)
        if plan.num_lights > 0:
            has_light = arrays["instances"]["light_tag"][it.inst] >= 0
            le = light_sampler.evaluate_hit(ctx, it, ray.origin, swl, 0.0)
            L = jnp.where(
                (it.valid & has_light)[..., None], L + beta * le["L"], L
            )

        has_surface = (
            arrays["instances"]["surface_tag"][it.inst] >= 0
        ) & it.valid
        it = it._replace(valid=has_surface)

        state, u_sel = sampler.generate_1d(state)
        state, u_light = sampler.generate_2d(state)
        state, u_lobe = sampler.generate_1d(state)
        state, u_bsdf = sampler.generate_2d(state)

        # light-sampling estimator
        if self.mode in ("light", "both") and (
            plan.num_lights > 0 or plan.has_environment
        ):
            ls = light_sampler.sample(ctx, it, u_sel, u_light, swl, 0.0)
            sray = ct.spawn_ray_to(it, ls["p"], ls["ng"])
            sray = sray._replace(
                t_max=jnp.where(has_surface & (ls["pdf"] > 0), sray.t_max, 0.0)
            )
            occ = traverse.trace_any(geom, sray)
            f_eval = surf_base.dispatch(
                ctx, it, "evaluate", swl, wo, ls["wi"],
                init={"f": jnp.zeros((n, c)), "pdf": jnp.zeros((n,))},
            )
            w = safe_div(jnp.ones_like(ls["pdf"]), ls["pdf"])
            if self.mode == "both":
                w = w * sampling.balance_heuristic(ls["pdf"], f_eval["pdf"])
            ok = has_surface & (ls["pdf"] > 0) & ~occ
            L = jnp.where(
                ok[..., None], L + beta * f_eval["f"] * ls["L"] * w[..., None], L
            )

        # surface-sampling estimator
        if self.mode in ("surface", "both") and (
            plan.num_lights > 0 or plan.has_environment
        ):
            s = surf_base.dispatch(
                ctx, it, "sample", swl, wo, u_lobe, u_bsdf,
                init={
                    "f": jnp.zeros((n, c)),
                    "pdf": jnp.zeros((n,)),
                    "wi": jnp.broadcast_to(
                        jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3)
                    ),
                    "event": jnp.zeros((n,), jnp.int32),
                    "eta": jnp.ones((n,)),
                },
            )
            ray2 = ct.spawn_ray(it, s["wi"])
            ray2 = ray2._replace(
                t_max=jnp.where(has_surface & (s["pdf"] > 0), ray2.t_max, 0.0)
            )
            hit2 = traverse.trace_closest(geom, ray2)
            it2 = surface_interaction(arrays, hit2, ray2)
            tp = beta * safe_div(s["f"], s["pdf"][..., None])
            if plan.num_lights > 0:
                has_light2 = (
                    arrays["instances"]["light_tag"][it2.inst] >= 0
                ) & it2.valid
                le2 = light_sampler.evaluate_hit(ctx, it2, ray2.origin, swl, 0.0)
                w2 = (
                    sampling.balance_heuristic(s["pdf"], le2["pdf"])
                    if self.mode == "both"
                    else jnp.ones_like(s["pdf"])
                )
                ok2 = has_surface & (s["pdf"] > 0) & has_light2
                L = jnp.where(
                    ok2[..., None], L + tp * le2["L"] * w2[..., None], L
                )
            if plan.has_environment:
                env2 = light_sampler.evaluate_miss(ctx, ray2.direction, swl, 0.0)
                w2 = (
                    sampling.balance_heuristic(s["pdf"], env2["pdf"])
                    if self.mode == "both"
                    else jnp.ones_like(s["pdf"])
                )
                ok2 = has_surface & (s["pdf"] > 0) & ~it2.valid
                L = jnp.where(
                    ok2[..., None], L + tp * env2["L"] * w2[..., None], L
                )

        return compiled.spectrum.srgb(L, swl), jnp.ones((n,), jnp.float32)


@register(SceneNodeTag.INTEGRATOR, "aov", "AOV")
class AOVIntegrator(_SimpleProgressive):
    """Renders auxiliary buffers; `variant` picks which one lands in the film
    (sample/normal/albedo/depth/roughness/mask — aov.cpp:19-27). The full
    multi-buffer EXR dump arrives with the output subsystem."""

    VARIANTS = ("sample", "normal", "albedo", "depth", "roughness", "mask")

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.variant = desc.string("variant", "albedo").lower()
        if self.variant not in self.VARIANTS:
            raise ValueError(
                f"unknown AOV variant '{self.variant}'; choose {self.VARIANTS}"
            )

    def _render_one_camera(self, compiled, camera):
        # AOVs are data, not radiance: bypass the color film's relative
        # clamp (the reference uses dedicated float4 buffers, aov.cpp:143)
        saved_clamp = camera.film.clamp
        camera.film.clamp = 1e30
        try:
            return super()._render_one_camera(compiled, camera)
        finally:
            camera.film.clamp = saved_clamp

    def _sample_radiance(self, compiled, arrays, camera, pixel_xy, sample_index):
        ctx = compiled.context(arrays)
        geom = compiled.trace_geometry(arrays)
        n = pixel_xy.shape[0]
        c = compiled.plan.spectral_dim
        ray, state, swl, weight = _camera_rays(
            compiled, camera, self.sampler, pixel_xy, sample_index
        )
        if self.variant == "sample":
            from .mega_path import path_trace_batch

            rgb, wgt = path_trace_batch(
                compiled, arrays, camera, self.sampler, self.light_sampler,
                pixel_xy, sample_index, max_depth=10, rr_depth=0,
                rr_threshold=0.95,
            )
            return rgb, wgt
        hit = traverse.trace_closest(geom, ray)
        it = surface_interaction(arrays, hit, ray)
        valid = it.valid[..., None]
        if self.variant == "normal":
            out = jnp.where(valid, it.ns * 0.5 + 0.5, 0.0)
        elif self.variant == "depth":
            d = jnp.where(it.valid, hit.t, 0.0)
            out = jnp.stack([d, d, d], axis=-1)
        elif self.variant == "mask":
            m = it.valid.astype(jnp.float32)
            out = jnp.stack([m, m, m], axis=-1)
        elif self.variant == "roughness":
            r = surf_base.dispatch(
                ctx, it, "roughness", init=jnp.ones((n, 2), jnp.float32)
            )
            out = jnp.concatenate([r, jnp.zeros((n, 1))], axis=-1)
            out = jnp.where(valid, out, 0.0)
        else:  # albedo
            a = surf_base.dispatch(
                ctx, it, "albedo", swl, init=jnp.zeros((n, c), jnp.float32)
            )
            out = compiled.spectrum.srgb(a, swl)
            out = jnp.where(valid, out, 0.0)
        return out, weight


@register(SceneNodeTag.INTEGRATOR, "group", "Group")
class GroupIntegrator(Integrator):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.children = [
            scene.load_integrator(i) for i in desc.node_list("integrators")
        ]
        if not self.children:
            raise ValueError("group integrator needs children")

    def render(self, compiled, save: bool = False) -> dict:
        results = {}
        for child in self.children:
            results.update(child.render(compiled, save=save))
        return results
