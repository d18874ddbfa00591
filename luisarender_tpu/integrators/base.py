"""Integrator interface and the progressive render loop.

TPU-native equivalent of /root/reference/src/base/integrator.h:24-45 and
integrator.cpp:34-113 (ProgressiveIntegrator): per-camera film prepare ->
per-spp jitted device passes (batched over samples-per-pass) -> film develop
-> image save. The per-spp kernel dispatch of the reference becomes one jitted
step function called in a host loop; `dispatches-per-commit` batching
(integrator.cpp:100-106) becomes `samples_per_pass` fused inside one jit.
"""

from __future__ import annotations

import logging
import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.node import SceneNodeDesc, SceneNodeTag
from ..scene.scene import SceneNode
from ..utils import imageio

log = logging.getLogger("luisarender_tpu")


class Integrator(SceneNode):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        sampler_desc = desc.node("sampler")
        if sampler_desc is None:
            sampler_desc = SceneNodeDesc(
                identifier="$default_sampler",
                tag=SceneNodeTag.SAMPLER,
                impl_type="independent",
            )
        self.sampler = scene.load_sampler(sampler_desc)
        ls_desc = desc.node("light_sampler")
        if ls_desc is None:
            ls_desc = SceneNodeDesc(
                identifier="$default_light_sampler",
                tag=SceneNodeTag.LIGHT_SAMPLER,
                impl_type="uniform",
            )
        self.light_sampler = scene.load_light_sampler(ls_desc)

    def render(self, compiled) -> dict:
        """Render every camera; returns {camera_file: np image (H, W, 3)}."""
        raise NotImplementedError


class ProgressiveIntegrator(Integrator):
    """Hosts the per-camera progressive loop (integrator.cpp:34-113)."""

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.samples_per_pass = desc.int("samples_per_pass", 4)
        # set per shutter bucket by _render_camera_with_shutter; closed over
        # by the jitted pass so each bucket compiles with its camera pose
        self.render_time = 0.0
        # progressive checkpoint/resume (SURVEY.md §5: save the accumulation
        # buffer + sample count every N passes; the sampler is stateless and
        # seeded by sample index, so resuming is exact)
        self.checkpoint_file = desc.string("checkpoint_file", "")
        self.checkpoint_interval = desc.int("checkpoint_interval", 8)

    def _progressive_loop(self, film, spp, spd, step_fn):
        """Shared progressive loop: step_fn(accum, done, n) -> accum renders
        n more samples starting at sample index `done`. Handles checkpoint
        save/resume and per-pass progress logging."""
        accum, done = film.prepare(), 0
        ckpt = self.checkpoint_file
        if ckpt:
            try:
                data = np.load(ckpt)
                if tuple(data["accum"].shape[:2]) == tuple(
                    (film.resolution[1], film.resolution[0])
                ) and int(data["spp"]) == spp:
                    accum = jnp.asarray(data["accum"])
                    done = int(data["done"])
                    log.info("resumed checkpoint %s at %d/%d spp", ckpt, done, spp)
            except (FileNotFoundError, OSError, KeyError):
                pass
        since_ckpt = 0
        while done < spp:
            n = min(spd, spp - done)
            accum = step_fn(accum, done, n)
            done += n
            since_ckpt += n
            log.info("progress: %d/%d spp", done, spp)
            if hasattr(film, "maybe_preview"):
                film.maybe_preview(accum)
            if ckpt and (since_ckpt >= self.checkpoint_interval or done >= spp):
                np.savez(
                    ckpt, accum=np.asarray(jax.device_get(accum)),
                    done=done, spp=spp,
                )
                since_ckpt = 0
        return accum

    def _render_one_camera(self, compiled, camera):
        raise NotImplementedError

    def _render_camera_with_shutter(self, compiled, camera):
        """Motion blur: re-bake world-space geometry per shutter bucket and
        average the bucket renders (the reference re-uploads transforms and
        rebuilds the TLAS per shutter time, base/pipeline.cpp:101-113 /
        camera.cpp:150-204)."""
        t0s, t1s = camera.shutter_span
        if t1s <= t0s:
            return self._render_one_camera(compiled, camera)
        from ..scene.compiler import compile_scene

        n_buckets = max(camera.shutter_samples, 2)
        times, weights = camera.shutter_weights(n_buckets)
        total = None
        for t, w in zip(times, weights):
            compiled_t = compile_scene(compiled.scene, time=float(t))
            self.render_time = float(t)
            try:
                img = self._render_one_camera(compiled_t, camera)
            finally:
                self.render_time = 0.0
            total = img * w if total is None else total + img * w
        return total

    def render(self, compiled, save: bool = False) -> dict:
        results = {}
        for camera in compiled.scene.cameras:
            t0 = _time.time()
            image = self._render_camera_with_shutter(compiled, camera)
            image = np.asarray(jax.device_get(image))
            log.info(
                "rendered %s (%dx%d, %d spp) in %.2fs",
                camera.file,
                *camera.film.resolution,
                camera.spp,
                _time.time() - t0,
            )
            results[camera.file] = image
            if save:
                imageio.save_image(camera.file, image)
        return results
