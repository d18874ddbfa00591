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

    def _render_one_camera(self, compiled, camera):
        raise NotImplementedError

    def render(self, compiled, save: bool = False) -> dict:
        results = {}
        for camera in compiled.scene.cameras:
            t0 = _time.time()
            image = self._render_one_camera(compiled, camera)
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
