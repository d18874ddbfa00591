"""Pinhole camera.

TPU-native equivalent of /root/reference/src/cameras/pinhole.cpp:60-67:
p = (pixel*2 - resolution) * tan(fov/2)/resolution.y; dir = (p.x, -p.y, -1).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import frame as fr
from ..scene.node import SceneNodeTag
from ..scene.registry import register
from .base import Camera


@register(SceneNodeTag.CAMERA, "pinhole", "Pinhole")
class PinholeCamera(Camera):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.fov = desc.float("fov", 35.0)  # degrees, vertical

    def ray_cone(self):
        # one-pixel cone: the image plane spans 2 tan(fov/2) vertically over
        # resolution.y pixels at unit distance
        tan_half = float(np.tan(np.deg2rad(self.fov) * 0.5))
        return 0.0, 2.0 * tan_half / float(self.film.resolution[1])

    def _generate_ray_in_camera_space(self, pixel, u_lens, time):
        res = jnp.asarray(self.film.resolution, dtype=jnp.float32)
        tan_half = float(np.tan(np.deg2rad(self.fov) * 0.5))
        p = (pixel * 2.0 - res) * (tan_half / res[1])
        d = fr.normalize(
            jnp.stack([p[..., 0], -p[..., 1], -jnp.ones_like(p[..., 0])], axis=-1)
        )
        o = jnp.zeros_like(d)
        w = jnp.ones(p.shape[:-1], dtype=jnp.float32)
        return o, d, w
