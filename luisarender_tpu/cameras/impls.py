"""Thin-lens and orthographic cameras.

TPU-native equivalents of /root/reference/src/cameras/{thin_lens,ortho}.cpp:
- thin lens (thin_lens.cpp:70-100): physical units — focal length in mm,
  f-number aperture (lens radius = 0.5 f/N), 36x24 mm sensor with the
  projected pixel size chosen by orientation, focus distance from the
  `focus` target, concentric-disk lens sampling;
- ortho (ortho.cpp): parallel projection with `zoom` scale.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import frame as fr
from ..core.sampling import sample_uniform_disk_concentric
from ..scene.node import SceneNodeTag
from ..scene.registry import register
from .base import Camera


@register(SceneNodeTag.CAMERA, "thinlens", "ThinLens", "thin_lens")
class ThinLensCamera(Camera):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.aperture = desc.float("aperture", 2.0)  # f-number
        self.focal_length = desc.float("focal_length", 35.0)  # mm
        focus = desc.float3("focus_position", None)
        if focus is not None:
            origin = np.asarray(self.camera_to_world()[:3, 3])
            self.focus_distance = float(
                np.linalg.norm(np.asarray(focus) - origin)
            )
        else:
            self.focus_distance = desc.float("focus_distance", 1.0)

    @property
    def requires_lens_sampling(self):
        return True

    def ray_cone(self):
        # pixel footprint on the focus plane, projected back: spread by the
        # sensor pixel angle (aperture blur is ignored — it only widens the
        # footprint, and LOD under-estimation merely sharpens)
        w, h = self.film.resolution
        sensor_h = 0.024 if w >= h else 0.036
        f = self.focal_length * 1e-3
        return 0.0, (sensor_h / h) / f

    def _generate_ray_in_camera_space(self, pixel, u_lens, time):
        w, h = self.film.resolution
        # 35mm full-frame sensor: projected size by orientation
        # (thin_lens.cpp: 36x24mm sensor assumption)
        if w >= h:
            sensor_w, sensor_h = 0.036, 0.036 * h / w
            if sensor_h > 0.024:
                sensor_h, sensor_w = 0.024, 0.024 * w / h
        else:
            sensor_h, sensor_w = 0.036, 0.036 * w / h
            if sensor_w > 0.024:
                sensor_w, sensor_h = 0.024, 0.024 * h / w
        f = self.focal_length * 1e-3
        lens_radius = 0.5 * f / self.aperture
        # image plane distance from the lens equation
        zf = self.focus_distance
        zi = 1.0 / jnp.maximum(1.0 / f - 1.0 / zf, 1e-8)

        res = jnp.asarray(self.film.resolution, dtype=jnp.float32)
        ndc = pixel / res  # [0,1]^2
        # point on the (virtual) sensor, flipped through the lens center
        p_sensor = jnp.stack(
            [
                (0.5 - ndc[..., 0]) * sensor_w,
                (ndc[..., 1] - 0.5) * sensor_h,
            ],
            axis=-1,
        )
        # focus-plane point
        p_focus = jnp.stack(
            [
                -p_sensor[..., 0] * zf / zi,
                p_sensor[..., 1] * zf / zi,
                -jnp.broadcast_to(jnp.float32(zf), ndc.shape[:-1]),
            ],
            axis=-1,
        )
        # lens sample
        d = sample_uniform_disk_concentric(u_lens) * lens_radius
        o = jnp.concatenate([d, jnp.zeros_like(d[..., :1])], axis=-1)
        direction = fr.normalize(p_focus - o)
        weight = jnp.ones(ndc.shape[:-1], jnp.float32)
        return o, direction, weight


@register(SceneNodeTag.CAMERA, "ortho", "Ortho", "orthographic", "Orthographic")
class OrthographicCamera(Camera):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.zoom = desc.float("zoom", 0.0)

    def ray_cone(self):
        # parallel rays: constant one-pixel width, zero spread
        scale = float(2.0 ** -self.zoom)
        return 2.0 * scale / float(self.film.resolution[1]), 0.0

    def _generate_ray_in_camera_space(self, pixel, u_lens, time):
        res = jnp.asarray(self.film.resolution, dtype=jnp.float32)
        scale = float(2.0 ** -self.zoom)
        p = (pixel * 2.0 - res) / res[1] * scale
        o = jnp.stack(
            [p[..., 0], -p[..., 1], jnp.zeros_like(p[..., 0])], axis=-1
        )
        d = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, -1.0], jnp.float32), o.shape
        )
        return o, d, jnp.ones(p.shape[:-1], jnp.float32)
