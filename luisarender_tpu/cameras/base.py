"""Camera interface with filter-importance-sampled ray generation.

TPU-native equivalent of /root/reference/src/base/camera.h:52-99 /
camera.cpp:150-253: per-camera film/filter/transform, spp and output path,
shutter span with a piecewise-linear weight curve (motion-blur buckets), and
`generate_rays` = filter-sampled pixel offset -> subclass camera-space ray ->
camera-to-world transform. Batched: pixel_xy is (..., 2) int32.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import frame as fr
from ..core.types import make_ray
from ..scene.node import SceneNodeDesc, SceneNodeTag
from ..scene.scene import SceneNode


class Camera(SceneNode):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        film_desc = desc.node("film")
        if film_desc is None:
            raise ValueError(f"camera '{desc.identifier}' has no film")
        self.film = scene.load_film(film_desc)
        filter_desc = desc.node("filter")
        if filter_desc is None:
            filter_desc = SceneNodeDesc(
                identifier="$default_filter", tag=SceneNodeTag.FILTER, impl_type="box"
            )
        self.filter = scene.load_filter(filter_desc)
        self.transform = scene.load_transform(desc.node("transform"))
        self.spp = desc.int("spp", 1024)
        self.file = desc.string("file", "render.exr")
        # shutter span + weights (camera.h:91-99, camera.cpp:150-204)
        span = desc.float2("shutter_span", (0.0, 0.0))
        self.shutter_span = (float(span[0]), float(span[1]))
        self.shutter_samples = desc.int("shutter_samples", 0)
        # near/far clip planes at camera-space depth (camera.h:121-159
        # ClipPlaneCameraWrapper): `clip` = (near, far); a single float means
        # (near, +inf). Converted per-ray to parametric t by dividing by the
        # camera-space depth rate dot(d, -z).
        clip = desc.float2("clip", None)
        if clip is None:
            clip_f = desc.float("clip", None)
            if clip_f is None:
                clip_f = desc.float("clip_plane", None)
            clip = None if clip_f is None else (float(clip_f), 1e10)
        if clip is not None:
            lo, hi = sorted(
                (max(float(clip[0]), 0.0), min(float(clip[1]), 1e10))
            )
            self.clip_plane = (lo, hi)
        else:
            self.clip_plane = None

    @property
    def requires_lens_sampling(self) -> bool:
        return False

    def ray_cone(self):
        """(width0, spread): world-space ray-cone diameter at the origin and
        its growth per unit distance, covering one pixel. Drives mip LOD
        selection (textures/image.py) via Interaction.footprint — texture
        level of detail with ray cones (the reference declares but stubs
        mip LOD, textures/image.cpp:166,187-197). Subclasses override;
        (0, 0) disables LOD tracking."""
        return 0.0, 0.0

    def camera_to_world(self, time=0.0) -> np.ndarray:
        if self.transform is None:
            return np.eye(4)
        return self.transform.matrix(time)

    # --- device-side ---
    def _generate_ray_in_camera_space(self, pixel, u_lens, time):
        """pixel: (..., 2) float continuous pixel coords. Returns
        (origin, direction, weight) in camera space."""
        raise NotImplementedError

    def generate_rays(self, pixel_xy, u_filter, u_lens, time=0.0):
        """Returns (ray, pixel_f, weight). Mirrors camera.cpp:210-224."""
        offset, filter_weight = self.filter.sample(u_filter)
        pixel = pixel_xy.astype(jnp.float32) + 0.5 + offset
        o_c, d_c, weight = self._generate_ray_in_camera_space(pixel, u_lens, time)
        c2w = np.asarray(self.camera_to_world(float(time)), dtype=np.float32)

        def rot(v):
            # unrolled 3x3: tiny matmuls must stay off the MXU (see
            # core/colorspace._apply_mat3 for why)
            x, y, z = v[..., 0], v[..., 1], v[..., 2]
            return jnp.stack(
                [
                    c2w[0, 0] * x + c2w[0, 1] * y + c2w[0, 2] * z,
                    c2w[1, 0] * x + c2w[1, 1] * y + c2w[1, 2] * z,
                    c2w[2, 0] * x + c2w[2, 1] * y + c2w[2, 2] * z,
                ],
                axis=-1,
            )

        o = rot(o_c) + jnp.asarray(c2w[:3, 3])
        d = fr.normalize(rot(d_c))
        if self.clip_plane is not None:
            # depth -> ray parameter: rays leave the camera along -z in
            # camera space; normalize d_c first since fr.normalize above
            # applies to the rotated copy
            dz = -d_c[..., 2] / jnp.maximum(fr.length(d_c), 1e-12)
            inv = 1.0 / jnp.maximum(dz, 1e-6)
            return (
                make_ray(
                    o,
                    d,
                    t_min=self.clip_plane[0] * inv,
                    t_max=self.clip_plane[1] * inv,
                ),
                pixel,
                weight * filter_weight,
            )
        return make_ray(o, d), pixel, weight * filter_weight

    def shutter_weights(self, n_buckets: int):
        """Stratified shutter times + weights; trivial when span is empty."""
        t0, t1 = self.shutter_span
        if t1 <= t0 or n_buckets <= 1:
            return [t0], [1.0]
        times = np.linspace(t0, t1, n_buckets)
        w = np.ones(n_buckets) / n_buckets
        return list(times), list(w)
