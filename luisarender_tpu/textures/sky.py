"""Nishita physical-sky texture.

TPU-native equivalent of /root/reference/src/textures/nishita_sky.cpp (183
LoC + precompute): the sky is precomputed on the host into a lat-long
radiance image (utils/sky_precompute.py) and served through the shared
texture atlas (the reference uploads it as a texture the same way,
tests/test_sky.cpp:15-36)."""

from __future__ import annotations

import numpy as np

from ..scene.node import SceneNodeTag
from ..scene.registry import register
from ..utils.sky_precompute import precompute_sky
from .base import Texture
from .image import ImageTexture


@register(SceneNodeTag.TEXTURE, "nishitasky", "NishitaSky", "nishita_sky", "sky")
class NishitaSkyTexture(Texture):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        sun_dir = desc.float3("sun_direction", (0.0, 0.6, 0.8))
        self.sun_intensity = desc.float("sun_intensity", 20.0)
        self.altitude = desc.float("altitude", 100.0)
        res = desc.int2("resolution", (128, 256))
        self.image = precompute_sky(
            resolution=(int(res[0]), int(res[1])),
            sun_direction=tuple(sun_dir),
            sun_intensity=self.sun_intensity,
            altitude=self.altitude,
        )
        alpha = np.ones(self.image.shape[:2] + (1,), np.float32)
        self._rgba = np.ascontiguousarray(
            np.concatenate([self.image, alpha], axis=-1)
        )

    @property
    def channels(self):
        return 3

    def rasterize(self):
        """For spherical environments."""
        return self.image

    def compile(self, compiler) -> int:
        image_id = compiler.register_atlas_image(self._rgba)
        return compiler.register_texture_row(
            ImageTexture,
            {
                "image_id": np.int32(image_id),
                "uv_scale": np.asarray([1.0, 1.0], np.float32),
                "uv_offset": np.asarray([0.0, 0.0], np.float32),
                "wrap": np.int32(0),
                "scale": np.asarray([1.0, 1.0, 1.0, 1.0], np.float32),
                "mapping_type": np.int32(1),  # spherical
                "mapping_params": np.asarray([1, 1, 0, 0], np.float32),
            },
        )
