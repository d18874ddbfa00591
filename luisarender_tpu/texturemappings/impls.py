"""Texture mappings: uv (scale/offset) and spherical.

TPU-native equivalent of /root/reference/src/texturemappings/{uv,spherical}.cpp
and base/texture_mapping.h:22-28 (Coord2D). A mapping turns an Interaction
into texture coordinates; textures reference a mapping node and apply it
before lookup.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..scene.node import SceneNodeTag
from ..scene.registry import register
from ..scene.scene import SceneNode


class TextureMapping(SceneNode):
    def map_uv(self, it):
        raise NotImplementedError

    def params(self) -> np.ndarray:
        """Packed (4,) float params for per-row storage: scale.xy, offset.xy."""
        return np.asarray([1.0, 1.0, 0.0, 0.0], np.float32)

    type_id: int = 0  # 0 = uv, 1 = spherical


@register(SceneNodeTag.TEXTURE_MAPPING, "uv", "UV")
class UVMapping(TextureMapping):
    type_id = 0

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.uv_scale = desc.float2("uv_scale", (1.0, 1.0))
        self.uv_offset = desc.float2("uv_offset", (0.0, 0.0))

    def params(self):
        return np.asarray(
            [self.uv_scale[0], self.uv_scale[1], self.uv_offset[0], self.uv_offset[1]],
            np.float32,
        )


@register(SceneNodeTag.TEXTURE_MAPPING, "spherical", "Spherical")
class SphericalMapping(TextureMapping):
    type_id = 1

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.uv_scale = desc.float2("uv_scale", (1.0, 1.0))
        self.uv_offset = desc.float2("uv_offset", (0.0, 0.0))

    def params(self):
        return np.asarray(
            [self.uv_scale[0], self.uv_scale[1], self.uv_offset[0], self.uv_offset[1]],
            np.float32,
        )


def apply_mapping(mapping_type, mapping_params, it):
    """Batched: mapping_type (...,) int32, params (..., 4) -> uv (..., 2)."""
    # spherical: direction from local origin (approximated by world position
    # direction — matches the reference's object-space assumption for
    # unit-sphere-like shapes)
    p = it.p
    theta = jnp.arccos(jnp.clip(p[..., 1] / jnp.maximum(
        jnp.sqrt(jnp.sum(p * p, axis=-1)), 1e-8), -1.0, 1.0))
    phi = jnp.arctan2(p[..., 2], p[..., 0])
    sph_uv = jnp.stack(
        [(phi / (2.0 * np.pi)) % 1.0, theta / np.pi], axis=-1
    )
    base_uv = jnp.where((mapping_type == 1)[..., None], sph_uv, it.uv)
    return base_uv * mapping_params[..., 0:2] + mapping_params[..., 2:4]
