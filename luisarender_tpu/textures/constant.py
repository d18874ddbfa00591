"""Constant-value texture.

TPU-native equivalent of /root/reference/src/textures/constant.cpp (folds to a
pipeline constant slot there; here a row in the constant-texture table).
"""

from __future__ import annotations

import numpy as np

from ..core.fetch import fetch_rows
from ..scene.node import SceneNodeTag
from ..scene.registry import register
from .base import Texture


@register(SceneNodeTag.TEXTURE, "constant", "Constant")
class ConstantTexture(Texture):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        v = desc.float_list("v", [1.0])
        if len(v) > 4:
            raise ValueError("constant texture accepts at most 4 channels")
        self._channels = max(len(v), 1)
        rgba = list(v) + [0.0] * (4 - len(v))
        if len(v) == 1:  # broadcast single scalar to rgb, like float3(v)
            rgba = [v[0], v[0], v[0], 0.0]
            self._channels = 3
        self.value = np.asarray(rgba, dtype=np.float32)

    @property
    def channels(self):
        return self._channels

    def evaluate_static(self):
        return self.value

    def compile(self, compiler) -> int:
        return compiler.register_texture_row(ConstantTexture, {"value": self.value})

    @staticmethod
    def evaluate_rows(ctx, index, it):
        rows = ctx.arrays["textures"]["constant"]["value"]  # (n, 4)
        # one-hot MXU fetch: a plain rows[index] gather costs ~1.9 ms per
        # 1M indices on v5e (the 3 such gathers were 42% of the bounce)
        return fetch_rows(rows, index)
