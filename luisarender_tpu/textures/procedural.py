"""Procedural textures: checkerboard, swizzle, scale/multiply.

TPU-native equivalents of /root/reference/src/textures/{checkerboard,
swizzle}.cpp. Child-texture nesting is evaluated through
`evaluate_handles` with a bounded recursion depth (base.py MAX_NEST):
scene-static dispatch unrolls one extra level of every texture type present;
beyond that, children fall back to constants (documented limitation; the
reference's closure nesting is unbounded but real scenes are shallow).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..scene.node import SceneNodeTag
from ..scene.registry import register
from ..texturemappings.impls import apply_mapping
from .base import NULL_HANDLE, Texture, evaluate_handles


@register(SceneNodeTag.TEXTURE, "checkerboard", "Checkerboard")
class CheckerboardTexture(Texture):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.on = scene.load_texture(desc.node("on"))
        self.off = scene.load_texture(desc.node("off"))
        self.uv_scale = desc.float2("uv_scale", (1.0, 1.0))
        self.mapping = scene.load_texture_mapping(desc.node("mapping"))

    @property
    def channels(self):
        return max(
            self.on.channels if self.on else 4,
            self.off.channels if self.off else 4,
        )

    def compile(self, compiler) -> int:
        m_params = (
            self.mapping.params()
            if self.mapping is not None
            else np.asarray([1, 1, 0, 0], np.float32)
        )
        return compiler.register_texture_row(
            CheckerboardTexture,
            {
                "on": np.int32(self.on.compile(compiler) if self.on else NULL_HANDLE),
                "off": np.int32(
                    self.off.compile(compiler) if self.off else NULL_HANDLE
                ),
                "uv_scale": np.asarray(self.uv_scale, np.float32),
                "mapping_type": np.int32(
                    self.mapping.type_id if self.mapping else 0
                ),
                "mapping_params": m_params,
            },
        )

    @staticmethod
    def evaluate_rows(ctx, index, it, depth=0):
        rows = ctx.arrays["textures"]["checkerboard"]
        r = {k: v[index] for k, v in rows.items()}
        uv = apply_mapping(r["mapping_type"], r["mapping_params"], it)
        uv = uv * r["uv_scale"]
        cell = (jnp.floor(uv[..., 0]) + jnp.floor(uv[..., 1])).astype(jnp.int32) % 2
        on = evaluate_handles(
            ctx, r["on"], it, default=(1.0, 1.0, 1.0, 1.0), depth=depth + 1
        )
        off = evaluate_handles(
            ctx, r["off"], it, default=(0.0, 0.0, 0.0, 1.0), depth=depth + 1
        )
        return jnp.where((cell == 0)[..., None], on, off)


_SWIZZLE_CODES = {"x": 0, "y": 1, "z": 2, "w": 3, "r": 0, "g": 1, "b": 2, "a": 3}


@register(SceneNodeTag.TEXTURE, "swizzle", "Swizzle")
class SwizzleTexture(Texture):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        base = desc.node("base")
        if base is None:
            raise ValueError("swizzle texture requires 'base'")
        self.base_tex = scene.load_texture(base)
        sw = desc.string("swizzle", "xyzw").lower()
        if not 1 <= len(sw) <= 4 or any(c not in _SWIZZLE_CODES for c in sw):
            raise ValueError(f"invalid swizzle '{sw}'")
        self._channels = len(sw)
        codes = [_SWIZZLE_CODES[c] for c in sw] + [3] * (4 - len(sw))
        self.codes = np.asarray(codes, np.int32)

    @property
    def channels(self):
        return self._channels

    def compile(self, compiler) -> int:
        return compiler.register_texture_row(
            SwizzleTexture,
            {
                "base": np.int32(self.base_tex.compile(compiler)),
                "codes": self.codes,
            },
        )

    @staticmethod
    def evaluate_rows(ctx, index, it, depth=0):
        rows = ctx.arrays["textures"]["swizzle"]
        r = {k: v[index] for k, v in rows.items()}
        base = evaluate_handles(
            ctx, r["base"], it, default=(0.0, 0.0, 0.0, 0.0), depth=depth + 1
        )
        return jnp.take_along_axis(base, r["codes"], axis=-1)


@register(SceneNodeTag.TEXTURE, "scale", "Scale", "multiply", "Multiply")
class ScaleTexture(Texture):
    """base * scale (textures/... scale combinator used by converted scenes)."""

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        base = desc.node("base")
        if base is None:
            raise ValueError("scale texture requires 'base'")
        self.base_tex = scene.load_texture(base)
        s = desc.float_list("scale", [1.0])
        if len(s) == 1:
            s = s * 4
        self.s = np.asarray((list(s) + [1.0] * 4)[:4], np.float32)

    @property
    def channels(self):
        return self.base_tex.channels

    def compile(self, compiler) -> int:
        return compiler.register_texture_row(
            ScaleTexture,
            {"base": np.int32(self.base_tex.compile(compiler)), "scale": self.s},
        )

    @staticmethod
    def evaluate_rows(ctx, index, it, depth=0):
        rows = ctx.arrays["textures"]["scale"]
        r = {k: v[index] for k, v in rows.items()}
        base = evaluate_handles(
            ctx, r["base"], it, default=(1.0, 1.0, 1.0, 1.0), depth=depth + 1
        )
        return base * r["scale"]
