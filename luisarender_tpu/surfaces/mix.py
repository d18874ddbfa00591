"""Mix surface: blend of two surfaces by a ratio texture.

TPU-native equivalent of /root/reference/src/surfaces/mix.cpp (219 LoC).
Polymorphic nesting is resolved by *compile-time monomorphization*: each
(child_a_class, child_b_class) combination becomes its own generated surface
type whose rows store the children's parameter rows inline — the XLA analogue
of the reference instantiating a templated closure per child pair. This keeps
device dispatch flat (no nested tag switches at trace time).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..scene.node import SceneNodeTag
from ..scene.registry import register
from ..textures.base import (
    NULL_HANDLE,
    compile_tex_param,
    evaluate_handles,
    evaluate_param,
)
from .base import Surface

_MONO_CACHE: dict = {}


def _monomorphized(cls_a, cls_b):
    key = (cls_a, cls_b)
    if key in _MONO_CACHE:
        return _MONO_CACHE[key]

    class MixMono(Surface):
        properties = cls_a.properties | cls_b.properties
        child_a = cls_a
        child_b = cls_b
        impl_names = (f"mix<{cls_a.__name__},{cls_b.__name__}>",)

        @staticmethod
        def _split(params):
            a = {
                k[len("a_"):]: v for k, v in params.items() if k.startswith("a_")
            }
            b = {
                k[len("b_"):]: v for k, v in params.items() if k.startswith("b_")
            }
            return a, b

        @staticmethod
        def _ratio(params, ctx, it):
            r = evaluate_param(ctx, params, "ratio", it, default=(0.5,) * 4)
            return jnp.clip(r[..., 0], 0.0, 1.0)

        @staticmethod
        def evaluate(params, ctx, it, swl, wo, wi):
            pa, pb = MixMono._split(params)
            ra = MixMono._ratio(params, ctx, it)
            ea = MixMono.child_a.evaluate(pa, ctx, it, swl, wo, wi)
            eb = MixMono.child_b.evaluate(pb, ctx, it, swl, wo, wi)
            return {
                "f": ra[..., None] * ea["f"] + (1.0 - ra)[..., None] * eb["f"],
                "pdf": ra * ea["pdf"] + (1.0 - ra) * eb["pdf"],
            }

        @staticmethod
        def sample(params, ctx, it, swl, wo, u_lobe, u):
            pa, pb = MixMono._split(params)
            ra = MixMono._ratio(params, ctx, it)
            pick_a = u_lobe < ra
            u_remap = jnp.where(
                pick_a,
                u_lobe / jnp.maximum(ra, 1e-8),
                (u_lobe - ra) / jnp.maximum(1.0 - ra, 1e-8),
            )
            sa = MixMono.child_a.sample(pa, ctx, it, swl, wo, u_remap, u)
            sb = MixMono.child_b.sample(pb, ctx, it, swl, wo, u_remap, u)
            wi = jnp.where(pick_a[..., None], sa["wi"], sb["wi"])
            # combined estimator: evaluate the other lobe at the sampled wi
            ea = MixMono.child_a.evaluate(pa, ctx, it, swl, wo, wi)
            eb = MixMono.child_b.evaluate(pb, ctx, it, swl, wo, wi)
            f = ra[..., None] * ea["f"] + (1.0 - ra)[..., None] * eb["f"]
            pdf = ra * ea["pdf"] + (1.0 - ra) * eb["pdf"]
            return {
                "f": f,
                "pdf": pdf,
                "wi": wi,
                "event": jnp.where(pick_a, sa["event"], sb["event"]),
                "eta": jnp.where(pick_a, sa["eta"], sb["eta"]),
            }

        @staticmethod
        def albedo(params, ctx, it, swl):
            pa, pb = MixMono._split(params)
            ra = MixMono._ratio(params, ctx, it)
            return (
                ra[..., None] * MixMono.child_a.albedo(pa, ctx, it, swl)
                + (1.0 - ra)[..., None] * MixMono.child_b.albedo(pb, ctx, it, swl)
            )

        @staticmethod
        def roughness(params, ctx, it):
            pa, pb = MixMono._split(params)
            ra = MixMono._ratio(params, ctx, it)
            return (
                ra[..., None] * MixMono.child_a.roughness(pa, ctx, it)
                + (1.0 - ra)[..., None] * MixMono.child_b.roughness(pb, ctx, it)
            )

    MixMono.__name__ = f"Mix_{cls_a.__name__}_{cls_b.__name__}"
    _MONO_CACHE[key] = MixMono
    return MixMono


@register(SceneNodeTag.SURFACE, "mix", "Mix")
class MixSurface(Surface):
    """Host node; compiles through the monomorphized type for its children."""

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        a = desc.node("a")
        b = desc.node("b")
        if a is None or b is None:
            raise ValueError("mix surface requires 'a' and 'b' child surfaces")
        self.a = scene.load_surface(a)
        self.b = scene.load_surface(b)
        self.ratio = scene.load_texture(desc.node("ratio"))
        self.properties = type(self.a).properties | type(self.b).properties

    @property
    def monomorphized(self):
        # nested mixes resolve to their own monomorphized classes
        cls_a = getattr(self.a, "monomorphized", None) or type(self.a)
        cls_b = getattr(self.b, "monomorphized", None) or type(self.b)
        return _monomorphized(cls_a, cls_b)

    def compile(self, compiler) -> dict:
        row_a = self.a.compile(compiler)
        row_b = self.b.compile(compiler)
        row = self.compile_common(compiler)
        for k, v in row_a.items():
            row[f"a_{k}"] = v
        for k, v in row_b.items():
            row[f"b_{k}"] = v
        compile_tex_param(compiler, self.ratio, row, "ratio")
        return row
