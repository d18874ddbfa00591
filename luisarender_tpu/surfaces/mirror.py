"""Mirror surface: Schlick-Fresnel microfacet reflection.

TPU-native equivalent of /root/reference/src/surfaces/mirror.cpp:67-100
(Kd reflectance as F0, GGX with remapped roughness; the reference's alpha
clamp at 1e-4 makes "smooth" mirrors near-delta but finite, so one code path
covers both smooth and rough).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import frame as fr
from ..core import microfacet as mf
from ..scene.node import SceneNodeTag
from ..scene.registry import register
from ..textures.base import (
    NULL_HANDLE,
    compile_tex_param,
    evaluate_handles,
    evaluate_param,
    spectral_param,
)
from .base import (
    EVENT_REFLECT,
    PROPERTY_REFLECTIVE,
    Surface,
    oriented_frame,
    validate_sides,
)


def _resolve_alpha(params, ctx, it):
    rough = evaluate_param(ctx, params, "roughness", it, default=(0.0,) * 4)
    r = rough[..., :2]
    # scalar roughness textures broadcast to isotropic alpha
    iso = (params["roughness_channels"] < 1.5)[..., None]
    r = jnp.where(iso, rough[..., :1], r)
    remap = (params["remap_roughness"] > 0.5)[..., None]
    return jnp.where(remap, mf.roughness_to_alpha(r), jnp.maximum(r, 1e-4))


@register(SceneNodeTag.SURFACE, "mirror", "Mirror")
class MirrorSurface(Surface):
    properties = PROPERTY_REFLECTIVE

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.kd = scene.load_texture(desc.node("Kd"))
        self.roughness = scene.load_texture(desc.node("roughness"))
        self.remap_roughness = desc.bool("remap_roughness", True)

    def compile(self, compiler) -> dict:
        row = self.compile_common(compiler)
        compile_tex_param(compiler, self.kd, row, "kd")
        compile_tex_param(compiler, self.roughness, row, "roughness")
        row["roughness_channels"] = np.float32(
            self.roughness.channels if self.roughness else 1
        )
        row["remap_roughness"] = np.float32(1.0 if self.remap_roughness else 0.0)
        return row

    @staticmethod
    def _eval_local(params, ctx, it, swl, wo_l, wi_l):
        f0 = spectral_param(
            ctx, params, "kd", it, swl, "albedo", default=(1.0, 1.0, 1.0, 0.0)
        )
        alpha = _resolve_alpha(params, ctx, it)
        wh = fr.normalize(wo_l + wi_l)
        same = fr.same_hemisphere(wo_l, wi_l)
        cos_o = fr.abs_cos_theta(wo_l)
        cos_i = fr.abs_cos_theta(wi_l)
        d = mf.ggx_d(wh, alpha)
        g = mf.ggx_g(wo_l, wi_l, alpha)
        fres = mf.fresnel_schlick(fr.dot(wi_l, wh), f0)
        denom = jnp.maximum(4.0 * cos_o, 1e-8)
        f = fres * (d * g / denom)[..., None]  # includes |cos_i| (cancelled)
        pdf = mf.ggx_pdf(wo_l, wh, alpha) / jnp.maximum(
            4.0 * jnp.abs(fr.dot(wo_l, wh)), 1e-8
        )
        valid = same & (cos_o > 1e-6) & (cos_i > 1e-6)
        return jnp.where(valid[..., None], f, 0.0), jnp.where(valid, pdf, 0.0)

    @staticmethod
    def evaluate(params, ctx, it, swl, wo, wi):
        frame = oriented_frame(params, ctx, it, wo)
        wo_l = fr.to_local(frame, wo)
        wi_l = fr.to_local(frame, wi)
        f, pdf = MirrorSurface._eval_local(params, ctx, it, swl, wo_l, wi_l)
        f, pdf = validate_sides(it, frame, wo, wi, f, pdf)
        return {"f": f, "pdf": pdf}

    @staticmethod
    def sample(params, ctx, it, swl, wo, u_lobe, u):
        frame = oriented_frame(params, ctx, it, wo)
        wo_l = fr.to_local(frame, wo)
        alpha = _resolve_alpha(params, ctx, it)
        wh = mf.ggx_sample_wh(wo_l, u, alpha)
        wi_l = fr.reflect(wo_l, wh)
        f, pdf = MirrorSurface._eval_local(params, ctx, it, swl, wo_l, wi_l)
        wi = fr.to_world(frame, wi_l)
        f, pdf = validate_sides(it, frame, wo, wi, f, pdf)
        return {
            "f": f,
            "pdf": pdf,
            "wi": wi,
            "event": jnp.full(pdf.shape, EVENT_REFLECT, jnp.int32),
            "eta": jnp.ones_like(pdf),
        }

    @staticmethod
    def albedo(params, ctx, it, swl):
        return spectral_param(
            ctx, params, "kd", it, swl, "albedo", default=(1.0, 1.0, 1.0, 0.0)
        )

    @staticmethod
    def roughness(params, ctx, it):
        return mf.alpha_to_roughness(_resolve_alpha(params, ctx, it))
