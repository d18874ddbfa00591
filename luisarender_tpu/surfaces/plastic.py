"""Plastic surface: Fresnel-coated diffuse substrate.

TPU-native equivalent of /root/reference/src/surfaces/plastic.cpp:64-238:
GGX dielectric coat over a Lambertian substrate with internal absorption
a = exp(-(1/ci + 1/co) * sigma_a * thickness), lobe selection by
substrate_weight = kd_lum(1-Fo) / (kd_lum(1-Fo) + Fo), combined pdf
lerp(pdf_coat, pdf_diffuse, substrate_weight). Implicitly two-sided via the
sign-flip of the local frame (plastic.cpp:145-149).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import frame as fr
from ..core import microfacet as mf
from ..core import sampling
from ..core.colorspace import cie_y_of_srgb
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
    shading_frame,
    validate_sides,
)
from .mirror import _resolve_alpha


@register(SceneNodeTag.SURFACE, "plastic", "Plastic", "substrate", "Substrate")
class PlasticSurface(Surface):
    properties = PROPERTY_REFLECTIVE

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.kd = scene.load_texture(desc.node("Kd"))
        self.roughness = scene.load_texture(desc.node("roughness"))
        self.sigma_a = scene.load_texture(desc.node("sigma_a"))
        self.eta = scene.load_texture(desc.node("eta"))
        self.thickness = scene.load_texture(desc.node("thickness"))
        self.remap_roughness = desc.bool("remap_roughness", True)

    def compile(self, compiler) -> dict:
        row = self.compile_common(compiler)
        for name, tex in (
            ("kd", self.kd),
            ("roughness", self.roughness),
            ("sigma_a", self.sigma_a),
            ("eta", self.eta),
            ("thickness", self.thickness),
        ):
            compile_tex_param(compiler, tex, row, name)
        row["roughness_channels"] = np.float32(
            self.roughness.channels if self.roughness else 1
        )
        row["remap_roughness"] = np.float32(1.0 if self.remap_roughness else 0.0)
        return row

    # --- device closure ---

    @staticmethod
    def _ctx(params, ctx, it, swl):
        kd_rgba = evaluate_param(ctx, params, "kd", it, default=(0.5,) * 3 + (0.0,))
        kd = spectral_param(
            ctx, params, "kd", it, swl, "albedo", default=(0.5,) * 3 + (0.0,)
        )
        kd_lum = cie_y_of_srgb(kd_rgba[..., :3])
        eta = evaluate_param(ctx, params, "eta", it, default=(1.5,) * 4)[..., 0]
        sig = evaluate_param(ctx, params, "sigma_a", it, default=(0.0,) * 4)
        thick = evaluate_param(ctx, params, "thickness", it, default=(1.0,) * 4)[
            ..., 0
        ]
        sigma = spectral_param(
            ctx, params, "sigma_a", it, swl, "unbounded", default=(0.0,) * 4
        ) * thick[..., None]
        alpha = _resolve_alpha(params, ctx, it)
        return kd, kd_lum, eta, sigma, alpha

    @staticmethod
    def _substrate_weight(f_o, kd_lum):
        w = kd_lum * (1.0 - f_o)
        return jnp.where(w <= 0.0, 0.0, w / jnp.maximum(w + f_o, 1e-8))

    @staticmethod
    def _eval_local(kd, eta, sigma, alpha, kd_lum, wo_l, wi_l, swl):
        cos_o = fr.abs_cos_theta(wo_l)
        cos_i = fr.abs_cos_theta(wi_l)
        same = fr.same_hemisphere(wo_l, wi_l)
        # coat
        wh = fr.normalize(wo_l + wi_l)
        d = mf.ggx_d(wh, alpha)
        g = mf.ggx_g(wo_l, wi_l, alpha)
        f_h = mf.fresnel_dielectric(fr.dot(wi_l, wh), jnp.ones_like(eta), eta)
        f_coat = (f_h * d * g / jnp.maximum(4.0 * cos_o * cos_i, 1e-8))
        pdf_coat = mf.ggx_pdf(wo_l, wh, alpha) / jnp.maximum(
            4.0 * jnp.abs(fr.dot(wo_l, wh)), 1e-8
        )
        # substrate
        f_i = mf.fresnel_dielectric(cos_i, jnp.ones_like(eta), eta)
        f_o = mf.fresnel_dielectric(cos_o, jnp.ones_like(eta), eta)
        a = jnp.exp(
            -(1.0 / jnp.maximum(cos_i, 1e-6) + 1.0 / jnp.maximum(cos_o, 1e-6))[
                ..., None
            ]
            * sigma
        )
        f_diffuse = (
            ((1.0 - f_i) * (1.0 - f_o) / jnp.maximum(eta * eta, 1e-8))[..., None]
            * a
            * kd
            * sampling.INV_PI
        )
        pdf_diffuse = sampling.cosine_hemisphere_pdf(cos_i)
        w = PlasticSurface._substrate_weight(f_o, kd_lum)
        f = (f_coat[..., None] + f_diffuse) * cos_i[..., None]
        pdf = (1.0 - w) * pdf_coat + w * pdf_diffuse
        f = jnp.where(same[..., None], f, 0.0)
        pdf = jnp.where(same, pdf, 0.0)
        return f, pdf, w, f_o

    @staticmethod
    def _flip(wo_l, v):
        sign = jnp.where(
            (wo_l[..., 2:3] < 0.0),
            jnp.asarray([1.0, 1.0, -1.0], jnp.float32),
            jnp.asarray([1.0, 1.0, 1.0], jnp.float32),
        )
        return v * sign

    @staticmethod
    def evaluate(params, ctx, it, swl, wo, wi):
        frame = shading_frame(params, ctx, it)
        wo_l0 = fr.to_local(frame, wo)
        wo_l = PlasticSurface._flip(wo_l0, wo_l0)
        wi_l = PlasticSurface._flip(wo_l0, fr.to_local(frame, wi))
        kd, kd_lum, eta, sigma, alpha = PlasticSurface._ctx(params, ctx, it, swl)
        f, pdf, _, _ = PlasticSurface._eval_local(
            kd, eta, sigma, alpha, kd_lum, wo_l, wi_l, swl
        )
        f, pdf = validate_sides(it, frame, wo, wi, f, pdf)
        return {"f": f, "pdf": pdf}

    @staticmethod
    def sample(params, ctx, it, swl, wo, u_lobe, u):
        frame = shading_frame(params, ctx, it)
        wo_l0 = fr.to_local(frame, wo)
        wo_l = PlasticSurface._flip(wo_l0, wo_l0)
        kd, kd_lum, eta, sigma, alpha = PlasticSurface._ctx(params, ctx, it, swl)
        cos_o = fr.abs_cos_theta(wo_l)
        f_o = mf.fresnel_dielectric(cos_o, jnp.ones_like(eta), eta)
        w = PlasticSurface._substrate_weight(f_o, kd_lum)
        pick_diffuse = u_lobe < w
        wi_diffuse = sampling.sample_cosine_hemisphere(u)
        wh = mf.ggx_sample_wh(wo_l, u, alpha)
        wi_coat = fr.reflect(wo_l, wh)
        wi_l = jnp.where(pick_diffuse[..., None], wi_diffuse, wi_coat)
        f, pdf, _, _ = PlasticSurface._eval_local(
            kd, eta, sigma, alpha, kd_lum, wo_l, wi_l, swl
        )
        wi = fr.to_world(frame, PlasticSurface._flip(wo_l0, wi_l))
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
        kd = evaluate_param(ctx, params, "kd", it, default=(0.5,) * 3 + (0.0,))
        return ctx.spectrum.decode_albedo(kd[..., :3], swl)

    @staticmethod
    def roughness(params, ctx, it):
        return mf.alpha_to_roughness(_resolve_alpha(params, ctx, it))
