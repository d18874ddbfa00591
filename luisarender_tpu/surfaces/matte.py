"""Matte surface: Lambertian / Oren-Nayar diffuse reflection.

TPU-native equivalent of /root/reference/src/surfaces/matte.cpp:16-110
(Kd texture + sigma roughness in degrees; sigma == 0 -> pure Lambert).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import frame as fr
from ..core import sampling
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


@register(SceneNodeTag.SURFACE, "matte", "Matte")
class MatteSurface(Surface):
    properties = PROPERTY_REFLECTIVE

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.kd = scene.load_texture(desc.node("Kd"))
        self.sigma = scene.load_texture(desc.node("sigma"))

    def compile(self, compiler) -> dict:
        row = self.compile_common(compiler)
        compile_tex_param(compiler, self.kd, row, "kd")
        compile_tex_param(compiler, self.sigma, row, "sigma")
        return row

    # --- device closure ---

    @staticmethod
    def _oren_nayar_ab(sigma_deg):
        sigma = sigma_deg * (np.pi / 180.0)
        s2 = sigma * sigma
        a = 1.0 - s2 / (2.0 * (s2 + 0.33))
        b = 0.45 * s2 / (s2 + 0.09)
        return a, b

    @staticmethod
    def _f_pdf(params, ctx, it, swl, wo_local, wi_local):
        """Local-frame Oren-Nayar f (with |cos wi|) and cosine pdf."""
        albedo = spectral_param(
            ctx, params, "kd", it, swl, "albedo", default=(1.0, 1.0, 1.0, 0.0)
        )
        sigma = evaluate_param(ctx, params, "sigma", it, default=(0.0,) * 4)[..., 0]
        a, b = MatteSurface._oren_nayar_ab(sigma)

        cos_o = fr.abs_cos_theta(wo_local)
        cos_i = fr.abs_cos_theta(wi_local)
        sin_o = fr.sin_theta(wo_local)
        sin_i = fr.sin_theta(wi_local)
        # max(0, cos(phi_i - phi_o))
        cos_d_phi = fr.cos_phi(wi_local) * fr.cos_phi(wo_local) + fr.sin_phi(
            wi_local
        ) * fr.sin_phi(wo_local)
        max_cos = jnp.where((sin_i > 1e-4) & (sin_o > 1e-4), jnp.maximum(cos_d_phi, 0.0), 0.0)
        sin_alpha = jnp.where(cos_o > cos_i, sin_i, sin_o)
        tan_beta = jnp.where(
            cos_o > cos_i,
            sin_o / jnp.maximum(cos_o, 1e-6),
            sin_i / jnp.maximum(cos_i, 1e-6),
        )
        on = a + b * max_cos * sin_alpha * tan_beta
        same_side = fr.same_hemisphere(wo_local, wi_local)
        f = albedo * (sampling.INV_PI * on * cos_i)[..., None]
        pdf = sampling.cosine_hemisphere_pdf(cos_i)
        f = jnp.where(same_side[..., None], f, 0.0)
        pdf = jnp.where(same_side, pdf, 0.0)
        return f, pdf

    @staticmethod
    def evaluate(params, ctx, it, swl, wo, wi):
        frame = oriented_frame(params, ctx, it, wo)
        wo_l = fr.to_local(frame, wo)
        wi_l = fr.to_local(frame, wi)
        f, pdf = MatteSurface._f_pdf(params, ctx, it, swl, wo_l, wi_l)
        f, pdf = validate_sides(it, frame, wo, wi, f, pdf)
        return {"f": f, "pdf": pdf}

    @staticmethod
    def sample(params, ctx, it, swl, wo, u_lobe, u):
        frame = oriented_frame(params, ctx, it, wo)
        wo_l = fr.to_local(frame, wo)
        wi_l = sampling.sample_cosine_hemisphere(u)
        wi_l = jnp.where((wo_l[..., 2:3] < 0.0), wi_l * jnp.asarray([1.0, 1.0, -1.0]), wi_l)
        f, pdf = MatteSurface._f_pdf(params, ctx, it, swl, wo_l, wi_l)
        wi = fr.to_world(frame, wi_l)
        f, pdf = validate_sides(it, frame, wo, wi, f, pdf)
        return {
            "f": f,
            "pdf": pdf,
            "wi": wi,
            "event": jnp.full(pdf.shape, EVENT_REFLECT, jnp.int32),
            "eta": jnp.ones(pdf.shape, jnp.float32),
        }

    @staticmethod
    def albedo(params, ctx, it, swl):
        return spectral_param(
            ctx, params, "kd", it, swl, "albedo", default=(1.0, 1.0, 1.0, 0.0)
        )

    @staticmethod
    def roughness(params, ctx, it):
        return jnp.ones(it.p.shape[:-1] + (2,), jnp.float32)
