"""Layered surface: a dielectric coating over an arbitrary inner surface.

TPU-native counterpart of /root/reference/src/surfaces/layered.cpp (510 LoC,
PBRT-v4's stochastic layered BSDF with an internal HG medium and stochastic
TIR walk). Deviation (documented): instead of the unbounded stochastic walk,
this implements the deterministic two-lobe layered approximation —

    f = f_coat(GGX, Fresnel eta)  +  T_in * f_inner * T_out * A(medium)

with T_in/T_out the directional Fresnel transmittances of the coat,
A = exp(-sigma_t * thickness * (1/cos_i + 1/cos_o)) the interior absorption,
and the FULL geometric series of coat/inner interreflections folded into the
inner lobe in closed form (internal average Fresnel reflectance x inner
spectral albedo x round-trip absorption) — the expectation of the
reference's stochastic TIR walk, traded for zero estimator noise; the
residual approximation is that interreflections use hemisphere-averaged
rather than directional reflectances. The inner surface is monomorphized
per class like `mix` — any surface can be coated.
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
)
from .base import EVENT_REFLECT, PROPERTY_REFLECTIVE, Surface
from .mirror import _resolve_alpha

_MONO_CACHE: dict = {}


def _monomorphized(inner_cls):
    if inner_cls in _MONO_CACHE:
        return _MONO_CACHE[inner_cls]

    class LayeredMono(Surface):
        properties = PROPERTY_REFLECTIVE | inner_cls.properties
        inner = inner_cls
        impl_names = (f"layered<{inner_cls.__name__}>",)

        @staticmethod
        def _split(params):
            inner = {
                k[len("i_"):]: v for k, v in params.items() if k.startswith("i_")
            }
            return inner

        @staticmethod
        def _coat(params, ctx, it, swl, wo_l, wi_l):
            """Coat reflection lobe (f WITHOUT cos) + its pdf + Fresnel Ts."""
            alpha = _resolve_alpha(params, ctx, it)
            eta = evaluate_param(ctx, params, "eta", it, default=(1.5,) * 4)[
                ..., 0
            ]
            wh = fr.normalize(wo_l + wi_l)
            wh = jnp.where(fr.cos_theta(wh)[..., None] < 0, -wh, wh)
            d = mf.ggx_d(wh, alpha)
            g = mf.ggx_g(wo_l, wi_l, alpha)
            f_h = mf.fresnel_dielectric(
                fr.dot(wo_l, wh), jnp.ones_like(eta), eta
            )
            cos_o = fr.abs_cos_theta(wo_l)
            cos_i = fr.abs_cos_theta(wi_l)
            f = f_h * d * g / jnp.maximum(4.0 * cos_o * cos_i, 1e-7)
            pdf = mf.ggx_pdf(wo_l, wh, alpha) / jnp.maximum(
                4.0 * jnp.abs(fr.dot(wo_l, wh)), 1e-7
            )
            return f, pdf, eta

        @staticmethod
        def _transmittances(params, ctx, it, swl, wo_l, wi_l, eta, a_inner):
            cos_o = fr.abs_cos_theta(wo_l)
            cos_i = fr.abs_cos_theta(wi_l)
            t_o = 1.0 - mf.fresnel_dielectric(cos_o, jnp.ones_like(eta), eta)
            t_i = 1.0 - mf.fresnel_dielectric(cos_i, jnp.ones_like(eta), eta)
            sig = evaluate_param(ctx, params, "sigma_a", it, default=(0.0,) * 4
            )
            thick = evaluate_param(ctx, params, "thickness", it, default=(1.0,) * 4
            )[..., 0]
            sigma = ctx.spectrum.decode_unbounded(sig[..., :3], swl) * thick[
                ..., None
            ]
            a = jnp.exp(
                -(1.0 / jnp.maximum(cos_i, 1e-4) + 1.0 / jnp.maximum(cos_o, 1e-4))[
                    ..., None
                ]
                * sigma
            )
            # multiple-interreflection energy factor, closed form. With
            # R_int the average internal Fresnel reflectance (reciprocity:
            # R_int = 1 - (1 - F_avg)/eta^2), the true multiply-scattered
            # exit fraction of inner-scattered energy is
            #   a (1-R_int) / (1 - R_int a A^2),
            # while the naive directional product T_in f_inner T_out
            # hemisphere-integrates to a (1 - F_avg) = a eta^2 (1-R_int)
            # (it ignores the eta^2 solid-angle compression of internal
            # directions). The correction ratio is therefore
            #   comp = 1 / (eta^2 (1 - R_int a A^2)),
            # which reproduces the white-furnace limit exactly (a=1, A=1 ->
            # everything that enters eventually exits) — the closed-form
            # expectation of the reference's stochastic TIR walk
            # (layered.cpp:14-110), traded for zero estimator noise.
            # the Egan-Hilgeman fit IS the internal diffuse reflectance
            # Fdr(eta) (~0.597 at eta=1.5)
            r_int = mf.fresnel_dielectric_integral(eta)
            eta2 = jnp.maximum(eta * eta, 1.0)
            comp = 1.0 / (
                eta2[..., None]
                * jnp.maximum(1.0 - r_int[..., None] * a_inner * a * a, 0.05)
            )
            return (t_o * t_i)[..., None] * a * comp

        @staticmethod
        def evaluate(params, ctx, it, swl, wo, wi):
            inner_p = LayeredMono._split(params)
            e_in = LayeredMono.inner.evaluate(inner_p, ctx, it, swl, wo, wi)
            frame = it.shading_frame()
            wo_l = fr.to_local(frame, wo)
            wi_l = fr.to_local(frame, wi)
            same = fr.same_hemisphere(wo_l, wi_l)
            f_c, pdf_c, eta = LayeredMono._coat(params, ctx, it, swl, wo_l, wi_l)
            a_inner = LayeredMono.inner.albedo(inner_p, ctx, it, swl)
            trans = LayeredMono._transmittances(
                params, ctx, it, swl, wo_l, wi_l, eta, a_inner
            )
            cos_i = fr.abs_cos_theta(wi_l)
            f_coat = jnp.where(same, f_c * cos_i, 0.0)[..., None]
            f = f_coat + e_in["f"] * trans
            w = LayeredMono._coat_weight(params, ctx, it, swl, wo_l, eta)
            pdf = jnp.where(same, w * pdf_c, 0.0) + (1.0 - w) * e_in["pdf"]
            return {"f": f, "pdf": pdf}

        @staticmethod
        def _coat_weight(params, ctx, it, swl, wo_l, eta):
            cos_o = fr.abs_cos_theta(wo_l)
            f_o = mf.fresnel_dielectric(cos_o, jnp.ones_like(eta), eta)
            return jnp.clip(f_o, 0.05, 0.95)

        @staticmethod
        def sample(params, ctx, it, swl, wo, u_lobe, u):
            inner_p = LayeredMono._split(params)
            frame = it.shading_frame()
            wo_l = fr.to_local(frame, wo)
            alpha = _resolve_alpha(params, ctx, it)
            eta = evaluate_param(ctx, params, "eta", it, default=(1.5,) * 4)[
                ..., 0
            ]
            w = LayeredMono._coat_weight(params, ctx, it, swl, wo_l, eta)
            pick_coat = u_lobe < w
            u_rem = jnp.where(
                pick_coat,
                u_lobe / jnp.maximum(w, 1e-6),
                (u_lobe - w) / jnp.maximum(1.0 - w, 1e-6),
            )
            wh = mf.ggx_sample_wh(wo_l, u, alpha)
            wh = jnp.where(wo_l[..., 2:3] < 0, -wh, wh)
            wi_coat_l = fr.reflect(wo_l, wh)
            wi_coat = fr.to_world(frame, wi_coat_l)
            s_in = LayeredMono.inner.sample(
                inner_p, ctx, it, swl, wo, u_rem, u
            )
            wi = jnp.where(pick_coat[..., None], wi_coat, s_in["wi"])
            ev = LayeredMono.evaluate(params, ctx, it, swl, wo, wi)
            return {
                "f": ev["f"],
                "pdf": ev["pdf"],
                "wi": wi,
                "event": jnp.where(
                    pick_coat, EVENT_REFLECT, s_in["event"]
                ).astype(jnp.int32),
                "eta": jnp.where(pick_coat, jnp.ones_like(eta), s_in["eta"]),
            }

        @staticmethod
        def albedo(params, ctx, it, swl):
            return LayeredMono.inner.albedo(
                LayeredMono._split(params), ctx, it, swl
            )

        @staticmethod
        def roughness(params, ctx, it):
            return mf.alpha_to_roughness(_resolve_alpha(params, ctx, it))

    LayeredMono.__name__ = f"Layered_{inner_cls.__name__}"
    _MONO_CACHE[inner_cls] = LayeredMono
    return LayeredMono


@register(SceneNodeTag.SURFACE, "layered", "Layered", "coated", "Coated")
class LayeredSurface(Surface):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        inner = desc.node("base") or desc.node("bottom") or desc.node("inner")
        if inner is None:
            raise ValueError("layered surface requires a 'base' surface")
        self.inner = scene.load_surface(inner)
        self.roughness_tex = scene.load_texture(desc.node("roughness"))
        self.eta = scene.load_texture(desc.node("eta"))
        self.sigma_a = scene.load_texture(desc.node("sigma_a"))
        self.thickness = scene.load_texture(desc.node("thickness"))
        self.remap_roughness = desc.bool("remap_roughness", True)
        self.properties = PROPERTY_REFLECTIVE | type(self.inner).properties

    @property
    def monomorphized(self):
        inner_cls = getattr(self.inner, "monomorphized", None) or type(self.inner)
        return _monomorphized(inner_cls)

    def compile(self, compiler) -> dict:
        row = self.compile_common(compiler)
        for name, tex in (
            ("roughness", self.roughness_tex),
            ("eta", self.eta),
            ("sigma_a", self.sigma_a),
            ("thickness", self.thickness),
        ):
            compile_tex_param(compiler, tex, row, name)
        row["roughness_channels"] = np.float32(
            self.roughness_tex.channels if self.roughness_tex else 1
        )
        row["remap_roughness"] = np.float32(1.0 if self.remap_roughness else 0.0)
        for k, v in self.inner.compile(compiler).items():
            row[f"i_{k}"] = v
        return row
