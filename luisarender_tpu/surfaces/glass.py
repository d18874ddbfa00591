"""Glass surface: rough dielectric with reflection + transmission.

TPU-native equivalent of /root/reference/src/surfaces/glass.cpp:47-271:
MicrofacetReflection + MicrofacetTransmission, Fresnel-weighted lobe choice
(`_refl_prob` with Kr/Kt luminance ratio, glass.cpp:161-166,254), enter/exit
events, named glasses with wavelength-dependent IOR. Named-glass data here is
evaluated from the public Sellmeier dispersion equations (Schott catalog /
handbook constants) instead of the reference's 3-wavelength tables; a Cauchy
model A + B/lambda^2 is fitted at the Fraunhofer C/d/F lines for device-side
dispersion (util/spec.h:19-20 pattern).
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
    EVENT_ENTER,
    EVENT_EXIT,
    EVENT_REFLECT,
    PROPERTY_REFLECTIVE,
    PROPERTY_TRANSMISSIVE,
    Surface,
    oriented_frame,
    validate_sides,
)
from .mirror import _resolve_alpha

# Fraunhofer lines (nm): C (red), d (yellow), F (blue) — util/spec.h:19-20
# uses 656.27/587.56/486.13.
FRAUNHOFER_C = 656.27
FRAUNHOFER_D = 587.56
FRAUNHOFER_F = 486.13

# Sellmeier coefficients (B1 B2 B3 C1 C2 C3, lambda in micrometres).
_SELLMEIER = {
    "bk7": (1.03961212, 0.231792344, 1.01046945,
            0.00600069867, 0.0200179144, 103.560653),
    "baf10": (1.5851495, 0.143559385, 1.08521269,
              0.00926681282, 0.0424489805, 105.613573),
    "fk51a": (0.971247817, 0.216901417, 0.904651666,
              0.00472301995, 0.0153575612, 168.68133),
    "lasf9": (2.00029547, 0.298926886, 1.80691843,
              0.0121426017, 0.0538736236, 156.530829),
    "sf5": (1.52481889, 0.187085527, 1.42729015,
            0.011254756, 0.0588995392, 129.141675),
    "sf10": (1.62153902, 0.256287842, 1.64447552,
             0.0122241457, 0.0595736775, 147.468793),
    "sf11": (1.73759695, 0.313747346, 1.89878101,
             0.013188707, 0.0623068142, 155.23629),
    "f2": (1.34533359, 0.209073176, 0.937357162,
           0.00997743871, 0.0470450767, 111.886764),
    "fused_silica": (0.6961663, 0.4079426, 0.8974794,
                     0.0684043**2, 0.1162414**2, 9.896161**2),
    "sapphire": (1.4313493, 0.65054713, 5.3414021,
                 0.0726631**2, 0.1193242**2, 18.028251**2),
}
# Fixed-index materials (negligible dispersion modeled).
_FIXED_IOR = {"water": 1.333, "ice": 1.31, "air": 1.0003, "vacuum": 1.0}
# Diamond via a two-term Sellmeier (Peter 1923).
_DIAMOND = (0.3306, 4.3356, 0.0, 0.175**2, 0.106**2, 1.0)


def glass_ior(name: str, lam_nm: float) -> float:
    """n(lambda) for a named glass; lam in nm."""
    key = name.lower()
    lam_um = lam_nm * 1e-3
    l2 = lam_um * lam_um
    if key in _FIXED_IOR:
        return _FIXED_IOR[key]
    if key == "diamond":
        b1, b2, _, c1, c2, _ = _DIAMOND
        return float(np.sqrt(1.0 + b1 * l2 / (l2 - c1) + b2 * l2 / (l2 - c2)))
    if key in _SELLMEIER:
        b1, b2, b3, c1, c2, c3 = _SELLMEIER[key]
        n2 = 1.0 + b1 * l2 / (l2 - c1) + b2 * l2 / (l2 - c2) + b3 * l2 / (l2 - c3)
        return float(np.sqrt(max(n2, 1.0)))
    raise KeyError(
        f"unknown glass '{name}'; available: "
        f"{sorted(list(_SELLMEIER) + list(_FIXED_IOR) + ['diamond'])}"
    )


def fit_cauchy(n_c: float, n_d: float, n_f: float):
    """Least-squares fit n(lambda) ~ A + B/lambda^2 (um) through the C/d/F
    lines (the reference solves a 3x3 system for a 3-term Cauchy; two terms
    capture the same behavior to ~1e-4 over the visible range)."""
    lams = np.asarray([FRAUNHOFER_C, FRAUNHOFER_D, FRAUNHOFER_F]) * 1e-3
    a = np.stack([np.ones(3), 1.0 / lams**2], axis=-1)
    coef, *_ = np.linalg.lstsq(a, np.asarray([n_c, n_d, n_f]), rcond=None)
    return float(coef[0]), float(coef[1])


def cauchy_eta(cauchy_a, cauchy_b, lam_nm):
    lam_um2 = (lam_nm * 1e-3) ** 2
    return cauchy_a + cauchy_b / lam_um2


@register(SceneNodeTag.SURFACE, "glass", "Glass")
class GlassSurface(Surface):
    properties = PROPERTY_REFLECTIVE | PROPERTY_TRANSMISSIVE

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.kr = scene.load_texture(desc.node("Kr"))
        self.kt = scene.load_texture(desc.node("Kt"))
        self.roughness = scene.load_texture(desc.node("roughness"))
        self.remap_roughness = desc.bool("remap_roughness", True)
        material = desc.string("material", None)
        self.eta_texture = None
        if material is not None:
            n_c = glass_ior(material, FRAUNHOFER_C)
            n_d = glass_ior(material, FRAUNHOFER_D)
            n_f = glass_ior(material, FRAUNHOFER_F)
            self.cauchy = fit_cauchy(n_c, n_d, n_f)
        else:
            eta_node = desc.node("eta")
            if eta_node is not None:
                self.eta_texture = scene.load_texture(eta_node)
                v = self.eta_texture.evaluate_static()
                if v is not None and self.eta_texture.channels >= 3:
                    # 3-channel eta = values at the Fraunhofer lines
                    self.cauchy = fit_cauchy(float(v[0]), float(v[1]), float(v[2]))
                elif v is not None:
                    self.cauchy = (float(v[0]), 0.0)
                else:
                    self.cauchy = (1.5, 0.0)  # spatially-varying: device eval
            else:
                self.cauchy = fit_cauchy(
                    glass_ior("bk7", FRAUNHOFER_C),
                    glass_ior("bk7", FRAUNHOFER_D),
                    glass_ior("bk7", FRAUNHOFER_F),
                )

    @property
    def is_dispersive(self):
        return abs(self.cauchy[1]) > 1e-9

    def compile(self, compiler) -> dict:
        row = self.compile_common(compiler)
        compile_tex_param(compiler, self.kr, row, "kr")
        compile_tex_param(compiler, self.kt, row, "kt")
        compile_tex_param(compiler, self.roughness, row, "roughness")
        row["roughness_channels"] = np.float32(
            self.roughness.channels if self.roughness else 1
        )
        row["remap_roughness"] = np.float32(1.0 if self.remap_roughness else 0.0)
        row["cauchy_a"] = np.float32(self.cauchy[0])
        row["cauchy_b"] = np.float32(self.cauchy[1])
        return row

    # --- device closure ---

    @staticmethod
    def _eta_t(params, swl):
        """IOR at the sampled wavelengths' hero channel. Dispersive glasses
        terminate secondary wavelengths in the integrator."""
        hero_lam = swl.lam[..., 0]
        return cauchy_eta(params["cauchy_a"], params["cauchy_b"], hero_lam)

    @staticmethod
    def is_dispersive_rows(params, ctx):
        return jnp.abs(params["cauchy_b"]) > 1e-9

    @staticmethod
    def eta_value(params, ctx, it, swl):
        return GlassSurface._eta_t(params, swl)

    @staticmethod
    def _textures(params, ctx, it, swl):
        kr = evaluate_param(ctx, params, "kr", it, default=(1.0,) * 3 + (0.0,))
        kt = evaluate_param(ctx, params, "kt", it, default=(1.0,) * 3 + (0.0,))
        kr_s = spectral_param(
            ctx, params, "kr", it, swl, "albedo", default=(1.0,) * 3 + (0.0,)
        )
        kt_s = spectral_param(
            ctx, params, "kt", it, swl, "albedo", default=(1.0,) * 3 + (0.0,)
        )
        from ..core.colorspace import cie_y_of_srgb

        kr_lum = cie_y_of_srgb(kr[..., :3])
        kt_lum = cie_y_of_srgb(kt[..., :3])
        kr_ratio = jnp.where(
            kr_lum <= 0.0, 0.0, kr_lum / jnp.maximum(kr_lum + kt_lum, 1e-8)
        )
        return kr_s, kt_s, kr_ratio

    @staticmethod
    def _refl_prob(kr_ratio, f_wo):
        r = kr_ratio * f_wo
        t = (1.0 - kr_ratio) * (1.0 - f_wo)
        return jnp.where(r <= 0.0, 0.0, r / jnp.maximum(r + t, 1e-8))

    @staticmethod
    def _eval_local(params, ctx, it, swl, wo_l, wi_l):
        """Returns (f, pdf) with |cos_i| folded into f (glass.cpp:193)."""
        kr_s, kt_s, kr_ratio = GlassSurface._textures(params, ctx, it, swl)
        alpha = _resolve_alpha(params, ctx, it)
        eta_t = GlassSurface._eta_t(params, swl)
        cos_o = fr.cos_theta(wo_l)
        cos_i = fr.cos_theta(wi_l)
        same = fr.same_hemisphere(wo_l, wi_l)
        f_wo = mf.fresnel_dielectric(cos_o, jnp.ones_like(eta_t), eta_t)
        ratio = GlassSurface._refl_prob(kr_ratio, f_wo)

        # reflection lobe
        wh_r = fr.normalize(wo_l + wi_l)
        wh_r = jnp.where(fr.cos_theta(wh_r)[..., None] < 0.0, -wh_r, wh_r)
        d_r = mf.ggx_d(wh_r, alpha)
        g_r = mf.ggx_g(wo_l, wi_l, alpha)
        f_h = mf.fresnel_dielectric(fr.dot(wo_l, wh_r), jnp.ones_like(eta_t), eta_t)
        f_refl = kr_s * (
            f_h * d_r * g_r / jnp.maximum(4.0 * jnp.abs(cos_o), 1e-8)
        )[..., None]
        pdf_refl = (
            mf.ggx_pdf(wo_l, wh_r, alpha)
            / jnp.maximum(4.0 * jnp.abs(fr.dot(wo_l, wh_r)), 1e-8)
            * ratio
        )

        # transmission lobe (scattering.cpp:322-345, radiance transport)
        eta_rel = jnp.where(cos_o > 0.0, eta_t, 1.0 / eta_t)
        wh_t = fr.normalize(wo_l + wi_l * eta_rel[..., None])
        wh_t = jnp.where(fr.cos_theta(wh_t)[..., None] < 0.0, -wh_t, wh_t)
        dot_o = fr.dot(wo_l, wh_t)
        dot_i = fr.dot(wi_l, wh_t)
        trans_ok = (~same) & (dot_o * dot_i < 0.0) & (jnp.abs(cos_o) > 1e-6) & (
            jnp.abs(cos_i) > 1e-6
        )
        g_t = mf.ggx_g(wo_l, wi_l, alpha)
        d_t = mf.ggx_d(wh_t, alpha)
        f_ht = mf.fresnel_dielectric(dot_o, jnp.ones_like(eta_t), eta_t)
        denom = dot_o + eta_rel * dot_i
        f_trans_scalar = (
            (1.0 - f_ht)
            * d_t
            * g_t
            * jnp.abs(dot_i * dot_o)
            / jnp.maximum(jnp.abs(cos_i * cos_o) * denom * denom, 1e-10)
        )
        f_trans = kt_s * f_trans_scalar[..., None]
        dwh_dwi = (eta_rel / jnp.maximum(jnp.abs(denom), 1e-8)) ** 2 * jnp.abs(dot_i)
        pdf_trans = mf.ggx_pdf(wo_l, wh_t, alpha) * dwh_dwi * (1.0 - ratio)

        abs_ci = jnp.abs(cos_i)
        f = jnp.where(
            same[..., None], f_refl * abs_ci[..., None],
            jnp.where(trans_ok[..., None], f_trans * abs_ci[..., None], 0.0),
        )
        pdf = jnp.where(same, pdf_refl, jnp.where(trans_ok, pdf_trans, 0.0))
        return f, pdf, ratio, alpha, eta_t

    @staticmethod
    def evaluate(params, ctx, it, swl, wo, wi):
        frame = oriented_frame(params, ctx, it, wo)
        wo_l = fr.to_local(frame, wo)
        wi_l = fr.to_local(frame, wi)
        f, pdf, *_ = GlassSurface._eval_local(params, ctx, it, swl, wo_l, wi_l)
        return {"f": f, "pdf": pdf}

    @staticmethod
    def sample(params, ctx, it, swl, wo, u_lobe, u):
        frame = oriented_frame(params, ctx, it, wo)
        wo_l = fr.to_local(frame, wo)
        alpha = _resolve_alpha(params, ctx, it)
        eta_t = GlassSurface._eta_t(params, swl)
        _, _, kr_ratio = GlassSurface._textures(params, ctx, it, swl)
        f_wo = mf.fresnel_dielectric(
            fr.cos_theta(wo_l), jnp.ones_like(eta_t), eta_t
        )
        ratio = GlassSurface._refl_prob(kr_ratio, f_wo)
        pick_refl = u_lobe < ratio

        wh = mf.ggx_sample_wh(wo_l, u, alpha)
        wh = jnp.where((fr.cos_theta(wo_l) < 0.0)[..., None], -wh, wh)
        wi_refl = fr.reflect(wo_l, wh)
        eta_rel_in = jnp.where(fr.cos_theta(wo_l) > 0.0, 1.0 / eta_t, eta_t)
        ok_t, wi_trans = fr.refract(
            wo_l, jnp.where(fr.dot(wo_l, wh)[..., None] < 0, -wh, wh), eta_rel_in
        )
        wi_l = jnp.where(pick_refl[..., None], wi_refl, wi_trans)
        f, pdf, *_ = GlassSurface._eval_local(params, ctx, it, swl, wo_l, wi_l)
        valid = jnp.where(pick_refl, True, ok_t)
        pdf = jnp.where(valid, pdf, 0.0)
        wi = fr.to_world(frame, wi_l)
        event = jnp.where(
            pick_refl,
            EVENT_REFLECT,
            jnp.where(fr.cos_theta(wo_l) > 0.0, EVENT_ENTER, EVENT_EXIT),
        ).astype(jnp.int32)
        return {
            "f": f,
            "pdf": pdf,
            "wi": wi,
            "event": event,
            "eta": eta_t,
        }

    @staticmethod
    def albedo(params, ctx, it, swl):
        return spectral_param(
            ctx, params, "kr", it, swl, "albedo", default=(1.0,) * 3 + (0.0,)
        )

    @staticmethod
    def roughness(params, ctx, it):
        return mf.alpha_to_roughness(_resolve_alpha(params, ctx, it))
