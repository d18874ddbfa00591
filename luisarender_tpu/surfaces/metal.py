"""Metal surface: rough conductor with named spectral eta/k.

TPU-native equivalent of /root/reference/src/surfaces/metal.cpp:41-315. The
reference ships dense spectral n/k tables (metal_ior.inl.h); here the noble
metals evaluate a Lorentz-Drude oscillator model (Rakic et al. 1998
parameters) directly at the sampled wavelengths — a closed-form dense
spectral curve with no tables, exact at every hero wavelength — and the
remaining named metals store n/k at the three sRGB peak wavelengths
(602.8/539.3/445.8 nm, util/spec.h:22-23) from the Johnson & Christy
dataset, interpolated in hero mode.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import frame as fr
from ..core import microfacet as mf
from ..core.spectrum import SRGB_PEAK_WAVELENGTHS
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
from .mirror import _resolve_alpha

# (n_r, n_g, n_b), (k_r, k_g, k_b) at the sRGB peak wavelengths.
# Approximate values from Johnson & Christy (noble metals) and Rakic (Al).
METAL_IOR = {
    "au": ((0.143, 0.375, 1.442), (3.170, 2.324, 1.796)),
    "ag": ((0.131, 0.125, 0.144), (3.880, 3.340, 2.560)),
    "cu": ((0.300, 0.870, 1.170), (3.220, 2.580, 2.360)),
    "al": ((1.290, 0.960, 0.617), (7.310, 6.390, 5.450)),
    "cr": ((3.190, 3.180, 2.750), (3.330, 3.330, 3.300)),
    "ni": ((1.920, 1.800, 1.650), (3.700, 3.300, 2.820)),
    "ti": ((2.540, 2.480, 2.300), (3.430, 3.350, 3.100)),
    "fe": ((2.900, 2.900, 2.600), (3.100, 3.000, 2.800)),
    "v": ((3.510, 3.660, 3.280), (2.970, 3.000, 3.250)),
    "li": ((0.220, 0.210, 0.230), (2.920, 2.560, 2.110)),
}
METAL_ALIASES = {
    "gold": "au", "silver": "ag", "copper": "cu", "aluminium": "al",
    "aluminum": "al", "chromium": "cr", "chrome": "cr", "nickel": "ni",
    "titanium": "ti", "iron": "fe", "vanadium": "v", "lithium": "li",
}

# Lorentz-Drude oscillator parameters (Rakic et al. 1998, Appl. Opt. 37),
# giving dense-spectrum n/k as a closed form instead of shipped tables
# (the reference vendors dense tables in surfaces/metal_ior.inl.h).
# Layout: plasma frequency wp [eV], then 6 oscillators (f, Gamma [eV],
# omega [eV]) with oscillator 0 the Drude (intraband) term at omega=0.
# Unused oscillator slots have f=0.
LD_OSC = 6
METAL_LD = {
    "au": {
        "wp": 9.03,
        "f": (0.760, 0.024, 0.010, 0.071, 0.601, 4.384),
        "g": (0.053, 0.241, 0.345, 0.870, 2.494, 2.214),
        "w": (0.000, 0.415, 0.830, 2.969, 4.304, 13.32),
    },
    "ag": {
        "wp": 9.01,
        "f": (0.845, 0.065, 0.124, 0.011, 0.840, 5.646),
        "g": (0.048, 3.886, 0.452, 0.065, 0.916, 2.419),
        "w": (0.000, 0.816, 4.481, 8.185, 9.083, 20.29),
    },
    "cu": {
        "wp": 10.83,
        "f": (0.575, 0.061, 0.104, 0.723, 0.638, 0.000),
        "g": (0.030, 0.378, 1.056, 3.213, 4.305, 1.000),
        "w": (0.000, 0.291, 2.957, 5.300, 11.18, 1.000),
    },
    "al": {
        "wp": 14.98,
        "f": (0.523, 0.227, 0.050, 0.166, 0.030, 0.000),
        "g": (0.047, 0.333, 0.312, 1.351, 3.382, 1.000),
        "w": (0.000, 0.162, 1.544, 1.808, 3.473, 1.000),
    },
}

EV_NM = 1239.84193  # photon energy [eV] * wavelength [nm]


def ld_eta_k(lam_nm, wp, f, g, w):
    """Lorentz-Drude n, k at wavelengths lam_nm (..., C).

    wp: (...,) or scalar; f/g/w: (..., LD_OSC). Unified form: every
    oscillator contributes f_j wp^2 / ((w_j^2 - w^2) - i w Gamma_j); the
    Drude term is oscillator 0 with w_0 = 0 (time convention e^{-iwt},
    Im eps >= 0)."""
    omega = EV_NM / jnp.maximum(lam_nm, 1e-3)  # (..., C) eV
    wp2 = (jnp.asarray(wp) ** 2)[..., None, None]  # (..., 1, 1)
    o = omega[..., None, :]  # (..., 1, C)
    a = (jnp.asarray(w) ** 2)[..., :, None] - o * o  # (..., J, C)
    b = o * jnp.asarray(g)[..., :, None]
    d = jnp.maximum(a * a + b * b, 1e-12)
    fj = jnp.asarray(f)[..., :, None]
    eps_re = 1.0 + jnp.sum(fj * wp2 * a / d, axis=-2)
    eps_im = jnp.sum(fj * wp2 * b / d, axis=-2)
    mag = jnp.sqrt(eps_re * eps_re + eps_im * eps_im)
    n = jnp.sqrt(jnp.maximum(0.5 * (mag + eps_re), 0.0))
    k = jnp.sqrt(jnp.maximum(0.5 * (mag - eps_re), 0.0))
    return n, k


def metal_eta_k(name: str):
    key = METAL_ALIASES.get(name.lower(), name.lower())
    if key not in METAL_IOR:
        raise KeyError(
            f"unknown metal '{name}'; available: "
            f"{sorted(list(METAL_IOR) + list(METAL_ALIASES))}"
        )
    n, k = METAL_IOR[key]
    return np.asarray(n, np.float32), np.asarray(k, np.float32)


def _interp3(lam, xs, ys):
    """Piecewise-linear through 3 ascending knots xs; ys is batched (..., 3)
    per-ray rows, lam is (..., C) — jnp.interp can't batch fp, so unroll."""
    lam_c = jnp.clip(lam, xs[0], xs[2])
    t_lo = (lam_c - xs[0]) / (xs[1] - xs[0])
    t_hi = (lam_c - xs[1]) / (xs[2] - xs[1])
    v_lo = ys[..., 0:1] * (1.0 - t_lo) + ys[..., 1:2] * t_lo
    v_hi = ys[..., 1:2] * (1.0 - t_hi) + ys[..., 2:3] * t_hi
    return jnp.where(lam_c <= xs[1], v_lo, v_hi)


def eta_k_at_wavelengths(n3, k3, lam):
    """Interpolate the 3-sample n/k curves to sampled wavelengths lam (..., C).
    Samples are at the sRGB peaks (stored R, G, B = descending nm)."""
    xs = tuple(SRGB_PEAK_WAVELENGTHS[::-1])  # ascending nm (B, G, R)
    n_asc = jnp.asarray(n3)[..., ::-1]
    k_asc = jnp.asarray(k3)[..., ::-1]
    return _interp3(lam, xs, n_asc), _interp3(lam, xs, k_asc)


@register(SceneNodeTag.SURFACE, "metal", "Metal")
class MetalSurface(Surface):
    properties = PROPERTY_REFLECTIVE

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.roughness = scene.load_texture(desc.node("roughness"))
        self.remap_roughness = desc.bool("remap_roughness", True)
        self.kd = scene.load_texture(desc.node("Kd"))
        eta_name = desc.string("eta", None) or desc.string("material", None)
        self.ld = None
        if eta_name is not None:
            self.n3, self.k3 = metal_eta_k(eta_name)
            key = METAL_ALIASES.get(eta_name.lower(), eta_name.lower())
            self.ld = METAL_LD.get(key)
        else:
            n = desc.float3("n", (0.2, 0.92, 1.1))
            k = desc.float3("k", (3.9, 2.45, 2.14))
            self.n3 = np.asarray(n, np.float32)
            self.k3 = np.asarray(k, np.float32)

    def compile(self, compiler) -> dict:
        row = self.compile_common(compiler)
        compile_tex_param(compiler, self.roughness, row, "roughness")
        row["roughness_channels"] = np.float32(
            self.roughness.channels if self.roughness else 1
        )
        row["remap_roughness"] = np.float32(1.0 if self.remap_roughness else 0.0)
        compile_tex_param(compiler, self.kd, row, "kd")
        row["eta_n"] = self.n3
        row["eta_k"] = self.k3
        ld = self.ld
        row["ld_valid"] = np.float32(0.0 if ld is None else 1.0)
        row["ld_wp"] = np.float32(ld["wp"] if ld else 1.0)
        row["ld_f"] = np.asarray(ld["f"] if ld else (0.0,) * LD_OSC, np.float32)
        row["ld_g"] = np.asarray(ld["g"] if ld else (1.0,) * LD_OSC, np.float32)
        row["ld_w"] = np.asarray(ld["w"] if ld else (1.0,) * LD_OSC, np.float32)
        return row

    @staticmethod
    def _fresnel(params, ctx, swl, cos_i):
        n, k = eta_k_at_wavelengths(params["eta_n"], params["eta_k"], swl.lam)
        n_ld, k_ld = ld_eta_k(
            swl.lam, params["ld_wp"], params["ld_f"], params["ld_g"],
            params["ld_w"],
        )
        use_ld = (params["ld_valid"] > 0.5)[..., None]
        n = jnp.where(use_ld, n_ld, n)
        k = jnp.where(use_ld, k_ld, k)
        return mf.fresnel_conductor(cos_i, n, k)

    @staticmethod
    def _eval_local(params, ctx, it, swl, wo_l, wi_l):
        alpha = _resolve_alpha(params, ctx, it)
        wh = fr.normalize(wo_l + wi_l)
        same = fr.same_hemisphere(wo_l, wi_l)
        cos_o = fr.abs_cos_theta(wo_l)
        cos_i = fr.abs_cos_theta(wi_l)
        d = mf.ggx_d(wh, alpha)
        g = mf.ggx_g(wo_l, wi_l, alpha)
        fres = MetalSurface._fresnel(params, ctx, swl, fr.dot(wi_l, wh))
        tint = spectral_param(
            ctx, params, "kd", it, swl, "albedo", default=(1.0,) * 3 + (0.0,)
        )
        f = tint * fres * (d * g / jnp.maximum(4.0 * cos_o, 1e-8))[..., None]
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
        f, pdf = MetalSurface._eval_local(params, ctx, it, swl, wo_l, wi_l)
        f, pdf = validate_sides(it, frame, wo, wi, f, pdf)
        return {"f": f, "pdf": pdf}

    @staticmethod
    def sample(params, ctx, it, swl, wo, u_lobe, u):
        frame = oriented_frame(params, ctx, it, wo)
        wo_l = fr.to_local(frame, wo)
        alpha = _resolve_alpha(params, ctx, it)
        wh = mf.ggx_sample_wh(wo_l, u, alpha)
        wi_l = fr.reflect(wo_l, wh)
        f, pdf = MetalSurface._eval_local(params, ctx, it, swl, wo_l, wi_l)
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
        fres = MetalSurface._fresnel(params, ctx, swl, jnp.ones(it.p.shape[:-1]))
        return fres

    @staticmethod
    def roughness(params, ctx, it):
        return mf.alpha_to_roughness(_resolve_alpha(params, ctx, it))
