"""Metal surface: rough conductor with named spectral eta/k.

TPU-native equivalent of /root/reference/src/surfaces/metal.cpp:41-315. The
reference ships dense spectral n/k tables (metal_ior.inl.h); here we store
n/k sampled at the three sRGB peak wavelengths (602.8/539.3/445.8 nm,
util/spec.h:22-23) from the public Johnson & Christy / Rakic optical-constant
datasets, which reproduces the visible appearance; spectral (hero) mode
interpolates between the samples.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import frame as fr
from ..core import microfacet as mf
from ..core.spectrum import SRGB_PEAK_WAVELENGTHS
from ..scene.node import SceneNodeTag
from ..scene.registry import register
from ..textures.base import NULL_HANDLE, evaluate_handles
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
        if eta_name is not None:
            self.n3, self.k3 = metal_eta_k(eta_name)
        else:
            n = desc.float3("n", (0.2, 0.92, 1.1))
            k = desc.float3("k", (3.9, 2.45, 2.14))
            self.n3 = np.asarray(n, np.float32)
            self.k3 = np.asarray(k, np.float32)

    def compile(self, compiler) -> dict:
        row = self.compile_common(compiler)
        row["roughness"] = np.int32(
            self.roughness.compile(compiler) if self.roughness else NULL_HANDLE
        )
        row["roughness_channels"] = np.float32(
            self.roughness.channels if self.roughness else 1
        )
        row["remap_roughness"] = np.float32(1.0 if self.remap_roughness else 0.0)
        row["kd"] = np.int32(self.kd.compile(compiler) if self.kd else NULL_HANDLE)
        row["eta_n"] = self.n3
        row["eta_k"] = self.k3
        return row

    @staticmethod
    def _fresnel(params, ctx, swl, cos_i):
        n, k = eta_k_at_wavelengths(params["eta_n"], params["eta_k"], swl.lam)
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
        kd = evaluate_handles(ctx, params["kd"], it, default=(1.0,) * 3 + (0.0,))
        tint = ctx.spectrum.decode_albedo(kd[..., :3], swl)
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
