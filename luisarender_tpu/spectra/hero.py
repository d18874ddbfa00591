"""Hero-wavelength spectral rendering.

TPU-native equivalent of /root/reference/src/spectra/hero.cpp:42-388:
- visible-wavelength importance sampling (sech^2 pdf around 538 nm,
  hero.cpp:355-367 — the standard PBRT-v4 visible sampling curve);
- hero rotation: C equally-spaced wavelengths wrapped into the visible range
  from one uniform draw (measure-preserving, so each channel keeps the
  visible pdf);
- RGB -> spectrum upsampling with the sigmoid-polynomial model via a
  device-resident coefficient LUT (core/rgb2spec.py generates what the
  reference ships as a 64^3 RGB2Spec table, uploaded there as 3 volumes,
  hero.cpp:369-388);
- spectral -> sRGB integration via the CIE fits (core/spectrum.py).

Dispersion support: integrators call swl.terminate_secondary() when a
dispersive closure is hit (mega_path.cpp:117-119 equivalent).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import cie, rgb2spec
from ..core.spectrum import SampledWavelengths, SpectrumModel, spectral_to_xyz
from ..core import colorspace
from ..scene.node import SceneNodeTag
from ..scene.registry import register
from .srgb import Spectrum

# Visible-wavelength importance sampling constants (PBRT-v4 SampleVisible).
_VIS_A = 0.0072
_VIS_B = 538.0


def sample_visible(u):
    """u in [0,1) -> lambda in nm, importance-sampled over the visible range."""
    return _VIS_B - 138.888889 * jnp.arctanh(0.85691062 - 1.82750197 * u)


def visible_pdf(lam):
    x = jnp.cosh(_VIS_A * (lam - _VIS_B))
    pdf = 0.0039398042 / (x * x)
    return jnp.where((lam >= cie.SAMPLE_MIN) & (lam <= cie.SAMPLE_MAX), pdf, 0.0)


# Illuminant normalization: k such that S=1 reflector under k*D65 has Y = 1.
_lam_grid = np.linspace(cie.VISIBLE_MIN, cie.VISIBLE_MAX, 471)
_d65 = np.asarray(cie.d65(_lam_grid))
_ybar = np.asarray(cie.cie_y(_lam_grid))
_ILLUM_NORM = float(
    cie.CIE_Y_INTEGRAL / np.trapezoid(_d65 * _ybar, _lam_grid)
)


class HeroWavelengthSpectrum(SpectrumModel):
    is_fixed = False

    def __init__(self, dimension: int = 4, lut_res: int = 24):
        self.dimension = dimension
        self._table = jnp.asarray(rgb2spec.lut(lut_res))
        self._res = lut_res

    def sample_wavelengths(self, u):
        """u: (..., 1) -> C rotated wavelengths.

        Rotation happens in the inverse-CDF domain (u_i = u0 + i/C mod 1, as
        in PBRT-v4 / hero.cpp): each lambda_i = F^-1(u_i) then has exactly
        the visible-sampling marginal, so pdf_i = visible_pdf(lambda_i)."""
        u0 = u[..., 0]
        c = self.dimension
        shifts = jnp.arange(c, dtype=jnp.float32) / c
        ui = (u0[..., None] + shifts) % 1.0
        ui = jnp.clip(ui, 1e-6, 1.0 - 1e-6)
        lam = sample_visible(ui)
        pdf = visible_pdf(lam)
        return SampledWavelengths(lam=lam, pdf=pdf)

    # --- RGB -> spectrum ---
    def _coeffs(self, rgb):
        """Trilinear LUT fetch of sigmoid coefficients; rgb (..., 3)."""
        res = self._res
        rgb = jnp.clip(rgb, 0.0, 1.0)
        k = jnp.argmax(rgb, axis=-1)
        z = jnp.max(rgb, axis=-1)
        safe_z = jnp.maximum(z, 1e-8)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        x = jnp.where(k == 0, g, r) / safe_z
        y = jnp.where(k == 2, g, b) / safe_z

        def axis(v):
            fv = jnp.clip(v * (res - 1), 0.0, res - 1.0)
            i0 = jnp.clip(jnp.floor(fv).astype(jnp.int32), 0, res - 2)
            return i0, fv - i0.astype(jnp.float32)

        zi, zf = axis(z)
        yi, yf = axis(y)
        xi, xf = axis(x)
        t = self._table  # (3, R, R, R, 3)

        def fetch(dz, dy, dx):
            return t[k, zi + dz, yi + dy, xi + dx]

        c00 = fetch(0, 0, 0) * (1 - xf[..., None]) + fetch(0, 0, 1) * xf[..., None]
        c01 = fetch(0, 1, 0) * (1 - xf[..., None]) + fetch(0, 1, 1) * xf[..., None]
        c10 = fetch(1, 0, 0) * (1 - xf[..., None]) + fetch(1, 0, 1) * xf[..., None]
        c11 = fetch(1, 1, 0) * (1 - xf[..., None]) + fetch(1, 1, 1) * xf[..., None]
        c0 = c00 * (1 - yf[..., None]) + c01 * yf[..., None]
        c1 = c10 * (1 - yf[..., None]) + c11 * yf[..., None]
        return c0 * (1 - zf[..., None]) + c1 * zf[..., None]

    # --- coefficient fast path (scene/compiler.py _hoist_spectral_coeffs):
    # constant textures pre-fit their sigmoid coefficients ONCE per pass on
    # the tiny per-instance tables, so per-ray decode is pure VPU math
    # instead of 8 LUT gathers per lane (measured dominant in the hero
    # general path, PERF.md). The reference gets the same effect by folding
    # constants into pipeline slots (textures/constant.cpp).
    def coeffs_albedo(self, rgb):
        return self._coeffs(rgb)

    def coeffs_unbounded(self, rgb):
        m = jnp.maximum(jnp.max(rgb, axis=-1), 1e-8)
        scale = jnp.where(m > 1.0, 2.0 * m, 1.0)
        return self._coeffs(rgb / scale[..., None]), scale

    def coeffs_illuminant(self, rgb):
        return self.coeffs_unbounded(jnp.maximum(rgb, 0.0))

    def decode_albedo_coeffs(self, coeffs, swl):
        return rgb2spec.eval_spectrum(coeffs, swl.lam)

    def decode_unbounded_coeffs(self, coeffs, scale, swl):
        return rgb2spec.eval_spectrum(coeffs, swl.lam) * scale[..., None]

    def decode_illuminant_coeffs(self, coeffs, scale, swl):
        return (
            self.decode_unbounded_coeffs(coeffs, scale, swl)
            * cie.d65(swl.lam)
            * _ILLUM_NORM
        )

    def decode_albedo(self, rgb, swl):
        coeffs = self._coeffs(rgb)
        return rgb2spec.eval_spectrum(coeffs, swl.lam)

    def decode_unbounded(self, rgb, swl):
        m = jnp.maximum(jnp.max(rgb, axis=-1), 1e-8)
        scale = jnp.where(m > 1.0, 2.0 * m, 1.0)
        coeffs = self._coeffs(rgb / scale[..., None])
        return rgb2spec.eval_spectrum(coeffs, swl.lam) * scale[..., None]

    def decode_illuminant(self, rgb, swl):
        base = self.decode_unbounded(jnp.maximum(rgb, 0.0), swl)
        d65 = cie.d65(swl.lam)
        return base * d65 * _ILLUM_NORM

    def srgb(self, values, swl):
        xyz = spectral_to_xyz(values, swl)
        return colorspace.cie_xyz_to_linear_srgb(xyz)

    def cie_y(self, values, swl):
        return spectral_to_xyz(values, swl)[..., 1]


@register(SceneNodeTag.SPECTRUM, "hero", "Hero")
class HeroSpectrumNode(Spectrum):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        dim = desc.int("dimension", 4)
        if not 1 <= dim <= 8:
            raise ValueError("hero spectrum dimension must be in [1, 8]")
        self._model = HeroWavelengthSpectrum(dimension=dim)

    def model(self):
        return self._model
