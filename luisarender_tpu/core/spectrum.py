"""Spectral sample representation and the Spectrum model interface.

TPU-native equivalent of /root/reference/src/base/spectrum.h:27-72 and
util/spec.h:53-296. The reference's `SampledSpectrum` is a register-indexed
local array with an operator set; here a spectral sample is simply a jnp array
of shape (..., C) where C is the (static) spectral dimension, so the whole
operator set comes for free and XLA vectorizes it. `SampledWavelengths` is a
NamedTuple of (lambda, pdf) arrays.

Spectrum models are scene-static Python objects chosen at scene-compile time
(the jitted render function specializes on them), mirroring how the reference
JIT-compiles per-scene kernels with a fixed spectrum plugin.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import cie, colorspace

# Fixed sRGB-mode wavelengths: peak response wavelengths of the sRGB primaries
# (util/spec.h:22-23 — 602.785/539.285/445.772 nm, pdf pinned to 1).
SRGB_PEAK_WAVELENGTHS = (602.785, 539.285, 445.772)


class SampledWavelengths(NamedTuple):
    lam: jnp.ndarray  # (..., C) wavelengths in nm
    pdf: jnp.ndarray  # (..., C) sampling pdf per channel (0 => terminated)

    @property
    def dimension(self):
        return self.lam.shape[-1]

    def terminate_secondary(self):
        """Collapse to the hero wavelength after a dispersive event
        (spectrum.h swl.terminate_secondary)."""
        c = self.lam.shape[-1]
        if c == 1:
            return self
        pdf = jnp.concatenate(
            [self.pdf[..., :1] / c, jnp.zeros_like(self.pdf[..., 1:])], axis=-1
        )
        return SampledWavelengths(lam=self.lam, pdf=pdf)

    def secondary_terminated(self):
        if self.lam.shape[-1] == 1:
            return jnp.ones(self.lam.shape[:-1], dtype=bool)
        return jnp.all(self.pdf[..., 1:] == 0.0, axis=-1)


class SpectrumModel:
    """Interface: encode host RGB -> decode at sampled wavelengths
    (base/spectrum.h Decode{value,strength})."""

    dimension: int = 3
    is_fixed: bool = True

    def sample_wavelengths(self, u):
        raise NotImplementedError

    def decode_albedo(self, rgb, swl):
        raise NotImplementedError

    def decode_unbounded(self, rgb, swl):
        raise NotImplementedError

    def decode_illuminant(self, rgb, swl):
        raise NotImplementedError

    def srgb(self, values, swl):
        """Integrate a spectral sample back to linear sRGB (..., 3)."""
        raise NotImplementedError

    def cie_y(self, values, swl):
        raise NotImplementedError


class SRGBSpectrum(SpectrumModel):
    """Fixed 3-channel RGB mode (spectra/srgb.cpp:25-33): wavelengths pinned to
    the sRGB peak responses with pdf 1; spectral samples ARE linear sRGB."""

    dimension = 3
    is_fixed = True

    def sample_wavelengths(self, u):
        shape = u.shape[:-1] if u.ndim > 0 else ()
        lam = jnp.broadcast_to(
            jnp.asarray(SRGB_PEAK_WAVELENGTHS, dtype=jnp.float32), shape + (3,)
        )
        pdf = jnp.ones(shape + (3,), dtype=jnp.float32)
        return SampledWavelengths(lam=lam, pdf=pdf)

    def decode_albedo(self, rgb, swl):
        return jnp.clip(rgb, 0.0, 1.0)

    def decode_unbounded(self, rgb, swl):
        return rgb

    def decode_illuminant(self, rgb, swl):
        return jnp.maximum(rgb, 0.0)

    def srgb(self, values, swl):
        return values

    def cie_y(self, values, swl):
        return colorspace.cie_y_of_srgb(values)


def spectrum_average(values):
    """Mean over the spectral dimension (SampledSpectrum::average)."""
    return jnp.mean(values, axis=-1)


def spectrum_max(values):
    return jnp.max(values, axis=-1)


def safe_div(a, b, eps=1e-20):
    """a/b with 0/0 -> 0; used for throughput /= pdf updates."""
    return jnp.where(jnp.abs(b) > eps, a / jnp.where(jnp.abs(b) > eps, b, 1.0), 0.0)


def spectral_to_xyz(values, swl):
    """Monte-Carlo estimate of XYZ from spectral samples at swl
    (base/spectrum.cpp:15-45): XYZ = mean_i CIE(λ_i)·s_i/pdf_i / ∫ybar."""
    xyz_bar = cie.cie_xyz(swl.lam)  # (..., C, 3)
    w = safe_div(values, swl.pdf)  # (..., C)
    xyz = jnp.mean(xyz_bar * w[..., None], axis=-2)
    return xyz / cie.CIE_Y_INTEGRAL
