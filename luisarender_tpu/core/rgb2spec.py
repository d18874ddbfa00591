"""RGB -> reflectance-spectrum upsampling (sigmoid-polynomial model).

TPU-native equivalent of the reference's RGB2Spec machinery
(/root/reference/src/spectra/hero.cpp:42-160 — a precomputed 64^3
sigmoid-polynomial LUT shipped as data). Instead of shipping tables, we SOLVE
the same model ourselves (Jakob & Hanika 2019, "A Low-Dimensional Function
Space for Efficient Spectral Upsampling"):

    S(lambda) = s(c0 x^2 + c1 x + c2),  s(t) = 1/2 + t / (2 sqrt(1 + t^2)),
    x = (lambda - 360) / (830 - 360) in [0, 1]

Coefficients are fit by damped Gauss-Newton so that S integrated against the
CIE matching functions under D65 reproduces the target sRGB triple. Two
paths:
- `fit_rgb` — vectorized batch fit, used directly at scene-compile time for
  constant colors (exact, no LUT error);
- `lut()` — a lazily-generated, disk-cached 3x N^3 coefficient table in the
  same max-channel parameterization as RGB2Spec, used for textures.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from . import cie
from .colorspace import SRGB_FROM_XYZ

LAMBDA_MIN = 360.0
LAMBDA_MAX = 830.0
_N_LAMBDA = 95  # 5 nm steps — matches table resolutions used in practice

_lam = np.linspace(LAMBDA_MIN, LAMBDA_MAX, _N_LAMBDA)
_x = (_lam - LAMBDA_MIN) / (LAMBDA_MAX - LAMBDA_MIN)


def _cie_rgb_basis():
    """Rows: weights such that rgb = W @ S(lambda_grid) for a reflectance
    under D65, normalized so S == 1 gives rgb == (1,1,1).

    Runs at import: cie fits evaluate in numpy for numpy inputs, so no
    device dispatch happens here (a TPU dispatch at import costs a remote
    kernel compile per process start)."""
    xyz_bar = np.stack(
        [cie.cie_x(_lam), cie.cie_y(_lam), cie.cie_z(_lam)]
    )  # (3, L)
    d65 = cie.d65(_lam)
    w_xyz = xyz_bar * d65  # (3, L)
    rgb_w = SRGB_FROM_XYZ.astype(np.float64) @ w_xyz  # (3, L)
    # normalize per-row? No: normalize by response to S=1 (white) per channel
    white = rgb_w.sum(axis=1)  # rgb of a perfect reflector
    return rgb_w / white[:, None]


_W = _cie_rgb_basis()  # (3, L)


def _sigmoid(t):
    return 0.5 + t / (2.0 * np.sqrt(1.0 + t * t))


def _dsigmoid(t):
    return 0.5 * (1.0 + t * t) ** -1.5


def eval_spectrum(coeffs, lam):
    """coeffs: (..., 3); lam: (..., C) nm -> reflectance (..., C). Works with
    numpy or jax arrays (pure elementwise math)."""
    import jax.numpy as jnp

    xp = jnp if not isinstance(lam, np.ndarray) else np
    x = (lam - LAMBDA_MIN) / (LAMBDA_MAX - LAMBDA_MIN)
    t = coeffs[..., 0:1] * x * x + coeffs[..., 1:2] * x + coeffs[..., 2:3]
    return 0.5 + t / (2.0 * xp.sqrt(1.0 + t * t))


def fit_rgb(rgb: np.ndarray, iters: int = 40) -> np.ndarray:
    """Batch Gauss-Newton fit. rgb: (..., 3) in [0, 1] -> coeffs (..., 3)."""
    rgb = np.asarray(rgb, np.float64)
    shape = rgb.shape[:-1]
    target = rgb.reshape(-1, 3)
    n = target.shape[0]
    # init: flat spectrum matching luminance
    lum = np.clip(target.mean(axis=1), 1e-4, 1.0 - 1e-4)
    c = np.zeros((n, 3))
    c[:, 2] = np.arctanh(2.0 * lum - 1.0) * 2.0  # rough inverse of sigmoid

    basis = np.stack([_x * _x, _x, np.ones_like(_x)], axis=0)  # (3, L)
    lam_damp = np.full(n, 1e-4)
    for _ in range(iters):
        t = c @ basis  # (n, L)
        s = _sigmoid(t)
        resid = s @ _W.T - target  # (n, 3)
        ds = _dsigmoid(t)  # (n, L)
        # J[n, 3(rgb), 3(coef)] = sum_l W[r, l] ds[n, l] basis[k, l]
        j = np.einsum("rl,nl,kl->nrk", _W, ds, basis)
        jtj = np.einsum("nrk,nrm->nkm", j, j)
        jtr = np.einsum("nrk,nr->nk", j, resid)
        a = jtj + lam_damp[:, None, None] * np.eye(3)
        try:
            delta = np.linalg.solve(a, jtr[..., None])[..., 0]
        except np.linalg.LinAlgError:
            delta = np.zeros_like(jtr)
        c = c - delta
    return c.reshape(shape + (3,)).astype(np.float32)


def fit_rgb_unbounded(rgb: np.ndarray):
    """For values possibly > 1 (illuminants/unbounded): returns (coeffs,
    scale) with rgb = scale * decode(coeffs) and decode in [0, 1]."""
    rgb = np.asarray(rgb, np.float64)
    m = np.maximum(rgb.max(axis=-1), 1e-8)
    scale = np.where(m > 1.0, m * 2.0, 1.0)
    normalized = rgb / scale[..., None]
    return fit_rgb(np.clip(normalized, 0.0, 1.0)), scale.astype(np.float32)


_LUT_CACHE = {}
_LUT_RES = 24


def lut(res: int = _LUT_RES) -> np.ndarray:
    """(3, res, res, res, 3) coefficient table in RGB2Spec's max-channel
    parameterization: axis 0 = argmax channel k; grid = (z, y, x) where
    z = value of channel k, and x, y = other channels / z. Cached on disk."""
    if res in _LUT_CACHE:
        return _LUT_CACHE[res]
    cache_dir = Path(
        os.environ.get("LUISARENDER_TPU_CACHE", Path.home() / ".cache" / "luisarender_tpu")
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    path = cache_dir / f"rgb2spec_{res}.npy"
    if path.exists():
        table = np.load(path)
    else:
        # inclusive endpoints so pure primaries/white are exactly on-grid
        grid = np.arange(res) / (res - 1)
        table = np.zeros((3, res, res, res, 3), np.float32)
        for k in range(3):
            z, y, x = np.meshgrid(grid, grid, grid, indexing="ij")
            rgb = np.zeros((res, res, res, 3))
            rgb[..., k] = z
            others = [i for i in range(3) if i != k]
            rgb[..., others[0]] = x * z
            rgb[..., others[1]] = y * z
            table[k] = fit_rgb(rgb, iters=30)
        np.save(path, table)
    _LUT_CACHE[res] = table
    return table


def lut_lookup_np(table: np.ndarray, rgb: np.ndarray) -> np.ndarray:
    """Host-side nearest lookup (used to pre-bake texture atlases)."""
    res = table.shape[1]
    rgb = np.clip(np.asarray(rgb, np.float64), 0.0, 1.0)
    k = rgb.argmax(axis=-1)
    z = np.take_along_axis(rgb, k[..., None], -1)[..., 0]
    safe_z = np.maximum(z, 1e-8)
    others = np.stack(
        [np.where(k == 0, rgb[..., 1], rgb[..., 0]),
         np.where(k == 2, rgb[..., 1], rgb[..., 2])], -1
    )
    x = others[..., 0] / safe_z
    y = others[..., 1] / safe_z
    qi = lambda v: np.clip(np.round(v * (res - 1)).astype(np.int32), 0, res - 1)
    return table[k, qi(z), qi(y), qi(x)]
