"""Monte-Carlo sampling primitives and alias tables.

TPU-native equivalent of /root/reference/src/util/sampling.h:19-77 /
sampling.cpp: triangle/disk/hemisphere/sphere/cone sampling, Vose alias-table
construction (host, numpy) + device-side sampling (jnp gathers), and the
balance/power MIS heuristics. Device code is batched over leading dims.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

INV_PI = 1.0 / np.pi
PI = float(np.pi)


# ---------------------------------------------------------------------------
# Shape sampling
# ---------------------------------------------------------------------------


def sample_uniform_triangle(u):
    """u: (..., 2) -> barycentric (..., 2) (b0, b1); low-distortion sqrt warp
    (sampling.cpp sample_uniform_triangle)."""
    su = jnp.sqrt(jnp.maximum(u[..., 0], 0.0))
    b0 = 1.0 - su
    b1 = u[..., 1] * su
    return jnp.stack([b0, b1], axis=-1)


def sample_uniform_disk_concentric(u):
    """Concentric (Shirley) disk mapping; u: (..., 2) -> (..., 2)."""
    ux = 2.0 * u[..., 0] - 1.0
    uy = 2.0 * u[..., 1] - 1.0
    zero = (ux == 0.0) & (uy == 0.0)
    use_x = jnp.abs(ux) > jnp.abs(uy)
    r = jnp.where(use_x, ux, uy)
    safe = lambda num, den: num / jnp.where(den == 0.0, 1.0, den)
    theta = jnp.where(
        use_x, (PI / 4.0) * safe(uy, ux), (PI / 2.0) - (PI / 4.0) * safe(ux, uy)
    )
    p = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    return jnp.where(zero[..., None], 0.0, p)


def sample_cosine_hemisphere(u):
    """Cosine-weighted hemisphere (z-up); u: (..., 2) -> (..., 3)."""
    d = sample_uniform_disk_concentric(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return jnp.stack([d[..., 0], d[..., 1], z], axis=-1)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * INV_PI


def sample_uniform_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


UNIFORM_SPHERE_PDF = 1.0 / (4.0 * PI)
UNIFORM_HEMISPHERE_PDF = 1.0 / (2.0 * PI)


def sample_uniform_hemisphere(u):
    z = u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def sample_uniform_cone(u, cos_theta_max):
    cos_t = (1.0 - u[..., 0]) + u[..., 0] * cos_theta_max
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (2.0 * PI * jnp.maximum(1.0 - cos_theta_max, 1e-8))


# ---------------------------------------------------------------------------
# MIS heuristics (sampling.h:70-77)
# ---------------------------------------------------------------------------


def balance_heuristic(pdf_a, pdf_b):
    return pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-20)


def power_heuristic(pdf_a, pdf_b):
    a2 = pdf_a * pdf_a
    return a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-20)


# ---------------------------------------------------------------------------
# Alias tables — the single most reused sampling primitive in the reference
# (sampling.h:29-49, Vose O(n) build; used for triangle areas, env maps,
# filters, light selection).
# ---------------------------------------------------------------------------


class AliasTable(NamedTuple):
    """prob/alias arrays, plus normalized pdf. All shape (n,)."""

    prob: jnp.ndarray  # float32: probability of keeping bucket i
    alias: jnp.ndarray  # int32: alias bucket
    pdf: jnp.ndarray  # float32: normalized pdf of entry i (sums to 1)


def build_alias_table(weights: np.ndarray) -> AliasTable:
    """Host-side Vose O(n) construction over non-negative weights (numpy)."""
    w = np.asarray(weights, dtype=np.float64).ravel()
    n = w.size
    if n == 0:
        raise ValueError("alias table over empty weights")
    w = np.maximum(w, 0.0)
    total = w.sum()
    if total <= 0.0:
        w = np.ones_like(w)
        total = float(n)
    pdf = w / total
    scaled = pdf * n
    prob = np.ones(n, dtype=np.float64)
    alias = np.arange(n, dtype=np.int64)
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] = (scaled[l] + scaled[s]) - 1.0
        (small if scaled[l] < 1.0 else large).append(l)
    for i in large:
        prob[i] = 1.0
    for i in small:
        prob[i] = 1.0
    return AliasTable(
        prob=jnp.asarray(prob, dtype=jnp.float32),
        alias=jnp.asarray(alias, dtype=jnp.int32),
        pdf=jnp.asarray(pdf, dtype=jnp.float32),
    )


def alias_sample(table: AliasTable, u):
    """Sample index ~ pdf from uniform u; returns (index, pdf, u_remapped).

    u_remapped recycles the used uniform back to [0,1) like the reference's
    sample_alias_table (sampling.cpp), so callers can chain dimensions.
    """
    n = table.prob.shape[0]
    ux = u * n
    i = jnp.clip(ux.astype(jnp.int32), 0, n - 1)
    up = ux - i.astype(jnp.float32)
    prob_i = table.prob[i]
    take_alias = up >= prob_i
    index = jnp.where(take_alias, table.alias[i], i)
    u_remapped = jnp.where(
        take_alias,
        (up - prob_i) / jnp.maximum(1.0 - prob_i, 1e-8),
        up / jnp.maximum(prob_i, 1e-8),
    )
    u_remapped = jnp.clip(u_remapped, 0.0, 1.0 - 2.0 ** -24)
    return index, table.pdf[index], u_remapped


# ---------------------------------------------------------------------------
# 2D alias sampling for environment maps: marginal over rows + conditional
# per row, both packed as flat tables (environments/spherical.cpp:194-222).
# ---------------------------------------------------------------------------


class AliasTable2D(NamedTuple):
    marginal: AliasTable  # over rows, shape (h,)
    cond_prob: jnp.ndarray  # (h, w)
    cond_alias: jnp.ndarray  # (h, w)
    cond_pdf: jnp.ndarray  # (h, w)


def build_alias_table_2d(weights_2d: np.ndarray) -> AliasTable2D:
    w = np.asarray(weights_2d, dtype=np.float64)
    h, wd = w.shape
    row_sums = w.sum(axis=1)
    marginal = build_alias_table(row_sums)
    cp = np.zeros((h, wd), dtype=np.float32)
    ca = np.zeros((h, wd), dtype=np.int32)
    cpdf = np.zeros((h, wd), dtype=np.float32)
    for y in range(h):
        t = build_alias_table(w[y])
        cp[y] = np.asarray(t.prob)
        ca[y] = np.asarray(t.alias)
        cpdf[y] = np.asarray(t.pdf)
    return AliasTable2D(
        marginal=marginal,
        cond_prob=jnp.asarray(cp),
        cond_alias=jnp.asarray(ca),
        cond_pdf=jnp.asarray(cpdf),
    )


def alias_sample_2d(table: AliasTable2D, u):
    """u: (..., 2) -> (x, y, pdf_texel) where pdf is over the h*w texel grid."""
    y, pdf_y, uy = alias_sample(table.marginal, u[..., 1])
    w = table.cond_prob.shape[1]
    ux = u[..., 0] * w
    xi = jnp.clip(ux.astype(jnp.int32), 0, w - 1)
    up = ux - xi.astype(jnp.float32)
    prob_i = table.cond_prob[y, xi]
    take_alias = up >= prob_i
    x = jnp.where(take_alias, table.cond_alias[y, xi], xi)
    pdf_x = table.cond_pdf[y, x]
    # joint texel pdf normalized over the grid
    return x, y, pdf_y * pdf_x


# ---------------------------------------------------------------------------
# Discrete / misc
# ---------------------------------------------------------------------------


def sample_discrete(weights, u):
    """Sample an index from a small set of per-sample weights (..., k).

    Returns (index, pdf, u_remapped). Linear scan — intended for small k
    (lobe selection), not large tables.
    """
    total = jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(weights, axis=-1) / jnp.maximum(total, 1e-20)
    ucol = u[..., None]
    index = jnp.sum((ucol >= cdf).astype(jnp.int32), axis=-1)
    k = weights.shape[-1]
    index = jnp.clip(index, 0, k - 1)
    pdf = jnp.take_along_axis(weights / jnp.maximum(total, 1e-20), index[..., None], -1)[
        ..., 0
    ]
    lo = jnp.where(
        index == 0,
        0.0,
        jnp.take_along_axis(cdf, jnp.maximum(index - 1, 0)[..., None], -1)[..., 0],
    )
    hi = jnp.take_along_axis(cdf, index[..., None], -1)[..., 0]
    u_remapped = jnp.clip((u - lo) / jnp.maximum(hi - lo, 1e-8), 0.0, 1.0 - 2.0 ** -24)
    return index, pdf, u_remapped


def sample_exponential(u, a):
    """Sample t ~ a*exp(-a t); (sampling.h sample_exponential)."""
    return -jnp.log(jnp.maximum(1.0 - u, 1e-38)) / a
