"""MXU-shaped 2D scatter-add for texture-atlas gradients.

XLA's scatter-add VJP for the atlas gather costs ~27 ms per 1M cotangents
on v5e (~27 ns/row — scatters run near-serially, PERF.md round 4; the
sorted-segment-sum hint was measured a wash). TPU has no scatter hardware
either — but it has an MXU, and a scatter-add IS a one-hot matmul:

    grad[b] = sum_i [bin_i == b] * g_i   =   OneHot(bin)^T @ g

A dense (N, H*W) one-hot is unbuildable, so the bins are SORTED (fast
parallel network) and processed window-by-window: each 32768-bin window's
cotangents are a contiguous segment of the sorted array, and within a
window the one-hot factorizes two-level (bin = hi*128 + lo):

    W_window = OH_hi^T @ (OH_lo * g)      (256, B) @ (B, 128*C)

with OH_hi (B, 256) and OH_lo (B, 128) tiny. The static work schedule
(window, sub-block) is bounded by N/B + n_windows items, so shapes stay
fixed. f32 exactness to ~1e-7 relative via a hi/lo bf16 product split
(the one-hot factor is exactly representable; the payload is split).

Matches the role of atomic float accumulation in the reference's
differentiable path (Luisa `atomic_float` image gradients).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

LO = 128          # minor one-hot width (lane dim)
HI = 256          # major one-hot width; window = HI * LO bins
WIN = HI * LO     # 32768
B = 2048          # cotangents per work item


@partial(jax.jit, static_argnums=(0, 1))
def scatter_add_2d(h: int, w: int, bins, g):
    """Dense-equivalent of `zeros((h*w, C)).at[bins].add(g)` -> (h, w, C).

    bins: (N,) int32 in [0, h*w); g: (N, C) f32.
    """
    n, c = g.shape
    if n < B:  # pad with zero-weight entries so the B-slices stay in range
        pad = B - n
        bins = jnp.concatenate([bins, jnp.zeros((pad,), bins.dtype)])
        g = jnp.concatenate([g, jnp.zeros((pad, c), g.dtype)])
        n = B
    nbins = h * w
    nwin = -(-nbins // WIN)
    nitems = n // B + nwin + 1  # each window adds at most one partial block

    ops = (bins,) + tuple(g[:, k] for k in range(c))
    s_bins, *s_g = jax.lax.sort(ops, num_keys=1)
    s_g = jnp.stack(s_g, axis=-1)  # (N, C) sorted payload

    win_starts = jnp.searchsorted(
        s_bins, jnp.arange(nwin + 1, dtype=jnp.int32) * WIN
    ).astype(jnp.int32)
    counts = win_starts[1:] - win_starts[:-1]
    subcounts = -(-counts // B)
    cum = jnp.cumsum(subcounts)

    # static (window, sub-block) schedule -> per-item gather indices. One
    # big row-gather beats a serial per-item fori_loop by ~10x: the loop
    # form measured 69 ms (latency-bound: each item chained dynamic
    # slices, 3 small matmuls, and a 512 KB read-modify-write).
    items = jnp.arange(nitems, dtype=jnp.int32)
    wi = jnp.searchsorted(cum, items, side="right").astype(jnp.int32)
    live = wi < nwin
    wi_c = jnp.minimum(wi, nwin - 1)
    base = jnp.where(wi > 0, cum[jnp.maximum(wi - 1, 0)], 0)
    start = win_starts[wi_c] + (items - base) * B
    lim = win_starts[wi_c + 1]
    iota_b = jnp.arange(B, dtype=jnp.int32)
    rows = start[:, None] + iota_b[None, :]  # (nitems, B)
    mask = (rows < lim[:, None]) & live[:, None]
    rows_c = jnp.clip(rows, 0, n - 1).reshape(-1)
    blk_bins = s_bins[rows_c].reshape(nitems, B)
    blk_g = s_g[rows_c].reshape(nitems, B, c)

    local = jnp.clip(blk_bins - wi_c[:, None] * WIN, 0, WIN - 1)
    hi = local // LO
    lo = local - hi * LO

    iota_hi = jnp.arange(HI, dtype=jnp.int32)
    iota_lo = jnp.arange(LO, dtype=jnp.int32)

    def chunk_fn(args):
        hi_k, lo_k, g_k, mask_k = args  # (K, B) (K, B) (K, B, c) (K, B)
        oh_hi = (hi_k[..., None] == iota_hi[None, None, :]).astype(
            jnp.bfloat16
        )  # (K, B, HI)
        rhs = jnp.where(
            mask_k[..., None, None],
            (lo_k[..., None] == iota_lo[None, None, :]).astype(
                jnp.float32
            )[..., None] * g_k[..., None, :],
            0.0,
        ).reshape(-1, B, LO * c)
        # 3-term bf16 split: 3 x 8 mantissa bits cover f32's 24, so the
        # exact-one-hot x payload products reconstruct the f32 sum to ~1
        # ulp (a 2-term split measured 1e-3 relative under cancellation)
        r_hi = rhs.astype(jnp.bfloat16)
        r1 = rhs - r_hi.astype(jnp.float32)
        r_mid = r1.astype(jnp.bfloat16)
        r_lo = (r1 - r_mid.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((0,), (0,)))
        m = (
            jax.lax.dot_general(oh_hi, r_hi, dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(oh_hi, r_mid, dn,
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(oh_hi, r_lo, dn,
                                  preferred_element_type=jnp.float32)
        )  # (K, HI, LO*c)
        return m

    K = 16  # items per matmul batch (bounds the bf16 rhs intermediates)
    pad_items = (-nitems) % K
    def padk(x):
        return jnp.concatenate(
            [x, jnp.zeros((pad_items,) + x.shape[1:], x.dtype)]
        ) if pad_items else x
    hi_p, lo_p, g_p = padk(hi), padk(lo), padk(blk_g)
    mask_p = padk(mask)
    nk = (nitems + pad_items) // K
    m_all = jax.lax.map(
        chunk_fn,
        (hi_p.reshape(nk, K, B), lo_p.reshape(nk, K, B),
         g_p.reshape(nk, K, B, c), mask_p.reshape(nk, K, B)),
    ).reshape(-1, HI * LO * c)[:nitems]

    # place: items are already grouped by window -> one segment-sum
    flat = jax.ops.segment_sum(m_all, wi_c, num_segments=nwin)
    return flat.reshape(-1, c)[:nbins].reshape(h, w, c)
