"""Row fetch from small device tables: gather vs one-hot-matmul dispatch.

TPU gathers pay a large per-row overhead (~2.7 ms per 1M-index gather on v5e
regardless of row width — measured in scratch profiling); for small tables a
one-hot matmul on the MXU is ~2x faster AND exact: the f32 operand is split
into three bf16 pieces whose sum reconstructs the full 24-bit mantissa, and
multiplying by an exact 0/1 one-hot selects whole rows, so results are
bit-identical to a gather (covered by tests/test_core.py).

This is the TPU-native analogue of the reference's BindlessArray buffer reads
(/root/reference/src/base/pipeline.h:112-136): indexed access into packed
resource tables from device code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# one-hot matmul wins below this row count (beyond it, the materialized
# (n_indices, n_rows) one-hot dominates HBM traffic)
ONE_HOT_MAX_ROWS = 64


def fetch_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table: (R, C) float32; idx: (...,) int32 in [0, R). Returns (..., C)."""
    r = table.shape[0]
    if r <= ONE_HOT_MAX_ROWS:
        one_hot = (idx[..., None] == jnp.arange(r, dtype=idx.dtype)).astype(
            table.dtype
        )
        # HIGHEST precision is REQUIRED for exactness: the TPU's default
        # f32 matmul truncates operands to one bf16 pass (8-bit mantissa),
        # which corrupts fetched rows (measured: Cornell mean radiance
        # dropped 0.117 -> 0.092). With the multi-pass decomposition every
        # f32 splits exactly into bf16 pieces, the 0/1 one-hot multiplies
        # them exactly, and the f32 accumulation reassembles the full
        # 24-bit mantissa — bit-identical to a gather.
        return jnp.matmul(one_hot, table, precision=jax.lax.Precision.HIGHEST)
    # optimization_barrier forces ONE materialized (n, C) gather: without it
    # XLA fuses the gather into each column-slice consumer, re-gathering the
    # table per consumer (measured on v5e, (512k, 40) table at 1M indices:
    # 59 ms inside surface_interaction vs 11 ms for the bare gather)
    return jax.lax.optimization_barrier(table[idx])


def gather_param_rows(params, index):
    """Fetch per-ray parameter rows with ONE packed row fetch.

    TPU gathers cost ~2 ms per 1M indices regardless of row width, so a
    per-key `v[index]` (the obvious formulation) pays that per PARAMETER —
    measured as the dominant cost of the whole shading pass on a 512k-tri
    scene. Instead all columns are concatenated into one (R, K) f32 matrix
    and fetched in a single `fetch_rows` (one-hot MXU matmul for small R).
    int32 columns ride as two exact f32 columns (top 8 / low 24 bits) since
    f32 is integer-exact only to 2^24."""
    keys = sorted(params)
    pieces = []
    spec = []  # (key, kind, packed width, original width or 0 for 1-D)
    for k in keys:
        v = params[k]
        v2 = v[:, None] if v.ndim == 1 else v
        w = v2.shape[1]
        ow = 0 if v.ndim == 1 else w
        if v.dtype == jnp.int32:
            pieces += [
                (v2 >> 24).astype(jnp.float32),
                (v2 & 0xFFFFFF).astype(jnp.float32),
            ]
            spec.append((k, "int", 2 * w, ow))
        else:
            pieces.append(v2.astype(jnp.float32))
            spec.append((k, "f", w, ow))
    if not pieces:
        return {}
    packed = jnp.concatenate(pieces, axis=1)
    rows = fetch_rows(packed, jnp.clip(index, 0, packed.shape[0] - 1))
    out = {}
    c = 0
    for k, kind, w, ow in spec:
        if kind == "int":
            hw = w // 2
            hi = rows[..., c : c + hw].astype(jnp.int32)
            lo = rows[..., c + hw : c + w].astype(jnp.int32)
            val = (hi << 24) | lo
        else:
            val = rows[..., c : c + w].astype(params[k].dtype)
        out[k] = val[..., 0] if ow == 0 else val
        c += w
    return out
