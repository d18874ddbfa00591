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
    return table[idx]
