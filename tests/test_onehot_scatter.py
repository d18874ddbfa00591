"""MXU-shaped scatter-add (ops/onehot_scatter.py) vs XLA's scatter.

The one-hot-matmul formulation must reproduce `.at[bins].add(g)` to the
hi/lo-bf16-split tolerance (one residual truncation, ~1e-7 relative) on
adversarial bin patterns: duplicates, empty windows, window-boundary
straddles, all-one-bin pileups.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luisarender_tpu.ops.onehot_scatter import WIN, scatter_add_2d


def _ref(h, w, bins, g):
    return (
        jnp.zeros((h * w, g.shape[-1]), jnp.float32)
        .at[bins]
        .add(g)
        .reshape(h, w, g.shape[-1])
    )


@pytest.mark.parametrize("n,h,w", [
    (100_000, 512, 512),
    (5_000, 256, 1024),   # sparse: most windows empty
    (300, 64, 64),        # n < one block: padding path
])
def test_matches_xla_scatter(n, h, w):
    rng = np.random.default_rng(7)
    bins = jnp.asarray(rng.integers(0, h * w, n).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    got = np.asarray(scatter_add_2d(h, w, bins, g))
    ref = np.asarray(_ref(h, w, bins, g))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)


def test_pileup_single_bin():
    """10k cotangents into one bin: accumulation order/precision stress."""
    n, h, w = 10_000, 128, 256
    rng = np.random.default_rng(3)
    bins = jnp.full((n,), 777, jnp.int32)
    g = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    got = np.asarray(scatter_add_2d(h, w, bins, g))
    ref = np.asarray(_ref(h, w, bins, g))
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=5e-5)


def test_window_boundaries():
    """Bins exactly at multiples of WIN and at h*w-1."""
    h, w = 512, 512
    edge = [0, WIN - 1, WIN, WIN + 1, 2 * WIN - 1, h * w - 1]
    bins = jnp.asarray(edge * 700, jnp.int32)
    g = jnp.ones((len(edge) * 700, 2), jnp.float32)
    got = np.asarray(scatter_add_2d(h, w, bins, g))
    ref = np.asarray(_ref(h, w, bins, g))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_atlas_gather_vjp_uses_it():
    """grad through the image-texture atlas gather equals the XLA VJP."""
    from luisarender_tpu.textures.image import _atlas_gather

    rng = np.random.default_rng(11)
    atlas = jnp.asarray(rng.normal(size=(64, 128, 4)).astype(np.float32))
    yi = jnp.asarray(rng.integers(0, 64, (4, 500)).astype(np.int32))
    xi = jnp.asarray(rng.integers(0, 128, (4, 500)).astype(np.int32))

    def loss(a):
        v = _atlas_gather(a, yi, xi)
        return jnp.sum(v * v)

    def loss_ref(a):
        v = a[yi, xi]
        return jnp.sum(v * v)

    g1 = np.asarray(jax.grad(loss)(atlas))
    g2 = np.asarray(jax.grad(loss_ref)(atlas))
    np.testing.assert_allclose(g1, g2, rtol=2e-5, atol=1e-5)
