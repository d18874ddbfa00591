"""Unit tests for the math/sampling core (SURVEY.md §4 test strategy:
statistical tests for every sampling routine, mirroring the reference's
test_alias_method)."""

import jax.numpy as jnp
import numpy as np
import pytest

from luisarender_tpu.core import colorspace, frame as fr, rng, sampling


class TestRNG:
    def test_lcg_uniformity(self):
        state = rng.seed_pixels(
            jnp.arange(10000) % 100, jnp.arange(10000) // 100, 0, 42
        )
        us = []
        for _ in range(4):
            state, u = rng.lcg_step(state)
            us.append(np.asarray(u))
        u = np.concatenate(us)
        assert u.min() >= 0.0 and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 0.01
        assert abs(np.var(u) - 1.0 / 12.0) < 0.005
        # histogram chi^2-ish check
        hist, _ = np.histogram(u, bins=20, range=(0, 1))
        expected = len(u) / 20
        chi2 = ((hist - expected) ** 2 / expected).sum()
        assert chi2 < 60.0  # dof=19, p~1e-5 cutoff

    def test_seed_decorrelation(self):
        a = rng.seed_pixels(jnp.arange(1000), jnp.zeros(1000, jnp.uint32), 0, 1)
        b = rng.seed_pixels(jnp.arange(1000), jnp.zeros(1000, jnp.uint32), 1, 1)
        assert np.mean(np.asarray(a) == np.asarray(b)) < 0.01

    def test_pcg2d_changes_both(self):
        v0, v1 = rng.pcg2d(jnp.arange(100), jnp.zeros(100, jnp.uint32))
        assert len(np.unique(np.asarray(v0))) > 95
        assert len(np.unique(np.asarray(v1))) > 95


class TestSampling:
    def test_alias_table_statistics(self):
        """Analogue of reference test_alias_method.cpp:25-60."""
        np.random.seed(0)
        w = np.random.rand(128)
        table = sampling.build_alias_table(w)
        pdf_ref = w / w.sum()
        n = 1 << 20
        u = (np.arange(n) + 0.5) / n
        idx, pdf, _ = sampling.alias_sample(table, jnp.asarray(u, jnp.float32))
        idx = np.asarray(idx)
        counts = np.bincount(idx, minlength=128) / n
        assert np.abs(counts - pdf_ref).max() < 3e-3
        np.testing.assert_allclose(np.asarray(pdf), pdf_ref[idx], rtol=1e-4)

    def test_alias_pdf_sums_to_one(self):
        table = sampling.build_alias_table(np.asarray([1.0, 2.0, 3.0, 4.0]))
        assert abs(float(jnp.sum(table.pdf)) - 1.0) < 1e-6

    def test_cosine_hemisphere(self):
        n = 1 << 16
        u = jnp.stack(
            [
                jnp.asarray(np.random.RandomState(1).rand(n), jnp.float32),
                jnp.asarray(np.random.RandomState(2).rand(n), jnp.float32),
            ],
            axis=-1,
        )
        w = sampling.sample_cosine_hemisphere(u)
        w = np.asarray(w)
        assert np.all(w[:, 2] >= 0)
        np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-5)
        # E[cos theta] under cosine-weighted pdf = 2/3
        assert abs(w[:, 2].mean() - 2.0 / 3.0) < 5e-3

    def test_uniform_sphere(self):
        n = 1 << 16
        rs = np.random.RandomState(3)
        u = jnp.asarray(rs.rand(n, 2), jnp.float32)
        w = np.asarray(sampling.sample_uniform_sphere(u))
        np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-5)
        assert np.abs(w.mean(axis=0)).max() < 0.01

    def test_uniform_triangle(self):
        rs = np.random.RandomState(4)
        u = jnp.asarray(rs.rand(1 << 14, 2), jnp.float32)
        b = np.asarray(sampling.sample_uniform_triangle(u))
        assert (b >= 0).all() and (b.sum(-1) <= 1.0 + 1e-6).all()
        # centroid of uniform samples ~ (1/3, 1/3)
        np.testing.assert_allclose(b.mean(axis=0), [1 / 3, 1 / 3], atol=5e-3)

    def test_mis_heuristics(self):
        a = jnp.asarray([1.0, 2.0])
        b = jnp.asarray([1.0, 0.0])
        np.testing.assert_allclose(
            np.asarray(sampling.balance_heuristic(a, b)), [0.5, 1.0]
        )
        np.testing.assert_allclose(
            np.asarray(sampling.power_heuristic(a, b)), [0.5, 1.0]
        )

    def test_sample_discrete(self):
        w = jnp.asarray([[1.0, 3.0]] * 1000)
        u = jnp.asarray(np.random.RandomState(5).rand(1000), jnp.float32)
        idx, pdf, u2 = sampling.sample_discrete(w, u)
        frac1 = float(jnp.mean((idx == 1).astype(jnp.float32)))
        assert abs(frac1 - 0.75) < 0.05
        assert float(jnp.max(u2)) < 1.0 and float(jnp.min(u2)) >= 0.0


class TestFrame:
    def test_make_frame_orthonormal(self):
        rs = np.random.RandomState(6)
        n = rs.randn(100, 3)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        f = fr.make_frame(jnp.asarray(n, jnp.float32))
        s, t, nn = np.asarray(f["s"]), np.asarray(f["t"]), np.asarray(f["n"])
        np.testing.assert_allclose((s * t).sum(-1), 0, atol=1e-5)
        np.testing.assert_allclose((s * nn).sum(-1), 0, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(s, axis=-1), 1, atol=1e-5)
        cross = np.cross(s, t)
        np.testing.assert_allclose(cross, nn, atol=1e-5)

    def test_local_world_roundtrip(self):
        rs = np.random.RandomState(7)
        n = rs.randn(50, 3)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        f = fr.make_frame(jnp.asarray(n, jnp.float32))
        v = jnp.asarray(rs.randn(50, 3), jnp.float32)
        v2 = fr.to_world(f, fr.to_local(f, v))
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-5)

    def test_reflect(self):
        wo = jnp.asarray([[0.0, 0.0, 1.0]])
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        np.testing.assert_allclose(
            np.asarray(fr.reflect(wo, n)), [[0.0, 0.0, 1.0]], atol=1e-6
        )


class TestColorspace:
    def test_srgb_xyz_roundtrip(self):
        rs = np.random.RandomState(8)
        rgb = jnp.asarray(rs.rand(100, 3), jnp.float32)
        back = colorspace.cie_xyz_to_linear_srgb(colorspace.linear_srgb_to_cie_xyz(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)

    def test_srgb_gamma_roundtrip(self):
        x = jnp.linspace(0.0, 1.0, 64)
        y = colorspace.srgb_decode(colorspace.srgb_encode(x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    def test_white_luminance(self):
        assert abs(float(colorspace.cie_y_of_srgb(jnp.asarray([1.0, 1.0, 1.0]))) - 1.0) < 1e-4
