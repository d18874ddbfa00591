"""Pallas packet-traversal kernel vs brute force (interpret mode on CPU;
the TPU-compiled path is exercised by bench/production runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from luisarender_tpu.accel.traverse import trace_closest_brute
from luisarender_tpu.ops.trace_pallas import trace_closest_pallas

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from test_bvh import _make_geom, _random_rays, _random_scene  # noqa: E402


class TestPallasPacketTraversal:
    def test_matches_brute_force(self):
        verts, tris = _random_scene(400, seed=21)
        geom = _make_geom(verts, tris)
        rays = _random_rays(2048, seed=22)
        hb = trace_closest_brute(geom, rays)
        hp = trace_closest_pallas(geom, rays, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(hb.prim >= 0), np.asarray(hp.prim >= 0)
        )
        mask = np.asarray(hb.prim) >= 0
        np.testing.assert_allclose(
            np.asarray(hb.t)[mask], np.asarray(hp.t)[mask], rtol=1e-4, atol=1e-5
        )

    def test_t_max_respected(self):
        verts, tris = _random_scene(100, seed=23)
        geom = _make_geom(verts, tris)
        rays = _random_rays(1024, seed=24)
        h_full = trace_closest_pallas(geom, rays, interpret=True)
        capped = rays._replace(
            t_max=jnp.where(jnp.isfinite(h_full.t), h_full.t * 0.5, 1e-3)
        )
        h_capped = trace_closest_pallas(geom, capped, interpret=True)
        finite = np.isfinite(np.asarray(h_full.t))
        assert not np.any(np.asarray(h_capped.prim)[finite] >= 0)


class TestPallasBruteForce:
    """ops/brute_pallas.py: VMEM-resident brute-force kernels (interpret
    mode on CPU; the compiled path runs in bench/production on TPU)."""

    def test_closest_matches_xla(self):
        from luisarender_tpu.ops.brute_pallas import trace_closest_pallas as bp

        # sizes kept small: interpret mode pays per-op overhead on the
        # statically-unrolled triangle loop
        verts, tris = _random_scene(40, seed=31, size=3.0)
        geom = _make_geom(verts, tris)
        rays = _random_rays(1024, seed=32)
        hb = trace_closest_brute(geom, rays)
        hp = bp(geom, rays, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(hb.prim >= 0), np.asarray(hp.prim >= 0)
        )
        mask = np.asarray(hb.prim) >= 0
        np.testing.assert_allclose(
            np.asarray(hb.t)[mask], np.asarray(hp.t)[mask], rtol=1e-4, atol=1e-5
        )
        # slots agree except at exactly-equal-t ties
        diff = mask & (np.asarray(hb.prim) != np.asarray(hp.prim))
        tb, tp = np.asarray(hb.t), np.asarray(hp.t)
        assert np.all(np.abs(tb[diff] - tp[diff]) < 1e-3)

    def test_any_matches_xla(self):
        from luisarender_tpu.accel.traverse import trace_any_brute
        from luisarender_tpu.ops.brute_pallas import trace_any_pallas as ap

        verts, tris = _random_scene(40, seed=33, size=3.0)
        geom = _make_geom(verts, tris)
        rays = _random_rays(1024, seed=34)
        rays = rays._replace(t_max=jnp.full(rays.t_max.shape, 20.0))
        ob = trace_any_brute(geom, rays)
        op = ap(geom, rays, interpret=True)
        np.testing.assert_array_equal(np.asarray(ob), np.asarray(op))

    def test_zero_gradient_vjp(self):
        """The custom VJP must hand back zero cotangents (detached-sampling
        contract, brute_pallas.py docstring) instead of raising."""
        import jax

        from luisarender_tpu.ops.brute_pallas import trace_closest_pallas as bp

        verts, tris = _random_scene(20, seed=35)
        geom = _make_geom(verts, tris)
        rays = _random_rays(256, seed=36)

        def loss(o):
            h = bp(geom, rays._replace(origin=o), interpret=True)
            return jnp.sum(jnp.where(jnp.isfinite(h.t), h.t, 0.0))

        g = jax.grad(loss)(rays.origin)
        assert np.all(np.asarray(g) == 0.0)
