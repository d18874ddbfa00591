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
