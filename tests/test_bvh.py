"""BVH correctness vs brute-force intersection (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from luisarender_tpu.accel.bvh import build_bvh
from luisarender_tpu.accel.traverse import (
    TraceGeometry,
    trace_closest_brute,
    trace_closest_bvh,
)
from luisarender_tpu.core.types import make_ray


def _make_geom(positions, triangles):
    bvh = build_bvh(positions, triangles)
    sorted_tris = triangles[np.maximum(bvh.prim_index, 0)]
    v0 = positions[sorted_tris[:, 0]]
    v1 = positions[sorted_tris[:, 1]]
    v2 = positions[sorted_tris[:, 2]]
    return TraceGeometry(
        tri_v0=jnp.asarray(v0),
        tri_e1=jnp.asarray(v1 - v0),
        tri_e2=jnp.asarray(v2 - v0),
        prim_index=jnp.asarray(bvh.prim_index),
        tri_opaque=jnp.asarray(bvh.prim_index >= 0),
        aabb_min=jnp.asarray(bvh.aabb_min),
        aabb_max=jnp.asarray(bvh.aabb_max),
        skip=jnp.asarray(bvh.skip),
        node_first=jnp.asarray(bvh.node_first),
        node_count=jnp.asarray(bvh.node_count),
        leaf_size=bvh.leaf_size,
        num_tris=triangles.shape[0],
    )


def _random_scene(n_tris, seed=0, spread=10.0, size=0.5):
    rs = np.random.RandomState(seed)
    centers = rs.randn(n_tris, 3).astype(np.float32) * spread
    offsets = rs.randn(n_tris, 3, 3).astype(np.float32) * size
    verts = (centers[:, None, :] + offsets).reshape(-1, 3)
    tris = np.arange(n_tris * 3, dtype=np.int32).reshape(-1, 3)
    return verts, tris


def _random_rays(n_rays, seed=1, spread=12.0):
    rs = np.random.RandomState(seed)
    o = rs.randn(n_rays, 3).astype(np.float32) * spread
    d = rs.randn(n_rays, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return make_ray(jnp.asarray(o), jnp.asarray(d))


class TestBVHvsBruteForce:
    def test_closest_hit_matches(self):
        verts, tris = _random_scene(500, seed=0)
        geom = _make_geom(verts, tris)
        rays = _random_rays(2000, seed=1)
        hb = trace_closest_brute(geom, rays)
        ht = trace_closest_bvh(geom, rays)
        t_b = np.asarray(hb.t)
        t_t = np.asarray(ht.t)
        prim_b = np.asarray(hb.prim)
        prim_t = np.asarray(ht.prim)
        hit_b = prim_b >= 0
        hit_t = prim_t >= 0
        np.testing.assert_array_equal(hit_b, hit_t)
        np.testing.assert_allclose(t_b[hit_b], t_t[hit_b], rtol=1e-4, atol=1e-5)
        # prim ids can differ only at exactly-equal t (coplanar overlap)
        diff = hit_b & (prim_b != prim_t)
        assert np.all(np.abs(t_b[diff] - t_t[diff]) < 1e-4)

    def test_degenerate_and_axis_aligned(self):
        # axis-aligned quad grid with rays parallel to some triangles
        xs, ys = np.meshgrid(np.arange(4.0), np.arange(4.0))
        quads = []
        for x, y in zip(xs.ravel(), ys.ravel()):
            quads.append([[x, y, 0], [x + 1, y, 0], [x + 1, y + 1, 0]])
            quads.append([[x, y, 0], [x + 1, y + 1, 0], [x, y + 1, 0]])
        verts = np.asarray(quads, np.float32).reshape(-1, 3)
        tris = np.arange(len(verts), dtype=np.int32).reshape(-1, 3)
        geom = _make_geom(verts, tris)
        rays = _random_rays(500, seed=3, spread=4.0)
        hb = trace_closest_brute(geom, rays)
        ht = trace_closest_bvh(geom, rays)
        np.testing.assert_array_equal(np.asarray(hb.prim >= 0), np.asarray(ht.prim >= 0))
        mask = np.asarray(hb.prim) >= 0
        np.testing.assert_allclose(
            np.asarray(hb.t)[mask], np.asarray(ht.t)[mask], rtol=1e-4, atol=1e-5
        )

    def test_t_range_respected(self):
        verts, tris = _random_scene(100, seed=5)
        geom = _make_geom(verts, tris)
        rays = _random_rays(500, seed=6)
        h_full = trace_closest_bvh(geom, rays)
        # cap t_max below every hit -> everything misses
        t = np.asarray(h_full.t)
        finite = np.isfinite(t)
        capped = rays._replace(
            t_max=jnp.where(jnp.isfinite(h_full.t), h_full.t * 0.5, 1e-3)
        )
        h_capped = trace_closest_bvh(geom, capped)
        assert not np.any(np.asarray(h_capped.prim)[finite] >= 0)

    def test_barycentrics_reconstruct_point(self):
        verts, tris = _random_scene(200, seed=7)
        geom = _make_geom(verts, tris)
        rays = _random_rays(1000, seed=8)
        h = trace_closest_bvh(geom, rays)
        hit = np.asarray(h.prim) >= 0
        slot = np.asarray(h.prim)[hit]  # sorted-slot convention
        u = np.asarray(h.bary)[hit, 0]
        v = np.asarray(h.bary)[hit, 1]
        p0 = np.asarray(geom.tri_v0)[slot]
        e1 = np.asarray(geom.tri_e1)[slot]
        e2 = np.asarray(geom.tri_e2)[slot]
        p = p0 + u[:, None] * e1 + v[:, None] * e2
        o = np.asarray(rays.origin)[hit]
        d = np.asarray(rays.direction)[hit]
        t = np.asarray(h.t)[hit]
        np.testing.assert_allclose(o + t[:, None] * d, p, atol=1e-3)


class TestNativeSAHBuilder:
    def test_native_matches_brute(self):
        from luisarender_tpu.accel.native import build_bvh_sah, native_available

        if not native_available():
            import pytest

            pytest.skip("native toolchain unavailable")
        verts, tris = _random_scene(800, seed=11)
        bvh = build_bvh_sah(verts, tris)
        assert bvh is not None
        sorted_tris = tris[np.maximum(bvh.prim_index, 0)]
        v0 = verts[sorted_tris[:, 0]]
        v1 = verts[sorted_tris[:, 1]]
        v2 = verts[sorted_tris[:, 2]]
        geom = TraceGeometry(
            tri_v0=jnp.asarray(v0),
            tri_e1=jnp.asarray(v1 - v0),
            tri_e2=jnp.asarray(v2 - v0),
            prim_index=jnp.asarray(bvh.prim_index),
            tri_opaque=jnp.asarray(bvh.prim_index >= 0),
            aabb_min=jnp.asarray(bvh.aabb_min),
            aabb_max=jnp.asarray(bvh.aabb_max),
            skip=jnp.asarray(bvh.skip),
            node_first=jnp.asarray(bvh.node_first),
            node_count=jnp.asarray(bvh.node_count),
            leaf_size=bvh.leaf_size,
            num_tris=tris.shape[0],
        )
        rays = _random_rays(2000, seed=12)
        hb = trace_closest_brute(geom, rays)
        ht = trace_closest_bvh(geom, rays)
        np.testing.assert_array_equal(
            np.asarray(hb.prim >= 0), np.asarray(ht.prim >= 0)
        )
        mask = np.asarray(hb.prim) >= 0
        np.testing.assert_allclose(
            np.asarray(hb.t)[mask], np.asarray(ht.t)[mask], rtol=1e-4, atol=1e-5
        )

    def test_preorder_invariants(self):
        from luisarender_tpu.accel.native import build_bvh_sah, native_available

        if not native_available():
            import pytest

            pytest.skip("native toolchain unavailable")
        verts, tris = _random_scene(300, seed=13)
        bvh = build_bvh_sah(verts, tris)
        first = np.asarray(bvh.node_first)
        count = np.asarray(bvh.node_count)
        order = np.asarray(bvh.prim_index)
        # every primitive appears exactly once across leaves
        covered = np.concatenate(
            [order[f : f + c] for f, c in zip(first, count) if c > 0]
        )
        assert sorted(covered.tolist()) == list(range(tris.shape[0]))
