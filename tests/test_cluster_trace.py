"""Cluster-streaming Pallas tracer (ops/cluster_pallas.py) vs brute force.

Runs the kernel in interpret mode on CPU (the TPU path is exercised by
bench/verify runs; the kernel body is identical). Mirrors the validation in
tests/test_pallas_trace.py for the packet kernel.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from luisarender_tpu.accel.bvh import build_bvh
from luisarender_tpu.accel.traverse import (
    TraceGeometry,
    trace_any_brute,
    trace_closest_brute,
)
from luisarender_tpu.core.types import Ray
from luisarender_tpu.ops import cluster_pallas as cp


def _soup(T, seed=1):
    rng = np.random.default_rng(seed)
    c = rng.uniform(0, 1, (T, 3)).astype(np.float32)
    a = (c + rng.normal(0, 0.05, (T, 3))).astype(np.float32)
    b = (c + rng.normal(0, 0.05, (T, 3))).astype(np.float32)
    d = (c + rng.normal(0, 0.05, (T, 3))).astype(np.float32)
    positions = np.concatenate([a, b, d], 0).astype(np.float32)
    triangles = np.stack(
        [np.arange(T), np.arange(T) + T, np.arange(T) + 2 * T], 1
    ).astype(np.int32)
    return positions, triangles


def _canonical(bvh, T):
    canon = np.full(T, -1, np.int64)
    valid = bvh.prim_index >= 0
    canon[bvh.prim_index[valid]] = np.nonzero(valid)[0]
    return canon


def _brute_geom(positions, triangles, bvh, opaque, T):
    valid = bvh.prim_index >= 0
    safe = np.where(valid, bvh.prim_index, 0)
    v0 = positions[triangles[safe, 0]]
    v1 = positions[triangles[safe, 1]]
    v2 = positions[triangles[safe, 2]]
    return TraceGeometry(
        tri_v0=jnp.asarray(v0),
        tri_e1=jnp.asarray(v1 - v0),
        tri_e2=jnp.asarray(v2 - v0),
        prim_index=jnp.asarray(
            np.where(valid, np.arange(len(safe)), -1).astype(np.int32)
        ),
        tri_opaque=jnp.asarray(np.where(valid, opaque[safe], False)),
        aabb_min=jnp.zeros((1, 3)),
        aabb_max=jnp.zeros((1, 3)),
        skip=jnp.zeros(1, jnp.int32),
        node_first=jnp.zeros(1, jnp.int32),
        node_count=jnp.zeros(1, jnp.int32),
        leaf_size=4,
        num_tris=T,
    )


@pytest.mark.parametrize("T", [100, 700])  # 1 cluster; multi-level tree
def test_cluster_closest_matches_brute(T):
    positions, triangles = _soup(T)
    rng = np.random.default_rng(7)
    opaque = rng.uniform(size=T) > 0.3
    bvh4 = build_bvh(positions, triangles, leaf_size=4)
    node_tab, tri_tab = cp.build_cluster_tables(
        positions, triangles, opaque, _canonical(bvh4, T)
    )
    geom = _brute_geom(positions, triangles, bvh4, opaque, T)

    N = 1500
    o = rng.uniform(-0.5, 1.5, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Ray(
        jnp.asarray(o), jnp.asarray(d), jnp.full(N, 1e-4), jnp.full(N, 3e38)
    )

    ref = trace_closest_brute(geom, rays)
    new = cp.trace_closest_cluster(
        jnp.asarray(node_tab), jnp.asarray(tri_tab), rays, interpret=True
    )
    t_ref, t_new = np.asarray(ref.t), np.asarray(new.t)
    assert np.array_equal(np.isinf(t_ref), np.isinf(t_new))
    h = np.isfinite(t_ref)
    assert np.allclose(t_new[h], t_ref[h], rtol=1e-4, atol=1e-5)
    # canonical slots must index the same shade rows as every other tracer
    assert np.array_equal(np.asarray(new.prim)[h], np.asarray(ref.prim)[h])


def test_cluster_any_matches_brute():
    T = 700
    positions, triangles = _soup(T, seed=2)
    rng = np.random.default_rng(9)
    opaque = rng.uniform(size=T) > 0.4  # mix of shadow-transparent tris
    bvh4 = build_bvh(positions, triangles, leaf_size=4)
    node_tab, tri_tab = cp.build_cluster_tables(
        positions, triangles, opaque, _canonical(bvh4, T)
    )
    geom = _brute_geom(positions, triangles, bvh4, opaque, T)

    N = 1500
    o = rng.uniform(-0.5, 1.5, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Ray(
        jnp.asarray(o), jnp.asarray(d), jnp.full(N, 1e-4), jnp.full(N, 1.0)
    )
    ref = np.asarray(trace_any_brute(geom, rays))
    new = np.asarray(
        cp.trace_any_cluster(
            jnp.asarray(node_tab), jnp.asarray(tri_tab), rays, interpret=True
        )
    )
    assert np.array_equal(ref, new)


def test_compiler_attaches_cluster_tables(monkeypatch):
    """Scenes above the brute-force threshold get cluster tables; the
    canonical-slot column round-trips through the sorted order. The
    BVH8/Woop side tables only ride along when an experimental tracer is
    enabled (default renders skip the ~4x-footprint build, ADVICE r4)."""
    import luisarender_tpu as lr
    from luisarender_tpu import testing
    from luisarender_tpu.ops import subpacket_pallas as _sp_mod

    monkeypatch.setattr(_sp_mod, "ENABLED", True)

    d = testing.cornell_box(resolution=(16, 16), spp=1)
    # add a subdivided sphere to push past BRUTE_FORCE_MAX_TRIS
    d["render"]["shapes"].append(
        {
            "impl": "sphere",
            "prop": {
                "analytic": False,  # this test exercises the TRIANGLE tracers
                "subdivision": 3,
                "surface": {
                    "impl": "matte",
                    "prop": {
                        "Kd": {"impl": "constant", "prop": {"v": [0.5, 0.5, 0.5]}}
                    },
                },
                "transform": {
                    "impl": "srt",
                    "prop": {"scale": [80, 80, 80], "translate": [275, 275, 280]},
                },
            },
        }
    )
    compiled = lr.compile_scene(lr.Scene.from_dict(d))
    tr = compiled.arrays["trace"]
    assert "cluster_nodes" in tr and "cluster_tris" in tr
    assert tr["cluster_tris"].shape[1:] == (cp.TRI_COLS, cp.CLUSTER)
    # subpacket-tracer tables (ops/subpacket_pallas.py) ride along
    assert "cluster_slab8" in tr and "cluster_meta8" in tr
    from luisarender_tpu.ops import subpacket_pallas as _sp
    assert tr["cluster_slab8"].shape[1:] == (8, _sp.SLAB_COLS)
    assert tr["cluster_meta8"].shape[0] == tr["cluster_slab8"].shape[0]
    assert tr["cluster_cboxes"].shape == (tr["cluster_tris"].shape[0], 8)
    # every valid canonical slot appears exactly once
    slots = np.asarray(tr["cluster_tris"])[:, 11, :].ravel()
    valid = np.asarray(tr["cluster_tris"])[:, 9, :].ravel() > 0
    got = np.sort(slots[valid].astype(np.int64))
    assert np.array_equal(got, np.arange(compiled.plan.num_tris))


def test_sorted_path_matches_unsorted(monkeypatch):
    """The coherence-sort wrapper (cluster_pallas._trace sorts rays into
    Morton packets and sorts hits back by the carried original index) must be
    a pure permutation round-trip: bit-identical t/slot/bary vs tracing the
    same rays below the sort threshold. Regression test: an earlier
    formulation applied the permutation with gather + .at[perm].set scatter,
    and the int32 slot payload (bitcast through f32) was corrupted inside an
    XLA scatter fusion at production ray counts — renders went black while
    every small-scene test stayed green."""
    T = 700
    positions, triangles = _soup(T)
    rng = np.random.default_rng(11)
    opaque = rng.uniform(size=T) > 0.3
    bvh4 = build_bvh(positions, triangles, leaf_size=4)
    node_tab, tri_tab = cp.build_cluster_tables(
        positions, triangles, opaque, _canonical(bvh4, T)
    )

    N = 4096
    o = rng.uniform(-0.5, 1.5, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Ray(
        jnp.asarray(o), jnp.asarray(d), jnp.full(N, 1e-4), jnp.full(N, 3e38)
    )

    ref = cp.trace_closest_cluster(
        jnp.asarray(node_tab), jnp.asarray(tri_tab), rays, interpret=True
    )  # N < MIN_SORT_RAYS: unsorted
    monkeypatch.setattr(cp, "MIN_SORT_RAYS", 1024)
    srt = cp.trace_closest_cluster(
        jnp.asarray(node_tab), jnp.asarray(tri_tab), rays, interpret=True
    )
    assert np.array_equal(
        np.nan_to_num(np.asarray(ref.t), posinf=1e30),
        np.nan_to_num(np.asarray(srt.t), posinf=1e30),
    )
    assert np.array_equal(np.asarray(ref.prim), np.asarray(srt.prim))
    assert np.array_equal(np.asarray(ref.bary), np.asarray(srt.bary))
    occ_ref = cp.trace_any_cluster(
        jnp.asarray(node_tab), jnp.asarray(tri_tab), rays, interpret=True
    )
    monkeypatch.setattr(cp, "MIN_SORT_RAYS", 1 << 30)
    occ_uns = cp.trace_any_cluster(
        jnp.asarray(node_tab), jnp.asarray(tri_tab), rays, interpret=True
    )
    assert np.array_equal(np.asarray(occ_ref), np.asarray(occ_uns))
