"""Subpacket MXU tracer (ops/subpacket_pallas.py) vs brute force.

Interpret mode on CPU (the TPU path is exercised by bench/verify runs).
The Woop-transform test is algebraically rearranged vs Möller-Trumbore, so
t agrees to ~1e-4 and near-tie winners may differ on a tiny fraction of
rays; the NaN-bary contract (exact u/v recomputed in scene/geometry.py) is
tested end-to-end here as well.
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
from luisarender_tpu.ops import subpacket_pallas as sp


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


def _tables(positions, triangles, opaque, T):
    bvh4 = build_bvh(positions, triangles, leaf_size=4)
    node_tab, tri_tab = cp.build_cluster_tables(
        positions, triangles, opaque, _canonical(bvh4, T)
    )
    woop = sp.build_woop_table(tri_tab)
    slab8, meta8 = sp.build_slab_meta(sp.build_bvh8(node_tab))
    return bvh4, (slab8, meta8), woop


def _rays(rng, N, t_max=3e38):
    o = rng.uniform(-0.5, 1.5, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Ray(
        jnp.asarray(o), jnp.asarray(d), jnp.full(N, 1e-4), jnp.full(N, t_max)
    )


@pytest.mark.parametrize("T", [100, 700, 8000])
def test_subpacket_closest_matches_brute(T):
    # T=100/700 collapse to a single 8-wide node; T=8000 exercises a DEEP
    # BVH8 (multi-level traversal, empty-slot slab constants, stack) —
    # the round-4 empty-slot re-push bug was invisible at N8=1
    positions, triangles = _soup(T)
    rng = np.random.default_rng(7)
    opaque = rng.uniform(size=T) > 0.3
    bvh4, (slab8, meta8), woop = _tables(positions, triangles, opaque, T)
    geom = _brute_geom(positions, triangles, bvh4, opaque, T)

    rays = _rays(rng, 1500)
    ref = trace_closest_brute(geom, rays)
    new = sp.trace_closest_subpacket(
        jnp.asarray(slab8), jnp.asarray(meta8), jnp.asarray(woop), rays,
        interpret=True,
    )
    t_ref, t_new = np.asarray(ref.t), np.asarray(new.t)
    # hit/miss agreement except within f32 rounding of a silhouette edge
    miss_flip = np.isinf(t_ref) != np.isinf(t_new)
    assert miss_flip.mean() < 0.005, f"{miss_flip.sum()} hit/miss flips"
    h = np.isfinite(t_ref) & np.isfinite(t_new)
    assert np.allclose(t_new[h], t_ref[h], rtol=2e-4, atol=1e-4)
    slot_ok = np.asarray(new.prim)[h] == np.asarray(ref.prim)[h]
    assert slot_ok.mean() > 0.995, f"{(~slot_ok).sum()} winner flips"
    # NaN-bary contract
    assert np.all(np.isnan(np.asarray(new.bary)[h]))


def test_subpacket_any_matches_brute():
    T = 700
    positions, triangles = _soup(T, seed=2)
    rng = np.random.default_rng(9)
    opaque = rng.uniform(size=T) > 0.4
    bvh4, (slab8, meta8), woop = _tables(positions, triangles, opaque, T)
    geom = _brute_geom(positions, triangles, bvh4, opaque, T)

    rays = _rays(rng, 1500, t_max=1.0)
    ref = np.asarray(trace_any_brute(geom, rays))
    new = np.asarray(
        sp.trace_any_subpacket(
            jnp.asarray(slab8), jnp.asarray(meta8), jnp.asarray(woop), rays,
            interpret=True,
        )
    )
    assert (ref == new).mean() > 0.998


def test_nan_bary_interaction_recompute(monkeypatch):
    """surface_interaction recomputes exact (u, v) for NaN-bary hits from
    the shade row — positions/uv must match the brute tracer's bary path.
    The recompute is only EMITTED when the subpacket tracer is enabled
    (ADVICE r4: default tracers' bary is already exact), so enable it."""
    from luisarender_tpu.core.types import Hit
    from luisarender_tpu.scene.geometry import (
        build_shade_table,
        surface_interaction,
    )

    monkeypatch.setattr(sp, "ENABLED", True)

    T = 100
    positions, triangles = _soup(T, seed=3)
    rng = np.random.default_rng(11)
    opaque = np.ones(T, bool)
    bvh4, (slab8, meta8), woop = _tables(positions, triangles, opaque, T)
    geom = _brute_geom(positions, triangles, bvh4, opaque, T)
    shade = build_shade_table(
        positions,
        np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (len(positions), 1)),
        np.zeros((len(positions), 2), np.float32),
        triangles,
        np.zeros(T, np.int32),
        bvh4.prim_index,
    )
    arrays = {"trace": {"shade_table": jnp.asarray(shade)}}

    rays = _rays(rng, 400)
    ref = trace_closest_brute(geom, rays)
    nan_hit = Hit(
        inst=ref.inst,
        prim=ref.prim,
        bary=jnp.full_like(ref.bary, jnp.nan),
        t=ref.t,
    )
    it_ref = surface_interaction(arrays, ref, rays)
    it_nan = surface_interaction(arrays, nan_hit, rays)
    h = np.asarray(ref.prim) >= 0
    p_ref = np.asarray(it_ref.p)[h]
    p_nan = np.asarray(it_nan.p)[h]
    assert np.allclose(p_nan, p_ref, rtol=1e-4, atol=1e-4)
    assert np.array_equal(np.asarray(it_nan.valid), np.asarray(it_ref.valid))
    # no NaN leaks anywhere, including miss lanes
    for f in (it_nan.p, it_nan.uv, it_nan.ns):
        assert np.all(np.isfinite(np.asarray(f)))


# ---------------------------------------------------------------------------
# Wide-block BVH8 tracer (ops/wide8_pallas.py): same tables, 2048-ray
# shared stack, MT Phase B with exact bary
# ---------------------------------------------------------------------------


def _wide_tables(positions, triangles, opaque, T):
    from luisarender_tpu.ops import wide8_pallas as wp

    bvh4 = build_bvh(positions, triangles, leaf_size=4)
    node_tab, tri_tab = cp.build_cluster_tables(
        positions, triangles, opaque, _canonical(bvh4, T)
    )
    slab8, meta8 = sp.build_slab_meta(sp.build_bvh8(node_tab))
    cboxes = wp.build_cluster_boxes(node_tab)
    return bvh4, slab8, meta8, cboxes, tri_tab


@pytest.mark.parametrize("T", [700, 8000])
def test_wide8_closest_matches_brute(T):
    from luisarender_tpu.ops import wide8_pallas as wp

    positions, triangles = _soup(T)
    rng = np.random.default_rng(7)
    opaque = rng.uniform(size=T) > 0.3
    bvh4, slab8, meta8, cboxes, tri_tab = _wide_tables(
        positions, triangles, opaque, T
    )
    geom = _brute_geom(positions, triangles, bvh4, opaque, T)

    rays = _rays(rng, 1500)
    ref = trace_closest_brute(geom, rays)
    new = wp.trace_closest_wide8(
        jnp.asarray(slab8), jnp.asarray(meta8), jnp.asarray(cboxes),
        jnp.asarray(tri_tab), rays, interpret=True,
    )
    # MT Phase B: exact agreement expected (same test as brute force)
    assert np.array_equal(
        np.isinf(np.asarray(ref.t)), np.isinf(np.asarray(new.t))
    )
    h = np.isfinite(np.asarray(ref.t))
    assert np.allclose(
        np.asarray(new.t)[h], np.asarray(ref.t)[h], rtol=1e-5, atol=1e-6
    )
    assert np.array_equal(np.asarray(new.prim)[h], np.asarray(ref.prim)[h])
    assert np.allclose(
        np.asarray(new.bary)[h], np.asarray(ref.bary)[h], atol=1e-5
    )


def test_wide8_any_matches_brute():
    from luisarender_tpu.ops import wide8_pallas as wp

    T = 8000
    positions, triangles = _soup(T, seed=2)
    rng = np.random.default_rng(9)
    opaque = rng.uniform(size=T) > 0.4
    bvh4, slab8, meta8, cboxes, tri_tab = _wide_tables(
        positions, triangles, opaque, T
    )
    geom = _brute_geom(positions, triangles, bvh4, opaque, T)

    rays = _rays(rng, 1500, t_max=1.0)
    ref = np.asarray(trace_any_brute(geom, rays))
    new = np.asarray(
        wp.trace_any_wide8(
            jnp.asarray(slab8), jnp.asarray(meta8), jnp.asarray(cboxes),
            jnp.asarray(tri_tab), rays, interpret=True,
        )
    )
    assert np.array_equal(ref, new)
