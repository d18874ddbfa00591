"""Device-side ray intersection: brute force and stackless BVH traversal.

TPU-native equivalent of the reference's `Accel::intersect/intersect_any`
(/root/reference/src/base/geometry.cpp:218-279, backed by OptiX/DXR hardware
traversal). Here both paths are pure JAX over batched SoA rays:

- Brute force: every ray tests every triangle, chunked to bound memory. For
  small scenes (Cornell-box class) this is *faster* than any tree on TPU —
  it is one dense, perfectly-regular vector computation with zero gathers.
- BVH: stackless skip-link traversal of the heap-layout tree built in bvh.py,
  a single `lax.while_loop` over (node_index, best_hit) per ray. All rays
  share one instruction stream; divergence costs only masked work.
- Pallas (ops/brute_pallas.py): brute force with the triangle table resident
  in VMEM — no HBM intermediates; 9.6x faster than the XLA brute force on
  v5e; used automatically on TPU for small scenes.

Triangle test: Möller–Trumbore, batched.

Hit.prim convention: all tracers return the SORTED primitive slot (the index
into the Morton/SAH-sorted tri_v0/tri_e1/tri_e2 arrays and the packed shade
table, scene/geometry.py) — NOT the original triangle id; -1 = miss.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Hit

# Scenes with at most this many triangles use brute force (auto mode).
BRUTE_FORCE_MAX_TRIS = 512


class TraceGeometry(NamedTuple):
    """Device-resident intersection data (see compiler.py for construction).

    Triangle vertices are pre-gathered into Morton-sorted (P, 3, 3) arrays so
    leaf tests read contiguous memory and need no index chasing.
    """

    tri_v0: jnp.ndarray  # (P, 3) float32, sorted prim order, padded
    tri_e1: jnp.ndarray  # (P, 3) v1 - v0
    tri_e2: jnp.ndarray  # (P, 3) v2 - v0
    prim_index: jnp.ndarray  # (P,) int32 original triangle id (-1 padding)
    tri_opaque: jnp.ndarray  # (P,) bool: blocks shadow rays (null-surface
    # medium boundaries don't — geometry.cpp alpha/visibility analogue)
    aabb_min: jnp.ndarray  # (N, 3)
    aabb_max: jnp.ndarray  # (N, 3)
    skip: jnp.ndarray  # (N,) int32 preorder skip links
    node_first: jnp.ndarray  # (N,) int32 leaf first prim slot (-1 interior)
    node_count: jnp.ndarray  # (N,) int32 leaf prim count (0 interior)
    leaf_size: int  # static
    num_tris: int  # static (unpadded count)
    # large-scene cluster tracer tables (ops/cluster_pallas.py); None when
    # the scene is small enough for brute force / not compiled for TPU
    cluster_nodes: jnp.ndarray | None = None  # (N', 8) f32
    cluster_tris: jnp.ndarray | None = None  # (C, 16, 128) f32
    # Woop coefficient blocks + matmul-ready 8-wide BVH tables for the
    # subpacket MXU tracer (ops/subpacket_pallas.py)
    cluster_woop: jnp.ndarray | None = None  # (C, 8, 1024) f32
    cluster_slab8: jnp.ndarray | None = None  # (N8, 8, 128) f32
    cluster_meta8: jnp.ndarray | None = None  # (N8, 16) f32
    cluster_cboxes: jnp.ndarray | None = None  # (C, 8) f32 leaf AABBs
    # analytic-sphere table (scene/compiler.py): 0:3 center, 3 radius,
    # 4:13 rotation (row-major), 13 instance id, 14 opaque; sphere hits
    # return prim = P + sphere_index (P = padded tri-slot count)
    sph: jnp.ndarray | None = None  # (S, 16) f32


def intersect_tri(o, d, v0, e1, e2):
    """Möller–Trumbore. All args (..., 3). Returns (valid, t, u, v)."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    valid = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
    )
    return valid, t, u, v


def _slab_test(o, inv_d, t_min, t_max, box_min, box_max):
    """Ray-AABB slab test; box_* broadcastable against o."""
    t0 = (box_min - o) * inv_d
    t1 = (box_max - o) * inv_d
    near = jnp.minimum(t0, t1)
    far = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(near, axis=-1), t_min)
    t_far = jnp.minimum(jnp.min(far, axis=-1), t_max)
    return t_near <= t_far


def _safe_inv(d):
    tiny = 1e-12
    return 1.0 / jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)


_KEY_INVALID = jnp.int32(0x7F7FFFFF)  # bit pattern of float32 max — sorts last


def _packed_chunk_min(geom, rays, chunk):
    """Shared core of the brute-force tracers: for each ray, the minimum of a
    *key-packed* (t, local index) over every triangle chunk.

    The classic argmin + take_along_axis formulation forces XLA to
    materialize the full (n_rays, n_tris) t/u/v arrays in HBM (measured 7x
    slower on TPU). Instead we pack the triangle's chunk-local index into the
    low bits of t's IEEE bit pattern (positive floats compare like ints), so
    the whole intersect + select is ONE fused min-reduction with no
    intermediates; exact t/u/v are recomputed afterwards for the single
    winning triangle per ray.
    """
    o, d = rays.origin, rays.direction
    p_total = geom.tri_v0.shape[0]
    # NOTE: padding the chunk to 128 lanes was measured SLOWER end-to-end
    # (5.1 vs 6.7 Mray/s on Cornell): the 4x extra triangle tests beat the
    # lane-fill gain. XLA handles narrow minor dims adequately here.
    chunk = min(chunk, p_total)
    idx_bits = max((chunk - 1).bit_length(), 1)
    idx_mask = (1 << idx_bits) - 1
    n_chunks = -(-p_total // chunk)
    pad = n_chunks * chunk - p_total

    v0 = jnp.pad(geom.tri_v0, ((0, pad), (0, 0)))
    e1 = jnp.pad(geom.tri_e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(geom.tri_e2, ((0, pad), (0, 0)))
    pid = jnp.pad(geom.prim_index, (0, pad), constant_values=-1)

    def chunk_key(c):
        s = c * chunk
        cv0 = jax.lax.dynamic_slice_in_dim(v0, s, chunk)
        ce1 = jax.lax.dynamic_slice_in_dim(e1, s, chunk)
        ce2 = jax.lax.dynamic_slice_in_dim(e2, s, chunk)
        cpid = jax.lax.dynamic_slice_in_dim(pid, s, chunk)
        valid, t, _, _ = intersect_tri(
            o[..., None, :], d[..., None, :], cv0, ce1, ce2
        )
        valid &= (t > rays.t_min[..., None]) & (t < rays.t_max[..., None]) & (
            cpid >= 0
        )
        t = jnp.clip(t, 1e-7, 3e37)
        local = jax.lax.broadcasted_iota(jnp.int32, t.shape, t.ndim - 1)
        key = (t.view(jnp.int32) & jnp.int32(~idx_mask)) | local
        key = jnp.where(valid, key, _KEY_INVALID)
        return jnp.min(key, axis=-1)

    def body(c, best):
        best_key, best_chunk = best
        key = chunk_key(c)
        better = key < best_key
        return (
            jnp.where(better, key, best_key),
            jnp.where(better, c, best_chunk),
        )

    # inits derive from ray origins so they inherit shard_map's varying-axes
    # status (fresh constants would be "replicated" and fail the vma check)
    zero_i = jnp.zeros_like(o[..., 0], dtype=jnp.int32)
    if n_chunks == 1:
        best_key, best_chunk = chunk_key(0), zero_i
    else:
        best_key, best_chunk = jax.lax.fori_loop(
            0, n_chunks, body, (zero_i + _KEY_INVALID, zero_i)
        )
    found = best_key != _KEY_INVALID
    sorted_idx = best_chunk * chunk + (best_key & idx_mask)
    sorted_idx = jnp.where(found, sorted_idx, 0)
    return found, sorted_idx


def trace_closest_brute(geom: TraceGeometry, rays, chunk: int = 512) -> Hit:
    """Closest hit by fused key-packed min + exact recompute on the winner."""
    found, sorted_idx = _packed_chunk_min(geom, rays, chunk)
    cv0 = geom.tri_v0[sorted_idx]
    ce1 = geom.tri_e1[sorted_idx]
    ce2 = geom.tri_e2[sorted_idx]
    valid, t, u, v = intersect_tri(rays.origin, rays.direction, cv0, ce1, ce2)
    found &= valid
    prim = jnp.where(found, sorted_idx, -1)
    return Hit(
        inst=jnp.where(found, jnp.int32(0), jnp.int32(-1)),  # inst filled by caller
        prim=prim,
        bary=jnp.stack(
            [jnp.where(found, u, 0.0), jnp.where(found, v, 0.0)], axis=-1
        ),
        t=jnp.where(found, t, jnp.inf),
    )


def trace_any_brute(geom: TraceGeometry, rays, chunk: int = 512):
    """Occlusion-only test: pure any-reduce, zero materialized intermediates."""
    o, d = rays.origin, rays.direction
    p_total = geom.tri_v0.shape[0]
    chunk = min(chunk, p_total)
    n_chunks = -(-p_total // chunk)
    pad = n_chunks * chunk - p_total
    v0 = jnp.pad(geom.tri_v0, ((0, pad), (0, 0)))
    e1 = jnp.pad(geom.tri_e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(geom.tri_e2, ((0, pad), (0, 0)))
    pid = jnp.pad(geom.prim_index, (0, pad), constant_values=-1)

    opq = jnp.pad(geom.tri_opaque, (0, pad), constant_values=False)

    def chunk_any(c):
        s = c * chunk
        cv0 = jax.lax.dynamic_slice_in_dim(v0, s, chunk)
        ce1 = jax.lax.dynamic_slice_in_dim(e1, s, chunk)
        ce2 = jax.lax.dynamic_slice_in_dim(e2, s, chunk)
        cpid = jax.lax.dynamic_slice_in_dim(pid, s, chunk)
        copq = jax.lax.dynamic_slice_in_dim(opq, s, chunk)
        valid, t, _, _ = intersect_tri(
            o[..., None, :], d[..., None, :], cv0, ce1, ce2
        )
        valid &= (t > rays.t_min[..., None]) & (t < rays.t_max[..., None]) & (
            cpid >= 0
        ) & copq
        return jnp.any(valid, axis=-1)

    if n_chunks == 1:
        return chunk_any(0)
    zero_b = jnp.zeros_like(o[..., 0], dtype=bool)
    return jax.lax.fori_loop(
        0, n_chunks, lambda c, acc: acc | chunk_any(c), zero_b
    )


def trace_closest_bvh(geom: TraceGeometry, rays, opaque_only: bool = False) -> Hit:
    """Stackless skip-link traversal; one while_loop over batched rays.

    opaque_only: skip shadow-transparent triangles (shadow-ray variant)."""
    o, d = rays.origin, rays.direction
    inv_d = _safe_inv(d)
    shape = o.shape[:-1]
    leaf_size = geom.leaf_size

    def cond(state):
        node, *_ = state
        return jnp.any(node >= 0)

    def body(state):
        node, best_t, best_prim, best_u, best_v = state
        active = node >= 0
        node_c = jnp.maximum(node, 0)
        bmin = geom.aabb_min[node_c]
        bmax = geom.aabb_max[node_c]
        hit_box = active & _slab_test(o, inv_d, rays.t_min, best_t, bmin, bmax)
        count = geom.node_count[node_c]
        is_leaf = count > 0

        # Leaf: test the node's triangles (static small loop, unrolled).
        do_leaf = hit_box & is_leaf
        base = jnp.maximum(geom.node_first[node_c], 0)
        for j in range(leaf_size):
            pidx = jnp.minimum(base + j, geom.prim_index.shape[0] - 1)
            valid, t, u, v = intersect_tri(
                o, d, geom.tri_v0[pidx], geom.tri_e1[pidx], geom.tri_e2[pidx]
            )
            pid = geom.prim_index[pidx]
            valid &= (
                do_leaf & (j < count) & (pid >= 0)
                & (t > rays.t_min) & (t < best_t)
            )
            if opaque_only:
                valid &= geom.tri_opaque[pidx]
            best_t = jnp.where(valid, t, best_t)
            best_prim = jnp.where(valid, pidx, best_prim)
            best_u = jnp.where(valid, u, best_u)
            best_v = jnp.where(valid, v, best_v)

        # preorder layout: interior node's first child is node+1
        descend = hit_box & ~is_leaf
        next_node = jnp.where(
            descend,
            node_c + 1,
            jnp.where(active, geom.skip[node_c], -1),
        )
        return next_node, best_t, best_prim, best_u, best_v

    zero_f = jnp.zeros_like(o[..., 0])
    init = (
        zero_f.astype(jnp.int32),
        jnp.minimum(rays.t_max, jnp.float32(3e38)) + zero_f,
        zero_f.astype(jnp.int32) - 1,
        zero_f,
        zero_f,
    )
    _, best_t, best_prim, best_u, best_v = jax.lax.while_loop(cond, body, init)
    found = best_prim >= 0
    return Hit(
        inst=jnp.where(found, jnp.int32(0), jnp.int32(-1)),
        prim=best_prim,
        bary=jnp.stack([best_u, best_v], axis=-1),
        t=jnp.where(found, best_t, jnp.inf),
    )


def _use_pallas_brute(geom) -> bool:
    """Pallas brute force: TPU backend + small (padded) triangle table."""
    from ..ops import brute_pallas

    return (
        brute_pallas.ENABLED
        and geom.tri_v0.shape[0] <= brute_pallas.MAX_TRIS
        and jax.default_backend() == "tpu"
    )


def _use_cluster(geom) -> bool:
    """Cluster-streaming Pallas tracer: TPU + tables built at compile."""
    from ..ops import cluster_pallas

    return (
        cluster_pallas.ENABLED
        and geom.cluster_nodes is not None
        and jax.default_backend() == "tpu"
    )


def _use_wide8(geom) -> bool:
    """Wide-block BVH8 tracer (ops/wide8_pallas.py): opt-in experiment
    (LR_WIDE8=1) — shared 2048-lane walk with the matmul Phase A. The
    cluster tracer remains the default large-scene path (PERF.md: the
    matmul Phase A measured no net win; Phase B is the wall)."""
    from ..ops import wide8_pallas

    return (
        wide8_pallas.ENABLED
        and geom.cluster_slab8 is not None
        and geom.cluster_cboxes is not None
        and jax.default_backend() == "tpu"
    )


def _use_subpacket(geom) -> bool:
    """Subpacket MXU tracer (ops/subpacket_pallas.py): the preferred
    large-scene closest-hit path — per-128-ray stacks + Woop matmul tests."""
    from ..ops import subpacket_pallas

    return (
        subpacket_pallas.ENABLED
        and geom.cluster_woop is not None
        and geom.cluster_slab8 is not None
        and jax.default_backend() == "tpu"
    )


def _sphere_closest(sph, rays, t_min, t_max):
    """Closest analytic-sphere hit. Returns (t, idx, u, v): t=inf on miss.

    Exact quadric test per sphere (S is small — unrolled python loop, pure
    dense VPU math). uv matches the icosphere mesh parameterization
    (shapes/impls.py): v = acos(lz)/pi, u = atan2(ly, lx)/2pi mod 1, in the
    sphere's LOCAL (rotated) frame."""
    o, d = rays.origin, rays.direction
    best_t = jnp.full(o.shape[:-1], jnp.inf, jnp.float32)
    best_i = jnp.full(o.shape[:-1], -1, jnp.int32)
    for s in range(sph.shape[0]):
        c = sph[s, 0:3]
        r = sph[s, 3]
        oc = o - c
        b = jnp.sum(oc * d, axis=-1)
        c2 = jnp.sum(oc * oc, axis=-1) - r * r
        disc = b * b - c2
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        t = jnp.where((t0 > t_min) & (t0 < t_max), t0, t1)
        ok = (disc > 0.0) & (t > t_min) & (t < t_max) & (t < best_t)
        best_t = jnp.where(ok, t, best_t)
        best_i = jnp.where(ok, s, best_i)
    # uv of the winner only
    srow = sph[jnp.maximum(best_i, 0)]
    c = srow[..., 0:3]
    r = jnp.maximum(srow[..., 3], 1e-20)
    p = o + best_t[..., None] * d
    n = (p - c) / r[..., None]
    rot = srow[..., 4:13]
    lx = n[..., 0] * rot[..., 0] + n[..., 1] * rot[..., 3] + n[..., 2] * rot[..., 6]
    ly = n[..., 0] * rot[..., 1] + n[..., 1] * rot[..., 4] + n[..., 2] * rot[..., 7]
    lz = n[..., 0] * rot[..., 2] + n[..., 1] * rot[..., 5] + n[..., 2] * rot[..., 8]
    v = jnp.arccos(jnp.clip(lz, -1.0, 1.0)) * jnp.float32(1.0 / np.pi)
    u = jnp.arctan2(ly, lx) * jnp.float32(0.5 / np.pi)
    u = jnp.where(u < 0.0, u + 1.0, u)
    found = best_i >= 0
    return (
        jnp.where(found, best_t, jnp.inf),
        best_i,
        jnp.where(found, u, 0.0),
        jnp.where(found, v, 0.0),
    )


def _sphere_any(sph, rays):
    """Occlusion by any opaque analytic sphere within (t_min, t_max)."""
    o, d = rays.origin, rays.direction
    occ = jnp.zeros(o.shape[:-1], bool)
    for s in range(sph.shape[0]):
        c = sph[s, 0:3]
        r = sph[s, 3]
        oc = o - c
        b = jnp.sum(oc * d, axis=-1)
        c2 = jnp.sum(oc * oc, axis=-1) - r * r
        disc = b * b - c2
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        hit0 = (t0 > rays.t_min) & (t0 < rays.t_max)
        hit1 = (t1 > rays.t_min) & (t1 < rays.t_max)
        occ |= (disc > 0.0) & (hit0 | hit1) & (sph[s, 14] > 0.0)
    return occ


def _merge_sphere_closest(geom, rays, tri_trace):
    """Sphere-first closest trace: quadric hits clip t_max before the
    triangle trace (pruning the tree walk), then the nearer of the two
    wins. Sphere hits use prim = P + sphere_index."""
    t_s, i_s, u_s, v_s = _sphere_closest(geom.sph, rays, rays.t_min, rays.t_max)
    clipped = rays._replace(t_max=jnp.minimum(rays.t_max, t_s))
    hit = tri_trace(clipped)
    p_tris = geom.tri_v0.shape[0]
    sph_wins = (i_s >= 0) & ~(hit.prim >= 0)
    return Hit(
        inst=jnp.where(sph_wins, jnp.int32(0), hit.inst),
        prim=jnp.where(sph_wins, p_tris + i_s, hit.prim),
        bary=jnp.where(
            sph_wins[..., None],
            jnp.stack([u_s, v_s], axis=-1),
            hit.bary,
        ),
        t=jnp.where(sph_wins, t_s, hit.t),
    )


def trace_closest(geom, rays) -> Hit:
    from . import twolevel

    if isinstance(geom, twolevel.TraceGeometry2L):
        if _use_2l_cluster(geom):
            return twolevel.trace_closest_2l_cluster(geom, rays)
        return twolevel.trace_closest_2l(geom, rays)
    if getattr(geom, "sph", None) is not None:
        return _merge_sphere_closest(
            geom, rays, lambda r: _trace_closest_tris(geom, r)
        )
    return _trace_closest_tris(geom, rays)


def _use_2l_cluster(geom) -> bool:
    """Composed two-level cluster path: per-instance launches of the
    cluster kernel over shared per-mesh tables (twolevel.py round 5)."""
    from ..ops import cluster_pallas

    return (
        cluster_pallas.ENABLED
        and len(geom.cluster_sets) > 0
        and len(geom.inst_mesh) > 0
        and jax.default_backend() == "tpu"
    )


def _trace_closest_tris(geom, rays) -> Hit:
    if geom.num_tris <= BRUTE_FORCE_MAX_TRIS:
        if _use_pallas_brute(geom):
            from ..ops import brute_pallas

            return brute_pallas.trace_closest_pallas(geom, rays)
        return trace_closest_brute(geom, rays)
    if _use_subpacket(geom):
        from ..ops import subpacket_pallas

        return subpacket_pallas.trace_closest_subpacket(
            geom.cluster_slab8, geom.cluster_meta8, geom.cluster_woop, rays
        )
    if _use_wide8(geom):
        from ..ops import wide8_pallas

        return wide8_pallas.trace_closest_wide8(
            geom.cluster_slab8, geom.cluster_meta8, geom.cluster_cboxes,
            geom.cluster_tris, rays,
        )
    if _use_cluster(geom):
        from ..ops import cluster_pallas

        return cluster_pallas.trace_closest_cluster(
            geom.cluster_nodes, geom.cluster_tris, rays
        )
    return trace_closest_bvh(geom, rays)


def trace_any(geom, rays):
    """Shadow-ray occlusion test; returns bool occluded per ray."""
    from . import twolevel

    if isinstance(geom, twolevel.TraceGeometry2L):
        if _use_2l_cluster(geom):
            return twolevel.trace_any_2l_cluster(geom, rays)
        return twolevel.trace_any_2l(geom, rays)
    if getattr(geom, "sph", None) is not None:
        occ_s = _sphere_any(geom.sph, rays)
        # occluded lanes skip the triangle walk (t_max collapses to 0)
        clipped = rays._replace(
            t_max=jnp.where(occ_s, 0.0, rays.t_max)
        )
        return occ_s | _trace_any_tris(geom, clipped)
    return _trace_any_tris(geom, rays)


def _trace_any_tris(geom, rays):
    if geom.num_tris <= BRUTE_FORCE_MAX_TRIS:
        if _use_pallas_brute(geom):
            from ..ops import brute_pallas

            return brute_pallas.trace_any_pallas(geom, rays)
        return trace_any_brute(geom, rays)
    if _use_wide8(geom):
        from ..ops import wide8_pallas

        return wide8_pallas.trace_any_wide8(
            geom.cluster_slab8, geom.cluster_meta8, geom.cluster_cboxes,
            geom.cluster_tris, rays,
        )
    if _use_cluster(geom):
        from ..ops import cluster_pallas

        return cluster_pallas.trace_any_cluster(
            geom.cluster_nodes, geom.cluster_tris, rays
        )
    hit = trace_closest_bvh(geom, rays, opaque_only=True)
    return ~hit.miss
