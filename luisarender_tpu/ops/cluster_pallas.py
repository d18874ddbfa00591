"""Cluster-streaming Pallas BVH tracer for LARGE scenes on TPU.

The TPU-native replacement for hardware ray-tracing cores at bedroom-class
scene sizes (the reference drives OptiX/DXR through LuisaCompute,
/root/reference/src/base/geometry.cpp:218-279; BASELINE config #3 demands
~500k-triangle scenes). The small-scene kernels (ops/brute_pallas.py,
ops/fused_path.py) keep the whole triangle table in VMEM; at 500k triangles
the table is ~32 MB — over VMEM — and the XLA while_loop traversal
(accel/traverse.py trace_closest_bvh) is gather-bound (~60 gathered bytes x
~200 steps per ray ≈ 16 GB of gather traffic per 1M-ray bounce; measured
0.14 Mray/s and worker crashes at 1280x720).

Design (everything the TPU is good at, nothing it is bad at):

- The BVH is a binned-SAH tree (accel/cpp/bvh_builder.cpp via
  accel/native.py; numpy Morton fallback) whose leaves hold <= CLUSTER=128
  triangles; every leaf is padded to one aligned (16, 128) f32 block in
  HBM, so the coarse tree is tiny (a 512k-tri scene ~ 12k nodes,
  SMEM/VMEM-resident).
- Each grid step owns a BLOCK=1024 ray packet (8x128 vregs). ONE SMEM
  traversal stack is shared by the packet (speculative packet traversal: a
  node is entered when ANY lane hits its AABB) — the idiomatic TPU stand-in
  for per-lane pointer chasing, which Mosaic cannot do.
- The node table lives in SMEM (flat (N*8,) f32 input window; integer
  fields ride as exact f32 values < 2^24): each traversal step is 8 scalar
  loads + one ~20-op packet slab test. The previous one-hot-MXU fetch from
  a VMEM table cost ~3 ops x N/128 vregs PER STEP just to build the one-hot
  (measured: Phase A = Phase B = 49 ms on a 500k-tri scene); the SMEM walk
  removes that entirely. Scenes whose node table exceeds the ~1 MB SMEM
  window (> SMEM_NODE_ROWS nodes ≈ 1M triangles) fall back to the one-hot
  VMEM fetch.
- Traversal alternates two phases per chunk: Phase A pops the shared stack
  and collects up to K_CHUNK leaf clusters (no triangle work); Phase B
  streams those clusters HBM->VMEM with double-buffered async DMA and tests
  all 128 triangles with a static-unrolled Möller-Trumbore loop against the
  whole packet (the proven brute_pallas.py pattern: static VMEM scalar
  reads). Children are pushed near-first along the packet mean direction,
  so best_t tightens early and prunes both later pops and collected
  clusters (re-tested against the current best before their tests run).
- A bounded step counter guarantees termination even on malformed trees (a
  while_loop hang through the axon tunnel is unrecoverable).

The per-ray cost is (union of clusters entered by the packet) x 128 tests —
speculation tax. The wrappers therefore sort rays into coherent packets
before blocking (origin-Morton major, direction-Morton minor, terminated
rays to the tail) with variadic lax.sort carrying the payloads — measured
14.3 clusters/packet coherent vs 94.3 incoherent on a 20k-tri scene, and
sorted-incoherent traces at coherent speed.

Like brute_pallas, the wrappers carry zero-gradient VJPs (geometry is
constant; sampled directions are detached in diff/render.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

ENABLED = True
CLUSTER = 128  # triangles per leaf = DMA block (= lane width; (16,128) block)
# NOTE: finer-than-block leaves (e.g. 64-tri) measured SLOWER on v5e (7.7 vs
# 9.8 Mray/s camera: per-visit fixed costs dominate, so more+smaller leaves
# lose); 128 it is.
# BLOCK/K_CHUNK are env-overridable for on-hardware tuning sweeps only.
# rays per grid step: 2048 measured best on v5e for BOTH coherent camera
# packets (17.4 vs 16.3 Mray/s raw) and incoherent bounce rays (234 vs
# 268 ms on the 512k-tri bounce-1 wave) — the bigger block amortizes the
# Phase-A SMEM walk faster than the speculation union grows; 4096 reverses
# (345 ms: union dominates).
BLOCK = int(_os.environ.get("LR_CLUSTER_BLOCK", 2048))
assert BLOCK > 0 and BLOCK % 128 == 0, "LR_CLUSTER_BLOCK must be a positive multiple of 128"
SUB = BLOCK // 128
K_CHUNK = int(_os.environ.get("LR_CLUSTER_KCHUNK", 8))  # DMA pipeline depth
assert K_CHUNK >= 1, "LR_CLUSTER_KCHUNK must be >= 1"
# Phase-B ray-group gating: split the BLOCK into NGROUPS sublane groups and
# run the unrolled MT sweep per group under a lax.cond on that group's own
# slab test — bounce-wave packets often hit a cluster with only half the
# block, and a skipped (8,128) group halves that entry's VPU work. Vector
# ops are vreg-granular ((8,128)), so groups below 8 sublanes save nothing.
GROUPS = int(_os.environ.get("LR_CLUSTER_GROUPS", 1))
assert GROUPS >= 1 and SUB % GROUPS == 0 and (SUB // GROUPS) % 8 == 0 or GROUPS == 1, \
    "LR_CLUSTER_GROUPS must divide BLOCK/128 into multiples of 8 sublanes"
STACK_DEPTH = 64  # complete-binary-tree depth bound (<= 2^26 clusters) + slack
TRI_COLS = 16  # v0.xyz e1.xyz e2.xyz valid opaque slot pad...
NODE_COLS = 8  # min.xyz max.xyz right/-1 first/-1
SMEM_NODE_ROWS = 16384  # max node rows for the SMEM table (512 KB of ~1 MB)
_BIG = 3.0e38


# ---------------------------------------------------------------------------
# Host-side table construction
# ---------------------------------------------------------------------------


PACK_LEAF = 8  # SAH granularity before cluster packing (see below)


def build_cluster_tables(positions, triangles, opaque_orig, canon_of_orig):
    """Build (node_table (N,8) f32, tri_table (P,16) f32) numpy arrays.

    positions (V,3) f32; triangles (T,3) i32; opaque_orig (T,) bool;
    canon_of_orig (T,) i32 = canonical sorted slot (the index into the
    shade table / 'trace' arrays) of each ORIGINAL triangle id.

    Cluster packing (round 5, opt-in LR_PACK=1): SAH leaves at CLUSTER=128
    granularity fill only 65% of their blocks, so 35% of every Phase-B
    Möller-Trumbore sweep tested padding. Packing (SAH at leaf_size=8 +
    first-fit pre-order runs + surface-area growth guard + a coarse SAH
    over per-cluster degenerate tris) reaches fill 0.91 and wins camera
    packets 1.72x — but the meshheavy E2E measured ~10% SLOWER (deep
    bounce/shadow waves pay more for fatter boxes than fill saves), so
    the default stays one-leaf-per-block; full numbers in PERF.md round 5.
    """
    from ..accel.bvh import build_bvh
    from ..accel.native import build_bvh_sah

    positions = np.asarray(positions, np.float32)
    triangles = np.asarray(triangles, np.int32)
    # DEFAULT = unpacked (one SAH leaf per block): packing to fill 0.91
    # wins CAMERA packets 1.72x and even bounce-1 waves 6%, but LOSES the
    # meshheavy e2e ~10% (measured 0.94 vs 1.05 Mray/s) — DEEP bounce and
    # shadow waves pay more for the fatter packed boxes than the fill
    # saves. LR_PACK=1 opts in for camera-dominant workloads.
    packing = _os.environ.get("LR_PACK", "0") == "1"
    pack_leaf = PACK_LEAF if packing else CLUSTER
    bvh = build_bvh_sah(positions, triangles, leaf_size=pack_leaf)
    if bvh is None:
        bvh = build_bvh(positions, triangles, leaf_size=pack_leaf)

    # ---- pack pre-order leaf runs into tight clusters.
    # Greedy fill alone regressed BOUNCE waves on the 512k scene: packing
    # across subtree gaps fattens cluster AABBs, and the speculative union
    # of an incoherent packet grew ~1.5x — cancelling the fill win. The
    # surface-area guard closes a cluster early (once half full) rather
    # than absorb a leaf that would inflate its box.
    grow = float(_os.environ.get("LR_PACK_GROW", 1.7))
    min_fill = int(_os.environ.get("LR_PACK_MINFILL", CLUSTER // 2))
    tmin = np.minimum(
        np.minimum(positions[triangles[:, 0]], positions[triangles[:, 1]]),
        positions[triangles[:, 2]],
    )
    tmax = np.maximum(
        np.maximum(positions[triangles[:, 0]], positions[triangles[:, 1]]),
        positions[triangles[:, 2]],
    )

    def _sa(lo, hi):
        d = np.maximum(hi - lo, 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    is_leaf = bvh.node_count > 0
    leaf_ids = np.nonzero(is_leaf)[0]  # pre-order
    prim = bvh.prim_index
    clusters: list[np.ndarray] = []
    cur: list[np.ndarray] = []
    cur_n = 0
    cur_lo = cur_hi = None
    for nid in leaf_ids:
        f = int(bvh.node_first[nid])
        c = int(bvh.node_count[nid])
        ids = prim[f:f + c]
        ids = ids[ids >= 0]
        if ids.size == 0:
            continue
        lo = tmin[ids].min(0)
        hi = tmax[ids].max(0)
        close = cur_n + ids.size > CLUSTER or not packing
        if not close and cur_n >= min_fill:
            mlo = np.minimum(cur_lo, lo)
            mhi = np.maximum(cur_hi, hi)
            close = _sa(mlo, mhi) > grow * _sa(cur_lo, cur_hi)
        if close and cur_n > 0:
            clusters.append(np.concatenate(cur))
            cur, cur_n, cur_lo, cur_hi = [], 0, None, None
        cur.append(ids)
        cur_n += ids.size
        if cur_lo is None:
            cur_lo, cur_hi = lo, hi
        else:
            cur_lo = np.minimum(cur_lo, lo)
            cur_hi = np.maximum(cur_hi, hi)
    if cur_n:
        clusters.append(np.concatenate(cur))

    order = np.full((len(clusters), CLUSTER), -1, np.int32)
    for bi, ids in enumerate(clusters):
        order[bi, :ids.size] = ids
    order = order.reshape(-1)
    p = order.shape[0]
    valid = order >= 0
    safe = np.where(valid, order, 0)

    v0 = positions[triangles[safe, 0]]
    v1 = positions[triangles[safe, 1]]
    v2 = positions[triangles[safe, 2]]
    tri = np.zeros((p, TRI_COLS), np.float32)
    tri[:, 0:3] = v0
    tri[:, 3:6] = v1 - v0
    tri[:, 6:9] = v2 - v0
    tri[:, 9] = valid.astype(np.float32)
    tri[:, 10] = np.where(valid, np.asarray(opaque_orig)[safe], False).astype(
        np.float32
    )
    tri[:, 11] = np.where(
        valid, np.asarray(canon_of_orig, np.int64)[safe], -1
    ).astype(np.float32)
    # attribute-major (C, TRI_COLS, CLUSTER) blocks: one aligned (16, 128)
    # DMA per cluster (a (P, 16) layout would slice HBM along a 16-wide
    # minor dim — illegal against the (1, 128) HBM tiling)
    tri = np.ascontiguousarray(
        tri.reshape(p // CLUSTER, CLUSTER, TRI_COLS).transpose(0, 2, 1)
    )

    # ---- coarse tree: SAH over one degenerate triangle per cluster whose
    # AABB equals the cluster bounds (the binned-SAH builder only looks at
    # primitive AABBs, so this IS an SAH build over the cluster boxes)
    vmin = np.minimum(np.minimum(v0, v1), v2)
    vmax = np.maximum(np.maximum(v0, v1), v2)
    big = np.float32(_BIG)
    vmin = np.where(valid[:, None], vmin, big).reshape(-1, CLUSTER, 3).min(1)
    vmax = np.where(valid[:, None], vmax, -big).reshape(-1, CLUSTER, 3).max(1)
    ncl = vmin.shape[0]
    bverts = np.empty((3 * ncl, 3), np.float32)
    bverts[0::3] = vmin
    bverts[1::3] = vmax
    bverts[2::3] = np.stack([vmin[:, 0], vmax[:, 1], vmin[:, 2]], axis=-1)
    btris = np.arange(3 * ncl, dtype=np.int32).reshape(ncl, 3)
    cb = build_bvh_sah(bverts, btris, leaf_size=1)
    if cb is None:
        cb = build_bvh(bverts, btris, leaf_size=1)

    n = cb.aabb_min.shape[0]
    node = np.zeros((n, NODE_COLS), np.float32)
    node[:, 0:3] = cb.aabb_min
    node[:, 3:6] = cb.aabb_max
    # interior: col 6 = right child = skip[node+1] (the left child's skip
    # link points past the left subtree, i.e. at the right child); leaf: -1.
    # The FRACTION of col 6 encodes the near-child-first traversal hint:
    # +axis/4 (dominant child-separation axis) and +1/16 when the LEFT child
    # lies on the HIGH side of that axis — the kernel picks the near child
    # from the packet's mean-direction sign with zero extra node reads
    # (exact for < 2^20 nodes in f32).
    is_leaf_c = cb.node_count > 0
    right = np.full(n, -1.0, np.float32)
    interior = np.nonzero(~is_leaf_c)[0]
    if interior.size:
        right_i = cb.skip[interior + 1]
        right[interior] = right_i
        # near-child-first hint in the fraction: only exact while
        # right + 0.9375 rounds to itself in f32, i.e. right < 2^20 —
        # beyond that the fraction would round INTO the integer child
        # index and traversal would drop subtrees (ADVICE round 2).
        # Larger trees keep the exact integer-only encoding; the kernel's
        # axis/left_high decode then reads 0 (ordering noise only).
        if n < (1 << 20):
            left_i = interior + 1
            c_l = 0.5 * (cb.aabb_min[left_i] + cb.aabb_max[left_i])
            c_r = 0.5 * (cb.aabb_min[right_i] + cb.aabb_max[right_i])
            sep = c_r - c_l
            axis = np.argmax(np.abs(sep), axis=-1)
            left_high = np.take_along_axis(sep, axis[:, None], axis=-1)[:, 0] < 0.0
            right[interior] += axis * 0.25 + left_high * 0.0625
    node[:, 6] = right
    # leaf payload = CLUSTER id carried through the coarse build's prim
    # order; -1 for interior (and for the Morton fallback's padded leaves,
    # whose empty boxes also never pass the slab test)
    leaf_pid = np.full(n, -1, np.int64)
    lf = np.nonzero(is_leaf_c)[0]
    if lf.size:
        leaf_pid[lf] = cb.prim_index[cb.node_first[lf]]
        empty = lf[leaf_pid[lf] < 0]
        node[empty, 0:3] = _BIG
        node[empty, 3:6] = -_BIG
    node[:, 7] = leaf_pid.astype(np.float32)
    # pad node rows to a lane multiple for the one-hot fetch
    n_pad = (-n) % 128
    if n_pad:
        pad_rows = np.zeros((n_pad, NODE_COLS), np.float32)
        pad_rows[:, 0:3] = _BIG
        pad_rows[:, 3:6] = -_BIG
        pad_rows[:, 6] = -1.0
        pad_rows[:, 7] = -1.0
        node = np.concatenate([node, pad_rows], axis=0)
    assert p < (1 << 24) and node.shape[0] < (1 << 24)
    return node, tri


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _fetch_node(node_ref, index):
    """(1, NODE_COLS) row via one-hot MXU matmul.

    precision=HIGHEST is ESSENTIAL: the terminal pins
    --xla_allow_excess_precision=true, under which Mosaic lowers f32 matmuls
    to single-pass bf16 — child indices above 256 and AABB planes then round
    (8-bit mantissa) and traversal silently drops subtrees."""
    n = node_ref.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    onehot = (ids == index).astype(jnp.float32)
    return jnp.dot(
        onehot,
        node_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _slab(row, ox, oy, oz, ix, iy, iz, t_min, t_far):
    """Packet slab test against one node record (8-tuple or (1,8) row).

    Returns (8,128) bool."""
    t0x = (row[0] - ox) * ix
    t1x = (row[3] - ox) * ix
    t0y = (row[1] - oy) * iy
    t1y = (row[4] - oy) * iy
    t0z = (row[2] - oz) * iz
    t1z = (row[5] - oz) * iz
    near = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), t_min),
    )
    far = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), t_far),
    )
    return near <= far


def _traverse_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
    node_ref, tri_hbm,
    t_o, slot_o, u_o, v_o,
    buf_ref, work_ref, sem_ref, stack_ref, leaf_first_ref, leaf_node_ref,
    *, opaque_only: bool, max_steps: int, smem_nodes: bool,
):
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    t_min = tmin_ref[0]

    def safe_inv(v):
        tiny = 1e-12
        return 1.0 / jnp.where(jnp.abs(v) < tiny, jnp.where(v < 0, -tiny, tiny), v)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    # packet mean direction (for near-child-first ordering); three one-time
    # vector->scalar reductions
    mdx, mdy, mdz = jnp.sum(dx), jnp.sum(dy), jnp.sum(dz)
    # any-hit mode: lanes that are dead on entry (t_max <= t_min — padding
    # and terminated shadow rays) count as already-found for the all-found
    # early exit
    entry_dead = tmax_ref[0] <= t_min

    stack_ref[0] = 0

    def read_node(idx):
        """Node record as an 8-tuple of scalars (SMEM) or lane values (one-hot)."""
        if smem_nodes:
            base = idx * NODE_COLS
            return tuple(node_ref[base + c] for c in range(NODE_COLS))
        row = _fetch_node(node_ref, idx)
        return tuple(row[0, c] for c in range(NODE_COLS))

    def outer_cond(c):
        sp, steps, best_t, best_s, *_ = c
        go = (sp > 0) & (steps < max_steps)
        if opaque_only:
            # any-hit: stop as soon as every live lane has its occluder
            go &= jnp.logical_not(jnp.all((best_s >= 0) | entry_dead))
        return go

    def outer_body(c):
        sp, steps, best_t, best_s, best_u, best_v = c

        # ---- Phase A: pop until K_CHUNK leaves collected (no tri work)
        def a_cond(s):
            sp, nl, steps = s
            return (sp > 0) & (nl < K_CHUNK) & (steps < max_steps)

        def a_body(s):
            sp, nl, steps = s
            node = stack_ref[sp - 1]
            row = read_node(node)
            hit = jnp.any(_slab(row, ox, oy, oz, ix, iy, iz, t_min, best_t))
            # col 6 = right child index + axis/4 + left_high/16 (leaf: -1);
            # see build_cluster_tables
            renc = row[6]
            right = jnp.floor(renc).astype(jnp.int32)
            frac4 = (renc - right) * 4.0
            axis = jnp.floor(frac4 + 0.25).astype(jnp.int32)
            left_high = (frac4 - axis) > 0.125
            first = row[7].astype(jnp.int32)
            is_leaf = first >= 0
            take_leaf = hit & is_leaf
            push = hit & jnp.logical_not(is_leaf)

            @pl.when(take_leaf)
            def _():
                leaf_first_ref[nl] = first
                leaf_node_ref[nl] = node

            @pl.when(push)
            def _():
                # near-child-first: the packet's mean-direction sign along
                # the stored separation axis picks the near child with NO
                # extra node reads; best_t then tightens early and prunes
                # the far subtree + later leaf clusters
                left = node + 1
                md = jnp.where(
                    axis == 0, mdx, jnp.where(axis == 1, mdy, mdz)
                )
                left_near = (md >= 0.0) != left_high
                stack_ref[sp - 1] = jnp.where(left_near, right, left)
                stack_ref[sp] = jnp.where(left_near, left, right)

            sp = jnp.where(push, sp + 1, sp - 1)
            nl = nl + take_leaf.astype(jnp.int32)
            return sp, nl, steps + 1

        sp, nl, steps = jax.lax.while_loop(a_cond, a_body, (sp, 0, steps))

        # ---- Phase B: deep-pipelined DMA (all collected clusters in
        # flight at once — one buffer+semaphore per chunk slot) + dense
        # cluster tests
        def dma_start(i, _):
            @pl.when(i < nl)
            def _():
                pltpu.make_async_copy(
                    tri_hbm.at[leaf_first_ref[i]],
                    buf_ref.at[i],
                    sem_ref.at[i],
                ).start()

            return 0

        jax.lax.fori_loop(0, K_CHUNK, dma_start, 0, unroll=True)

        def b_body(j, carry):
            best_t, best_s, best_u, best_v = carry
            pltpu.make_async_copy(
                tri_hbm.at[leaf_first_ref[j]],
                buf_ref.at[j],
                sem_ref.at[j],
            ).wait()

            # re-test the leaf AABB against the CURRENT best_t (phase-A
            # collection used the pre-chunk best) — skip pruned clusters
            row = read_node(leaf_node_ref[j])

            # stage into a statically-addressed scratch so the unrolled loop
            # reads compile-time scalar addresses (brute_pallas pattern);
            # predicated ref-to-ref copies, NOT a value-returning lax.cond
            # with side effects (Mosaic mishandles those)
            for k in range(K_CHUNK):

                @pl.when(j == k)
                def _(k=k):
                    work_ref[:] = buf_ref[k]

            def mt_sweep(oxg, oyg, ozg, dxg, dyg, dzg, tmin_g):
                def do_tests(carry_g):
                    best_t, best_s, best_u, best_v = carry_g
                    for jj in range(CLUSTER):
                        v0x, v0y, v0z = work_ref[0, jj], work_ref[1, jj], work_ref[2, jj]
                        e1x, e1y, e1z = work_ref[3, jj], work_ref[4, jj], work_ref[5, jj]
                        e2x, e2y, e2z = work_ref[6, jj], work_ref[7, jj], work_ref[8, jj]
                        px = dyg * e2z - dzg * e2y
                        py = dzg * e2x - dxg * e2z
                        pz = dxg * e2y - dyg * e2x
                        det = e1x * px + e1y * py + e1z * pz
                        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                        tx = oxg - v0x
                        ty = oyg - v0y
                        tz = ozg - v0z
                        u = (tx * px + ty * py + tz * pz) * inv_det
                        qx = ty * e1z - tz * e1y
                        qy = tz * e1x - tx * e1z
                        qz = tx * e1y - ty * e1x
                        v = (dxg * qx + dyg * qy + dzg * qz) * inv_det
                        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                        ok = (
                            (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                            & (work_ref[9, jj] > 0.0)
                            & (t > tmin_g) & (t < best_t)
                        )
                        if opaque_only:
                            ok &= work_ref[10, jj] > 0.0
                        sl = work_ref[11, jj].astype(jnp.int32)
                        best_t = jnp.where(ok, t, best_t)
                        best_s = jnp.where(ok, sl, best_s)
                        best_u = jnp.where(ok, u, best_u)
                        best_v = jnp.where(ok, v, best_v)
                    return best_t, best_s, best_u, best_v
                return do_tests

            if GROUPS == 1:
                alive = jnp.any(
                    _slab(row, ox, oy, oz, ix, iy, iz, t_min, best_t)
                )
                return jax.lax.cond(
                    alive, mt_sweep(ox, oy, oz, dx, dy, dz, t_min),
                    lambda c: c, carry,
                )

            # per-group gating: each sublane group re-tests the leaf slab
            # against ITS OWN best_t window and skips the whole MT sweep
            # when no lane of the group hits (bounce packets: ~40% of
            # (group, cluster) pairs miss)
            g_sub = ox.shape[0] // GROUPS
            outs = []
            for g in range(GROUPS):
                s = slice(g * g_sub, (g + 1) * g_sub)
                a_g = jnp.any(
                    _slab(row, ox[s], oy[s], oz[s], ix[s], iy[s], iz[s],
                          t_min[s], best_t[s])
                )
                outs.append(jax.lax.cond(
                    a_g,
                    mt_sweep(ox[s], oy[s], oz[s], dx[s], dy[s], dz[s],
                             t_min[s]),
                    lambda c: c,
                    (best_t[s], best_s[s], best_u[s], best_v[s]),
                ))
            return tuple(
                jnp.concatenate([o[i] for o in outs], axis=0)
                for i in range(4)
            )

        best_t, best_s, best_u, best_v = jax.lax.fori_loop(
            0, nl, b_body, (best_t, best_s, best_u, best_v)
        )
        if opaque_only:
            # any-hit: found lanes stop pulling clusters into the packet
            # union (their slab window collapses), shrinking later chunks
            best_t = jnp.where(best_s >= 0, -_BIG, best_t)
        return sp, steps, best_t, best_s, best_u, best_v

    shape = ox.shape
    init = (
        1,
        0,
        jnp.minimum(tmax_ref[0], _BIG),
        jnp.full(shape, -1, jnp.int32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
    )
    _, _, best_t, best_s, best_u, best_v = jax.lax.while_loop(
        outer_cond, outer_body, init
    )
    found = best_s >= 0
    t_o[0] = jnp.where(found, best_t, jnp.inf)
    slot_o[0] = best_s
    u_o[0] = best_u
    v_o[0] = best_v


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------


def _ray_blocks(o, d, t_min, t_max):
    n = o.shape[0]
    pad = (-n) % BLOCK
    nb = (n + pad) // BLOCK

    def prep(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(nb, SUB, 128)

    comps = [
        prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
        prep(d[:, 0]), prep(d[:, 1], 1.0), prep(d[:, 2]),
        prep(t_min), prep(t_max, -1.0),
    ]
    return comps, n, nb


_ray_spec = pl.BlockSpec((1, SUB, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

MIN_SORT_RAYS = 32768  # below this the sort costs more than it saves


SORT_KEY_MODE = int(_os.environ.get("LR_SORT_KEY", 0))


def _coherence_keys(o, d, t_min, t_max, lo, ext):
    """Packet-coherence sort keys: origin Morton (6 bits/axis, scene-AABB
    normalized via (lo, ext)) major, direction Morton (4 bits/axis over
    [-1,1], top bit = sign/octant) minor.

    The kernel traverses per BLOCK-ray packet speculatively (a node is
    entered when ANY lane hits it), so throughput is set by how many
    clusters the PACKET union touches: measured 14.3 clusters/packet for
    coherent camera rays vs 94.3 for random bounce rays on the same scene.
    Sorting bounce/shadow rays into coherent packets recovers most of the
    gap for the cost of one argsort + two gathers. The direction-minor bits
    matter for shared-origin ray sets (camera, point-light shadow batches)
    where the origin cell is degenerate.

    SORT_KEY_MODE (experimental, env LR_SORT_KEY): 0 = origin-major +
    direction-minor; 1 = 6D interleaved origin/direction Morton (5 bits
    each); 2 = ray-MIDPOINT cell major (finite rays; corridor clustering
    for NEE shadow rays) + direction minor."""
    ext = jnp.maximum(ext, 1e-12)

    def spread(x):  # interleave: every 3rd bit (10-bit part1by2)
        x = (x | (x << 16)) & jnp.uint32(0xFF0000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    def morton(q):
        return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)

    if SORT_KEY_MODE == 1:
        # 6D Morton: alternate origin (5b) / direction (5b) bit planes so
        # neither dominates; divergent-direction ray sets (NEE shadows)
        # split into narrower direction cones earlier
        qo = jnp.clip((o - lo) / ext * 31.0, 0.0, 31.0).astype(jnp.uint32)
        qd = jnp.clip((d * 0.5 + 0.5) * 31.0, 0.0, 31.0).astype(jnp.uint32)
        key = (morton(qo) << 1 | morton(qd)).astype(jnp.int32)
    elif SORT_KEY_MODE == 2:
        diag = jnp.sqrt(jnp.sum(ext * ext))
        span = jnp.minimum(t_max, diag)
        mp = o + 0.5 * span[..., None] * d
        qo = jnp.clip((mp - lo) / ext * 63.0, 0.0, 63.0).astype(jnp.uint32)
        qd = jnp.clip((d * 0.5 + 0.5) * 15.0, 0.0, 15.0).astype(jnp.uint32)
        key = ((morton(qo) << 12) | morton(qd)).astype(jnp.int32)
    else:
        qo = jnp.clip((o - lo) / ext * 63.0, 0.0, 63.0).astype(jnp.uint32)
        qd = jnp.clip((d * 0.5 + 0.5) * 15.0, 0.0, 15.0).astype(jnp.uint32)
        key = ((morton(qo) << 12) | morton(qd)).astype(jnp.int32)
    # terminated lanes (integrators mask them with t_max <= t_min) sort to
    # the TAIL so whole packets of dead rays exit the kernel at the
    # root test — late bounces are mostly dead and otherwise pay full price
    return jnp.where(t_max <= t_min, jnp.int32(0x40000000), key)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _trace(o, d, t_min, t_max, node_table, tri_table,
           opaque_only=False, interpret=False):
    n = o.shape[0]
    # strip weak types (identical-program recompiles otherwise)
    o, d, t_min, t_max = (
        x.astype(jnp.float32) for x in (o, d, t_min, t_max)
    )
    # materialize the ray components ONCE before the coherence sort: the
    # sort consumes them as 8 separate operands, and without the barrier XLA
    # fuses (duplicates) the whole upstream ray-construction graph into each
    # operand's producer
    o, d, t_min, t_max = jax.lax.optimization_barrier((o, d, t_min, t_max))
    orig = None
    if n >= MIN_SORT_RAYS:
        # Apply the coherence permutation with VARIADIC SORTS, not
        # gather/scatter: XLA TPU gathers/scatters with 1M dynamic indices
        # run effectively serially (measured ~15 ms per gather and ~37 ms
        # per scatter per call), while lax.sort is a fast parallel network —
        # carrying the ray components as sort payloads costs ~2-6 ms total.
        # The original index rides along; the outputs sort back by it.
        lo = node_table[0, 0:3]
        key = _coherence_keys(
            o, d, t_min, t_max, lo, node_table[0, 3:6] - lo
        )
        iota = jnp.arange(n, dtype=jnp.int32)
        (_, ox, oy, oz, dx, dy, dz, t_min, t_max, orig) = jax.lax.sort(
            (key, o[:, 0], o[:, 1], o[:, 2],
             d[:, 0], d[:, 1], d[:, 2], t_min, t_max, iota),
            num_keys=1,
        )
        o = jnp.stack([ox, oy, oz], axis=-1)
        d = jnp.stack([dx, dy, dz], axis=-1)
    comps, n, nb = _ray_blocks(o, d, t_min, jnp.minimum(t_max, jnp.float32(_BIG)))
    max_steps = 4 * node_table.shape[0] + 64
    # small tables walk via SMEM scalar loads; big ones via one-hot MXU
    smem_nodes = node_table.shape[0] <= SMEM_NODE_ROWS
    if smem_nodes:
        node_arg = node_table.reshape(-1)
        node_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    else:
        node_arg = node_table
        node_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = partial(
        _traverse_kernel, opaque_only=opaque_only, max_steps=max_steps,
        smem_nodes=smem_nodes,
    )
    t, slot, u, v = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[_ray_spec] * 8
        + [
            node_spec,  # node table (SMEM flat or VMEM (N,8))
            pl.BlockSpec(memory_space=pl.ANY),  # tri table (HBM)
        ],
        out_specs=[_ray_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((nb, SUB, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb, SUB, 128), jnp.int32),
            jax.ShapeDtypeStruct((nb, SUB, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb, SUB, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K_CHUNK, TRI_COLS, CLUSTER), jnp.float32),  # DMA bufs
            pltpu.VMEM((TRI_COLS, CLUSTER), jnp.float32),  # staged work block
            pltpu.SemaphoreType.DMA((K_CHUNK,)),
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((K_CHUNK,), jnp.int32),
            pltpu.SMEM((K_CHUNK,), jnp.int32),
        ],
        interpret=interpret,
    )(*comps, node_arg, tri_table)
    outs = (
        t.reshape(-1)[:n],
        slot.reshape(-1)[:n],
        u.reshape(-1)[:n],
        v.reshape(-1)[:n],
    )
    if orig is not None:
        _, t_u, s_u, u_u, v_u = jax.lax.sort(
            (orig,) + outs, num_keys=1
        )
        outs = (t_u, s_u, u_u, v_u)
    return outs


def _trace_fwd(o, d, t_min, t_max, node_table, tri_table,
               opaque_only=False, interpret=False):
    out = _trace(o, d, t_min, t_max, node_table, tri_table,
                 opaque_only, interpret)
    return out, (o, d, t_min, t_max, node_table, tri_table)


def _trace_bwd(opaque_only, interpret, res, g):
    return tuple(jnp.zeros_like(x) for x in res)


_trace.defvjp(_trace_fwd, _trace_bwd)


def trace_closest_cluster(node_table, tri_table, rays, interpret=False):
    """Closest hit; returns Hit with prim = CANONICAL sorted slot (-1 miss)."""
    from ..core.types import Hit

    t, slot, u, v = _trace(
        rays.origin, rays.direction, rays.t_min, rays.t_max,
        node_table, tri_table, False, interpret,
    )
    found = slot >= 0
    return Hit(
        inst=jnp.where(found, jnp.int32(0), jnp.int32(-1)),
        prim=slot,
        bary=jnp.stack([u, v], axis=-1),
        t=t,
    )


def trace_any_cluster(node_table, tri_table, rays, interpret=False):
    """Occlusion test against opaque triangles; returns bool per ray."""
    t, slot, _, _ = _trace(
        rays.origin, rays.direction, rays.t_min, rays.t_max,
        node_table, tri_table, True, interpret,
    )
    return slot >= 0
