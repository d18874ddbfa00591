"""Subpacket MXU BVH tracer: per-128-ray traversal + all-matmul box/tri tests.

Round-4 flagship experiment (VERDICT item 1). The cluster-streaming tracer
(ops/cluster_pallas.py) traverses per 2048-lane packet with ONE shared
stack; a leaf cluster is tested against every lane when ANY lane's slab test
passes — on incoherent bounce rays the packet's union is several times the
per-ray useful work. This kernel instead traverses per SUBPACKET: 128
consecutive (coherence-sorted) rays = one vreg row = one grid step, each
with its own stack, so a ray pays only its 128-neighborhood's union.

Architecture (everything per-step lives on the MXU; the scalar unit only
runs the stack machine):

- BVH8: the binary cluster BVH is collapsed 8-wide (build_bvh8) because a
  per-node scalar step costs ~440 cycles (loop-carried scalar chain with a
  vector->scalar sync — measured, PERF.md round 4).
- Phase A pops POPS nodes per iteration and tests ALL their 8*POPS child
  slabs with ONE K=8 matmul against ray features [ix,iy,iz,-o*i,1]
  (build_slab_meta stores nodes as matmul-ready (8, SLAB_COLS) blocks);
  the hit flags come back as ONE packed-int vector->scalar extract. Empty
  child slots carry +inf constants — a finite sentinel fails against rays
  whose best_t is still _BIG and re-pushes the root (a runaway-traversal
  bug this file shipped with for a few hours).
- Phase B tests triangle clusters with the Woop unit-triangle transform
  W = [e1, e2, n]^-1 as a (8, GW*1024) x (8, 128) matmul (t = -o'z/d'z,
  u = o'x + t d'x, v = o'y + t d'y are affine in the same 8 ray features),
  epilogue = dense (128,128) mask + key-packed sublane min + masked-min
  winner slot; blocks stream HBM->VMEM with rolling DMA (at most 2 groups
  in flight — 40 concurrent DMAs overflow the queue and abort the worker).

STATUS (measured on v5e, 512k-tri scene, correct kernel): camera 7.3
Mray/s vs cluster 14.6; incoherent bounce 2.26 vs 2.11; shadow-any 11.5 vs
~30. The union shrink is real (~145 queued clusters per 128-ray subpacket
vs a shared walk over 2048) but does NOT pay: the giant-packet unrolled MT
amortizes to ~6.6 ns/ray/entry while the 128-ray Woop matmul floors at
~8-11 ns/ray/entry, and multi-pop batching defers best_t tightening so
more queued clusters survive. Kept OPT-IN (LR_SUBPACKET=1) as the
foundation for per-mesh BLAS instancing and future tuning; the cluster
tracer remains the default large-scene path. Full diagnosis in PERF.md.

Precision: matmuls run at Precision.HIGHEST (6-pass f32 emulation) —
DEFAULT is single-pass bf16 under --xla_allow_excess_precision and would
round AABB-scale coordinates to 8-bit mantissas. Even at HIGHEST, t/u/v
are algebraically rearranged vs Möller-Trumbore, so hits within ~1e-5 of
an edge can differ from the brute tracers; the wrapper therefore returns
bary = NaN and scene/geometry.py recomputes EXACT (u, v) from the winning
triangle's shade row (already fetched there) — zero extra gathers.

Like the other tracers: zero-gradient custom VJP (geometry is constant wrt
scene parameters; diff/render.py detaches sampled directions).

Reference parity: stands in for hardware RT-core traversal
(/root/reference/src/base/geometry.cpp:218-279) at bedroom-class scenes.
"""

from __future__ import annotations

import os as _os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cluster_pallas import (
    _BIG,
    CLUSTER,
    _coherence_keys,
)

# Opt-in (see STATUS in the module docstring): correct and tested, but the
# cluster tracer still wins camera + shadow waves on the 512k bench, so
# routing stays with it until this kernel's Phase-B economics improve.
ENABLED = _os.environ.get("LR_SUBPACKET", "0") != "0"
SUBN = 128  # rays per subpacket = one vreg row = one grid step
GROUPS = 8  # o'x o'y o'z d'x d'y d'z slot opq
WOOP_COLS = GROUPS * CLUSTER  # 1024
K_CHUNK = int(_os.environ.get("LR_SUBPACKET_KCHUNK", 8))
assert K_CHUNK >= 1
MIN_SORT_RAYS = 32768
_INVALID_KEY = 0x7F7FFFFF  # float32 max bit pattern (python int: the kernel
# must not close over traced jnp constants)

# --- BVH8 (8-wide) node layout -------------------------------------------
# Round-4 measurement (PERF.md): the BINARY per-subpacket stack walk costs
# ~440 cycles PER STEP — each iteration is a loop-carried scalar chain with
# a vector->scalar sync (jnp.any) in the middle, and a bounce subpacket
# does ~677 of them. The 8-wide node tests all 8 children as straight-line
# vector code with ONE (8,128)-vreg lane-reduction per step, cutting steps
# ~4-6x at similar per-step cost.
#
# Record: 8 children x 8 floats, flat (N8, 64) f32 (SMEM as (N8*64,)):
#   child c at [c*8 .. c*8+7]: minx miny minz maxx maxy maxz enc meta
#   enc: >= 1.0 -> interior (value = 8-ary child node index, exact f32)
#        <= -1.0 -> leaf (cluster block = -enc-1)
#        0.0 with min=+BIG -> empty slot (slab always fails)
#   meta (child 0 only): dominant child-sort axis (0/1/2) — children are
#   host-sorted by centroid along it; the kernel walks them ascending or
#   descending by the subpacket mean-direction sign (near-first order for
#   best_t pruning).
N8_COLS = 64
MAX_SLAB8_NODES = 2048  # VMEM cap for the slab table (8 MB at the padded
# (8, 128) block size); bigger scenes (> ~1.6M tris) fall back to the
# cluster tracer
# Multi-pop traversal makes the live frontier MUCH deeper than a 1-pop
# depth-first stack (a 256-entry stack overflowed SMEM and aborted the TPU
# worker); every node is pushed at most once, so N8 bounds it exactly.
STACK8_DEPTH = MAX_SLAB8_NODES + 128
POPS = int(_os.environ.get("LR_SUBPACKET_POPS", 4))  # nodes popped + tested
# per Phase-A iteration (32 child slabs in ONE matmul; breaks the serial
# per-node latency chain — PERF.md round 4)
SLAB_COLS = 128  # 6 planes x 8 children (plane-major: plane p, child c at
# column p*8 + c; cols 48+ are zero padding) — padded to the 128-lane tile
# so the kernel's dynamically-indexed (8, SLAB_COLS) block loads stay
# aligned (a 48-wide minor dim aborted the TPU worker)
KQ = K_CHUNK + POPS * 8  # leaf queue: Phase A may overshoot by one batch
GW = int(_os.environ.get("LR_SUBPACKET_GW", 2))  # clusters per Phase-B matmul
_ROLLDMA = _os.environ.get("LR_SUBPACKET_ROLLDMA", "1") != "0"
# debug: emit per-subpacket (a_iterations << 16 | b_entries) as a 3rd output
DEBUG_COUNTERS = _os.environ.get("LR_SUBPACKET_DEBUG", "0") != "0"


# ---------------------------------------------------------------------------
# Host-side Woop coefficient table
# ---------------------------------------------------------------------------


def build_woop_table(tri_table: np.ndarray) -> np.ndarray:
    """(C, 8, WOOP_COLS) f32 Woop blocks from the cluster tri table.

    tri_table: (C, 16, 128) attribute-major MT blocks from
    cluster_pallas.build_cluster_tables (rows 0:3 v0, 3:6 e1, 6:9 e2,
    9 valid, 10 opaque, 11 canonical slot). Row layout of the result
    (= the 8 ray features the kernel contracts against):
      row 0..2: coefficient on (ox, oy, oz)
      row 3:    constant term (feature value 1.0)
      row 4..6: coefficient on (dx, dy, dz)
      row 7:    unused (feature value 0.0)
    Column groups g*128 + j (triangle j of the cluster):
      g=0..2: o'x/o'y/o'z = W[g](o - v0)   -> rows 0:3 = W[g], row 3 = -W[g].v0
      g=3..5: d'x/d'y/d'z = W[g-3] d       -> rows 4:7 = W[g-3]
      g=6:    canonical slot (-1 invalid/degenerate) -> row 3
      g=7:    opaque flag                            -> row 3
    """
    tri = np.asarray(tri_table, np.float32)
    c = tri.shape[0]
    v0 = tri[:, 0:3, :].transpose(0, 2, 1).reshape(-1, 3)  # (C*128, 3)
    e1 = tri[:, 3:6, :].transpose(0, 2, 1).reshape(-1, 3)
    e2 = tri[:, 6:9, :].transpose(0, 2, 1).reshape(-1, 3)
    valid = tri[:, 9, :].reshape(-1) > 0.0
    opq = tri[:, 10, :].reshape(-1)
    slot = tri[:, 11, :].reshape(-1)

    n = np.cross(e1, e2)
    # A = [e1 | e2 | n] (columns); W = A^-1 via the adjugate. det(A) = |n|^2.
    det = np.einsum("ij,ij->i", n, n)
    ok = valid & (det > 1e-30) & np.isfinite(det)
    inv_det = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    # rows of W: cross products of A's other two columns over det
    w0 = np.cross(e2, n) * inv_det[:, None]
    w1 = np.cross(n, e1) * inv_det[:, None]
    w2 = n * inv_det[:, None]
    slot = np.where(ok, slot, -1.0)

    woop = np.zeros((c * CLUSTER, GROUPS, 8), np.float32)
    for g, w in enumerate((w0, w1, w2)):
        woop[:, g, 0:3] = w
        woop[:, g, 3] = -np.einsum("ij,ij->i", w, v0)
        woop[:, g + 3, 4:7] = w
    woop[:, 6, 3] = slot
    woop[:, 7, 3] = np.where(ok, opq, 0.0)
    # -> (C, 8 features, GROUPS*128): group-major columns, triangle minor
    woop = woop.reshape(c, CLUSTER, GROUPS, 8).transpose(0, 3, 2, 1)
    return np.ascontiguousarray(woop.reshape(c, 8, WOOP_COLS))


def build_bvh8(node_table: np.ndarray) -> np.ndarray:
    """Collapse the binary cluster BVH ((N, 8) rows from
    build_cluster_tables) into a (N8, 64) 8-wide table (layout above).

    Grouping: starting from a binary node, repeatedly expand the
    largest-surface-area interior member until 8 members are reached (the
    standard wide-BVH collapse); members that remain interior become 8-ary
    children (recursed), binary leaves become leaf slots."""
    node = np.asarray(node_table, np.float32)
    right = np.floor(node[:, 6]).astype(np.int64)  # -1 = leaf
    first = node[:, 7].astype(np.int64)  # leaf cluster block, -1 interior
    is_leaf = first >= 0

    mins = node[:, 0:3]
    maxs = node[:, 3:6]
    # float64: padded rows carry +/-BIG sentinels whose difference overflows
    ext = np.maximum(maxs.astype(np.float64) - mins.astype(np.float64), 0.0)
    area = ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] + ext[:, 2] * ext[:, 0]

    def collect(i):
        group = [int(i)]
        while len(group) < 8:
            cand = [g for g in group if not is_leaf[g]]
            if not cand:
                break
            g = max(cand, key=lambda x: area[x])
            if len(group) + 1 > 8:
                break
            group.remove(g)
            group += [g + 1, int(right[g])]
        return group

    records = []
    # BFS so child indices are assigned before being written
    queue = [0]
    index_of = {0: 0}
    records.append(None)
    qi = 0
    while qi < len(queue):
        b = queue[qi]
        my8 = index_of[b]
        qi += 1
        group = collect(b)
        # sort children by centroid along the axis of max centroid spread
        cents = 0.5 * (mins[group] + maxs[group])
        axis = (
            int(np.argmax(cents.max(0) - cents.min(0)))
            if len(group) > 1 else 0
        )
        group = sorted(
            group, key=lambda g: 0.5 * (mins[g][axis] + maxs[g][axis])
        )
        rec = np.zeros(N8_COLS, np.float32)
        for c in range(8):
            base = c * 8
            if c < len(group):
                g = group[c]
                rec[base:base + 3] = mins[g]
                rec[base + 3:base + 6] = maxs[g]
                if is_leaf[g]:
                    rec[base + 6] = -float(first[g]) - 1.0
                else:
                    idx = index_of.get(g)
                    if idx is None:
                        idx = len(records)
                        index_of[g] = idx
                        records.append(None)
                        queue.append(g)
                    rec[base + 6] = float(idx)
            else:
                rec[base + 0] = _BIG
                rec[base + 3] = -_BIG
        rec[7] = float(axis)
        records[my8] = rec
    table8 = np.stack(records, axis=0)
    assert table8.shape[0] < (1 << 23)
    return table8


def build_slab_meta(table8: np.ndarray):
    """Matmul-ready Phase-A tables from the (N8, 64) BVH8 table.

    Returns (slab8 (N8, 8, SLAB_COLS) f32 — cols 48+ zero, meta8 (N8, 16)
    f32).

    slab8[n] @ feats -> the 48 slab t-values of node n's children in ONE
    K=8 contraction, where feats rows are
    [ix, iy, iz, -ox*ix, -oy*iy, -oz*iz, 1, 0] per ray:
      col p*8 + c (plane p of child c):
        p = 2a   (low  plane of axis a): row a = min_a, row 3+a = 1
        p = 2a+1 (high plane of axis a): row a = max_a, row 3+a = 1
      empty slots instead put +BIG on the constant row for every plane:
      near = BIG > far = best_t -> guaranteed miss with no decode logic.
    meta8[n]: cols 0..7 = child enc (>=1 interior index, <=-1 leaf block),
    col 8 = axis + 4 * leafmask (packed scalars for ONE SMEM load);
    meta8[0] cols 10:16 = world lo/hi (for the wrapper's sort keys).
    """
    t8 = np.asarray(table8, np.float32)
    n8 = t8.shape[0]
    rec = t8.reshape(n8, 8, 8)
    mins = rec[:, :, 0:3]
    maxs = rec[:, :, 3:6]
    enc = rec[:, :, 6]
    axis = rec[:, 0, 7]
    empty = mins[:, :, 0] >= 1e29

    slab = np.zeros((n8, 8, SLAB_COLS), np.float32)
    for a in range(3):
        for hi in range(2):
            p = 2 * a + hi
            cols = slice(p * 8, p * 8 + 8)
            bound = (maxs if hi else mins)[:, :, a]
            slab[:, a, cols] = np.where(empty, 0.0, bound)
            slab[:, 3 + a, cols] = np.where(empty, 0.0, 1.0)
            # +inf, NOT _BIG: near = max(...)=C and far = min(C, best_t)
            # with a finite C still HIT rays whose best_t >= C — live rays
            # start at best_t = _BIG, so _BIG-constant empty slots passed
            # the slab test and re-pushed enc=0 (the ROOT), sending the
            # walk into a runaway loop with garbage results (round-4 bug)
            slab[:, 6, cols] = np.where(empty, np.inf, 0.0)

    # fold -ox*ix into the same row as a pure coefficient: row 3+a already
    # multiplies feature -o_a*i_a by 1; nothing else needed.
    leafmask = ((enc <= -1.0) & ~empty).astype(np.int64)
    packed = axis.astype(np.int64) + 4 * (
        leafmask * (1 << np.arange(8))[None, :]
    ).sum(axis=1)
    meta = np.zeros((n8, 16), np.float32)
    meta[:, 0:8] = np.where(empty, 0.0, enc)
    meta[:, 8] = packed.astype(np.float32)
    valid = ~empty
    lo = np.min(np.where(valid[0][:, None], mins[0], _BIG), axis=0)
    hi = np.max(np.where(valid[0][:, None], maxs[0], -_BIG), axis=0)
    meta[0, 10:13] = lo
    meta[0, 13:16] = hi
    return slab, meta


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _subpacket_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
    slab_ref, meta_ref, woop_hbm,
    *out_and_scratch,
    opaque_only: bool, max_steps: int,
):
    if DEBUG_COUNTERS:
        (t_o, slot_o, cnt_o, buf_ref, sem_ref, stack_ref,
         leaf_first_ref) = out_and_scratch
    else:
        (t_o, slot_o, buf_ref, sem_ref, stack_ref,
         leaf_first_ref) = out_and_scratch
        cnt_o = None
    # ray blocks are (1, 1, SUBN); drop the leading grid axis -> (1, SUBN)
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    t_min = tmin_ref[0]

    def safe_inv(v):
        tiny = 1e-12
        return 1.0 / jnp.where(jnp.abs(v) < tiny, jnp.where(v < 0, -tiny, tiny), v)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    mdx, mdy, mdz = jnp.sum(dx), jnp.sum(dy), jnp.sum(dz)
    entry_dead = tmax_ref[0] <= t_min

    # ray feature matrix for the Woop contraction: (8, SUBN)
    feats = jnp.concatenate(
        [ox, oy, oz, jnp.ones_like(ox), dx, dy, dz, jnp.zeros_like(ox)],
        axis=0,
    )
    # ray feature matrix for the slab contraction (build_slab_meta)
    sfeats = jnp.concatenate(
        [ix, iy, iz, -ox * ix, -oy * iy, -oz * iz,
         jnp.ones_like(ox), jnp.zeros_like(ox)],
        axis=0,
    )

    stack_ref[0] = 0

    def outer_cond(c):
        sp, steps, best_t, best_s, ents = c
        go = (sp > 0) & (steps < max_steps)
        if opaque_only:
            go &= jnp.logical_not(jnp.all((best_s >= 0.0) | entry_dead))
        return go

    def outer_body(c):
        sp, steps, best_t, best_s, ents = c

        # ---- Phase A: pop POPS nodes per iteration; ALL their 8*POPS
        # child slab tests ride ONE K=8 matmul, and ALL hit flags come back
        # in ONE packed-int vector->scalar extract. This breaks the serial
        # per-node latency chain that dominated the scalar walk (measured
        # ~440 cycles per BINARY node and ~1400 per scalar-walk 8-wide
        # node, PERF.md round 4).
        def a_cond(s):
            sp, nl, steps = s
            return (sp > 0) & (nl < K_CHUNK) & (steps < max_steps)

        def a_body(s):
            sp, nl, steps = s
            m = jnp.minimum(sp, POPS)
            nodes = [stack_ref[jnp.maximum(sp - 1 - i, 0)] for i in range(POPS)]
            sp = sp - m
            blocks = [slab_ref[nodes[i]] for i in range(POPS)]
            sb = jnp.concatenate(blocks, axis=1)  # (8, POPS*SLAB_COLS)
            y = jax.lax.dot_general(
                sb, sfeats,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (POPS*SLAB_COLS, SUBN)
            hit_rows = []
            for i in range(POPS):
                yb = y[i * SLAB_COLS:(i + 1) * SLAB_COLS]
                t0x, t1x = yb[0:8], yb[8:16]
                t0y, t1y = yb[16:24], yb[24:32]
                t0z, t1z = yb[32:40], yb[40:48]
                near = jnp.maximum(
                    jnp.maximum(
                        jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)
                    ),
                    jnp.maximum(jnp.minimum(t0z, t1z), t_min),
                )
                far = jnp.minimum(
                    jnp.minimum(
                        jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)
                    ),
                    jnp.minimum(jnp.maximum(t0z, t1z), best_t),
                )
                hit_rows.append((near <= far).astype(jnp.int32))
            hits = jnp.concatenate(hit_rows, axis=0)  # (POPS*8, SUBN)
            rowany = jnp.max(hits, axis=1, keepdims=True)  # (POPS*8, 1)
            iota = jax.lax.broadcasted_iota(jnp.int32, (POPS * 8, 1), 0)
            flagbits = jnp.sum(rowany << iota)  # ONE extract: bit i*8+ch

            for i in range(POPS):
                node_valid = i < m
                mbase = nodes[i] * 16
                packed = meta_ref[mbase + 8].astype(jnp.int32)
                axis = packed & 3
                leafmask = packed >> 2
                md = jnp.where(
                    axis == 0, mdx, jnp.where(axis == 1, mdy, mdz)
                )
                asc = md >= 0.0
                nbits = (flagbits >> (i * 8)) & 0xFF
                # leaves enqueue in VISIT order (near-first); interiors
                # push in REVERSE visit order so the near child pops first
                for k in range(8):
                    c_v = jnp.where(asc, k, 7 - k)
                    hit_v = ((nbits >> c_v) & 1) > 0
                    leaf_v = ((leafmask >> c_v) & 1) > 0
                    take = node_valid & hit_v & leaf_v

                    @pl.when(take)
                    def _(mbase=mbase, c_v=c_v):
                        enc = meta_ref[mbase + c_v]
                        leaf_first_ref[nl] = (-enc - 1.0).astype(jnp.int32)

                    nl = nl + take.astype(jnp.int32)
                for k in range(8):
                    c_r = jnp.where(asc, 7 - k, k)
                    hit_r = ((nbits >> c_r) & 1) > 0
                    leaf_r = ((leafmask >> c_r) & 1) > 0
                    push = node_valid & hit_r & jnp.logical_not(leaf_r)

                    @pl.when(push)
                    def _(mbase=mbase, c_r=c_r):
                        enc = meta_ref[mbase + c_r]
                        stack_ref[sp] = enc.astype(jnp.int32)

                    sp = sp + push.astype(jnp.int32)
            return sp, nl, steps + 1

        sp, nl, steps = jax.lax.while_loop(a_cond, a_body, (sp, 0, steps))

        # ---- Phase B: every queued Woop block DMAs into its own column
        # band of ONE (8, KQ*WOOP_COLS) buffer. Groups of GW clusters are
        # tested by a SINGLE matmul reading the DMA buffer directly (no
        # staging copy, amortized MXU latency); stale bands past nl are
        # masked in the epilogue. DMA issue is rolling, two groups ahead —
        # the queue can hold up to KQ=40 blocks and starting them ALL at
        # once overflows the DMA queue (aborted the TPU worker).
        def dma_start(i):
            @pl.when(i < nl)
            def _():
                pltpu.make_async_copy(
                    woop_hbm.at[leaf_first_ref[i]],
                    buf_ref.at[:, pl.ds(i * WOOP_COLS, WOOP_COLS)],
                    sem_ref.at[i],
                ).start()

        if _ROLLDMA:
            for i in range(2 * GW):
                dma_start(i)
        else:
            for i in range(KQ):
                dma_start(i)

        def g_body(g, carry):
            best_t, best_s = carry
            for ci in range(GW):
                j = g * GW + ci
                if _ROLLDMA:
                    dma_start((g + 2) * GW + ci)

                @pl.when(j < nl)
                def _(j=j):
                    pltpu.make_async_copy(
                        woop_hbm.at[leaf_first_ref[j]],
                        buf_ref.at[:, pl.ds(j * WOOP_COLS, WOOP_COLS)],
                        sem_ref.at[j],
                    ).wait()

            off = pl.multiple_of(g * (GW * WOOP_COLS), GW * WOOP_COLS)
            yg = jax.lax.dot_general(
                buf_ref[:, pl.ds(off, GW * WOOP_COLS)], feats,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (GW*WOOP_COLS, SUBN)
            for ci in range(GW):
                y = yg[ci * WOOP_COLS:(ci + 1) * WOOP_COLS]
                ozp = y[2 * CLUSTER:3 * CLUSTER]
                dzp = y[5 * CLUSTER:6 * CLUSTER]
                t = -ozp / dzp
                u = y[0:CLUSTER] + t * y[3 * CLUSTER:4 * CLUSTER]
                v = y[CLUSTER:2 * CLUSTER] + t * y[4 * CLUSTER:5 * CLUSTER]
                slotv = y[6 * CLUSTER:7 * CLUSTER]
                ok = (
                    (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                    & (t > t_min) & (t < best_t) & (slotv >= 0.0)
                    & (g * GW + ci < nl)
                )
                if opaque_only:
                    ok &= y[7 * CLUSTER:8 * CLUSTER] > 0.5
                    # any-hit: found lanes' windows collapse via best_s
                    hit_row = jnp.max(
                        jnp.where(ok, 1.0, 0.0), axis=0, keepdims=True
                    )
                    best_s = jnp.maximum(best_s, hit_row - 0.5)
                    continue
                key = jnp.where(
                    ok, jax.lax.bitcast_convert_type(t, jnp.int32),
                    jnp.int32(_INVALID_KEY),
                )
                bt_bits = jnp.min(key, axis=0, keepdims=True)
                hit = bt_bits < jnp.int32(_INVALID_KEY)
                btf = jax.lax.bitcast_convert_type(bt_bits, jnp.float32)
                mask = key == bt_bits
                slot_w = jnp.min(
                    jnp.where(mask, slotv, jnp.float32(_BIG)),
                    axis=0, keepdims=True,
                )
                best_t = jnp.where(hit, btf, best_t)
                best_s = jnp.where(hit, slot_w, best_s)
            return best_t, best_s

        ng = (nl + GW - 1) // GW
        ents = ents + nl
        best_t, best_s = jax.lax.fori_loop(0, ng, g_body, (best_t, best_s))
        if opaque_only:
            # collapse found lanes' slab windows so later chunks shrink
            best_t = jnp.where(best_s >= 0.0, -_BIG, best_t)
        return sp, steps, best_t, best_s, ents

    init = (
        1,
        0,
        jnp.minimum(tmax_ref[0], _BIG),
        jnp.full((1, SUBN), -1.0, jnp.float32),
        0,
    )
    _, steps_f, best_t, best_s, ents_f = jax.lax.while_loop(
        outer_cond, outer_body, init
    )
    if cnt_o is not None:
        cnt_o[0] = (
            jnp.zeros((1, SUBN), jnp.int32) + steps_f * 65536 + ents_f
        )
    found = best_s >= 0.0
    t_o[0] = jnp.where(found, best_t, jnp.inf)
    slot_o[0] = jnp.where(
        found, best_s, -1.0
    ).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------


# (nb, 1, SUBN) arrays with (1, 1, SUBN) blocks: the TPU lowering requires
# the last two block dims be (8k, 128k) OR equal to the array dims — a flat
# (nb, 128) array with (1, 128) blocks violates the sublane rule.
_ray_spec = pl.BlockSpec(
    (1, 1, SUBN), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _trace(o, d, t_min, t_max, slab8, meta8, woop_table,
           opaque_only=False, interpret=False):
    n = o.shape[0]
    # strip weak types: jnp.full(..., py_float) inputs are weak-f32 while
    # np-array inputs are strong — identical programs would recompile
    # (~3 min for this kernel) on that alone
    o, d, t_min, t_max = (
        x.astype(jnp.float32) for x in (o, d, t_min, t_max)
    )
    o, d, t_min, t_max = jax.lax.optimization_barrier((o, d, t_min, t_max))
    orig = None
    if n >= MIN_SORT_RAYS:
        # scene bounds ride in meta8[0, 10:16] (build_slab_meta)
        lo = meta8[0, 10:13]
        hi = meta8[0, 13:16]
        key = _coherence_keys(o, d, t_min, t_max, lo, hi - lo)
        iota = jnp.arange(n, dtype=jnp.int32)
        (_, ox, oy, oz, dx, dy, dz, t_min, t_max, orig) = jax.lax.sort(
            (key, o[:, 0], o[:, 1], o[:, 2],
             d[:, 0], d[:, 1], d[:, 2], t_min, t_max, iota),
            num_keys=1,
        )
        o = jnp.stack([ox, oy, oz], axis=-1)
        d = jnp.stack([dx, dy, dz], axis=-1)

    pad = (-n) % SUBN
    nb = (n + pad) // SUBN

    def prep(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(nb, 1, SUBN)

    comps = [
        prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
        prep(d[:, 0]), prep(d[:, 1], 1.0), prep(d[:, 2]),
        prep(t_min), prep(jnp.minimum(t_max, jnp.float32(_BIG)), -1.0),
    ]
    n8 = slab8.shape[0]
    max_steps = 4 * n8 + 64
    kernel = partial(
        _subpacket_kernel, opaque_only=opaque_only, max_steps=max_steps,
    )
    outs_all = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[_ray_spec] * 8
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # slab8 (N8, 8, 48)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta8 flat
            pl.BlockSpec(memory_space=pl.ANY),  # woop table (HBM)
        ],
        out_specs=[_ray_spec] * (3 if DEBUG_COUNTERS else 2),
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1, SUBN), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, SUBN), jnp.int32),
        ] + ([jax.ShapeDtypeStruct((nb, 1, SUBN), jnp.int32)]
             if DEBUG_COUNTERS else []),
        scratch_shapes=[
            pltpu.VMEM((8, KQ * WOOP_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((KQ,)),
            pltpu.SMEM((STACK8_DEPTH,), jnp.int32),
            pltpu.SMEM((KQ,), jnp.int32),
        ],
        interpret=interpret,
    )(*comps, slab8, meta8.reshape(-1), woop_table)
    if DEBUG_COUNTERS:
        t, slot, cnt = outs_all
        outs_all = (t, slot)
        _trace.last_counters = cnt  # (nb, 1, SUBN) packed debug counters
    t, slot = outs_all
    outs = (t.reshape(-1)[:n], slot.reshape(-1)[:n])
    if orig is not None:
        _, t_u, s_u = jax.lax.sort((orig,) + outs, num_keys=1)
        outs = (t_u, s_u)
    return outs


def _trace_fwd(o, d, t_min, t_max, slab8, meta8, woop_table,
               opaque_only=False, interpret=False):
    out = _trace(o, d, t_min, t_max, slab8, meta8, woop_table,
                 opaque_only, interpret)
    return out, (o, d, t_min, t_max, slab8, meta8, woop_table)


def _trace_bwd(opaque_only, interpret, res, g):
    return tuple(jnp.zeros_like(x) for x in res)


_trace.defvjp(_trace_fwd, _trace_bwd)


def trace_closest_subpacket(slab8, meta8, woop_table, rays, interpret=False):
    """Closest hit; prim = CANONICAL sorted slot (-1 miss); bary = NaN
    (recomputed exactly in scene/geometry.py from the winner's shade row)."""
    from ..core.types import Hit

    t, slot = _trace(
        rays.origin, rays.direction, rays.t_min, rays.t_max,
        slab8, meta8, woop_table, False, interpret,
    )
    found = slot >= 0
    nan2 = jnp.full(t.shape + (2,), jnp.nan, jnp.float32)
    return Hit(
        inst=jnp.where(found, jnp.int32(0), jnp.int32(-1)),
        prim=slot,
        bary=nan2,
        t=t,
    )


def trace_any_subpacket(slab8, meta8, woop_table, rays, interpret=False):
    """Occlusion test against opaque triangles; bool per ray."""
    t, slot = _trace(
        rays.origin, rays.direction, rays.t_min, rays.t_max,
        slab8, meta8, woop_table, True, interpret,
    )
    return slot >= 0
