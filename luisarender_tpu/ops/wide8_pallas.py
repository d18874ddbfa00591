"""Wide-block BVH8 tracer: matmul Phase A + the proven MT Phase B.

Round-4 synthesis of two measured facts (PERF.md):
- the cluster tracer's SHARED 2048-lane walk amortizes per-ray traversal
  cost 16x better than per-128-ray subpackets (whose smaller cluster union
  does not pay for the lost amortization), but ~80% of its bounce time is
  the SCALAR stack walk at ~440 cycles per binary node (loop-carried
  scalar chain + a vector->scalar sync per node);
- the subpacket experiment's Phase A — an 8-wide BVH whose child slab
  tests are a K=8 matmul over [ix,iy,iz,-o*i,1] ray features, multi-pop
  batched with ONE packed-int flag extract per batch — removes exactly
  that serial chain.

So this kernel keeps the cluster tracer's economics (BLOCK=2048 rays, one
shared stack, K_CHUNK-leaf collection, double-buffered HBM DMA of (16,128)
triangle blocks, the 128-wide unrolled Moller-Trumbore loop with exact
t/u/v/slot) and swaps ONLY Phase A for the BVH8 matmul walk
(ops/subpacket_pallas.py build_slab_meta tables; POPS=2 nodes per
iteration — the slab matmul output is (POPS*48, 2048), so deeper batching
costs VMEM and matmul FLOPs linearly while the scalar win saturates).

Rays live as (1, 2048) lane vectors end-to-end (ray blocks are (1, 1,
2048)): elementwise MT math is layout-identical to the cluster kernel's
(16, 128) form, and the slab matmul needs its N dimension flat — this
avoids every relayout.

MEASURED (512k-tri scene, v5e): camera 13.1 Mray/s vs cluster 14.6,
bounce 2.01 vs 2.11, shadow-any 15.1 — numerically IDENTICAL to the
cluster tracer (same MT Phase B; cross-check slot agreement 1.0) but
~5-10%% slower: the matmul walk did not help because Phase A was never
the cluster kernel's bounce wall — Phase B's (entries x 13.6 us MT) is,
i.e. the speculative union itself. That closes the round-4 Phase-A line
of attack and points round 5 at Phase-B economics (64-tri clusters,
union reduction). Opt-in via LR_WIDE8=1; cluster stays the default.

Reference parity: the Accel::intersect RT-core stand-in
(/root/reference/src/base/geometry.cpp:218-279), third generation.
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
    NODE_COLS,
    TRI_COLS,
    _coherence_keys,
)
from .subpacket_pallas import MAX_SLAB8_NODES, SLAB_COLS, STACK8_DEPTH

ENABLED = _os.environ.get("LR_WIDE8", "0") != "0"  # see MEASURED above
BLOCK = 2048  # rays per grid step / shared stack (cluster-kernel value)
POPS = 2  # nodes per Phase-A iteration
SREAL = 48  # real slab columns (6 planes x 8 children); rest is padding
K_CHUNK = 8  # target leaves per Phase-B chunk
KQ = K_CHUNK + POPS * 8  # queue capacity (multi-pop overshoot)
MIN_SORT_RAYS = 32768
_INVALID_KEY = 0x7F7FFFFF


def build_cluster_boxes(node_table: np.ndarray) -> np.ndarray:
    """(C, 8) f32 per-cluster AABBs (min xyz, max xyz, pad) in BLOCK order,
    for the Phase-B re-test against the current best_t (the pruning that
    keeps the queued-entry count near the true working set)."""
    node = np.asarray(node_table, np.float32)
    first = node[:, 7].astype(np.int64)
    leaf = first >= 0
    c = int(first[leaf].max()) + 1 if leaf.any() else 1
    boxes = np.zeros((c, 8), np.float32)
    boxes[first[leaf], 0:3] = node[leaf, 0:3]
    boxes[first[leaf], 3:6] = node[leaf, 3:6]
    return boxes


def _wide_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
    slab_ref, meta_ref, cbox_ref, tri_hbm,
    t_o, slot_o, u_o, v_o,
    buf_ref, work_ref, sem_ref, stack_ref, leaf_first_ref,
    *, opaque_only: bool, max_steps: int,
):
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]  # (1, BLOCK)
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    t_min = tmin_ref[0]

    def safe_inv(v):
        tiny = 1e-12
        return 1.0 / jnp.where(jnp.abs(v) < tiny, jnp.where(v < 0, -tiny, tiny), v)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    mdx, mdy, mdz = jnp.sum(dx), jnp.sum(dy), jnp.sum(dz)
    entry_dead = tmax_ref[0] <= t_min

    sfeats = jnp.concatenate(
        [ix, iy, iz, -ox * ix, -oy * iy, -oz * iz,
         jnp.ones_like(ox), jnp.zeros_like(ox)],
        axis=0,
    )  # (8, BLOCK)

    stack_ref[0] = 0

    def slab_rows(row6, far):
        """Packet slab test from 6 scalar bounds; (1, BLOCK) bool."""
        t0x = (row6[0] - ox) * ix
        t1x = (row6[3] - ox) * ix
        t0y = (row6[1] - oy) * iy
        t1y = (row6[4] - oy) * iy
        t0z = (row6[2] - oz) * iz
        t1z = (row6[5] - oz) * iz
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), t_min),
        )
        far_v = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), far),
        )
        return near <= far_v

    def outer_cond(c):
        sp, steps, best_t, best_s, *_ = c
        go = (sp > 0) & (steps < max_steps)
        if opaque_only:
            go &= jnp.logical_not(jnp.all((best_s >= 0) | entry_dead))
        return go

    def outer_body(c):
        sp, steps, best_t, best_s, best_u, best_v = c

        # ---- Phase A: BVH8 matmul walk, POPS nodes per iteration
        def a_cond(s):
            sp, nl, steps = s
            return (sp > 0) & (nl < K_CHUNK) & (steps < max_steps)

        def a_body(s):
            sp, nl, steps = s
            m = jnp.minimum(sp, POPS)
            nodes = [
                stack_ref[jnp.maximum(sp - 1 - i, 0)] for i in range(POPS)
            ]
            sp = sp - m
            blocks = [slab_ref[nodes[i]][:, :SREAL] for i in range(POPS)]
            sb = jnp.concatenate(blocks, axis=1)  # (8, POPS*SREAL)
            y = jax.lax.dot_general(
                sb, sfeats,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (POPS*SREAL, BLOCK)
            hit_rows = []
            for i in range(POPS):
                yb = y[i * SREAL:(i + 1) * SREAL]
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
            hits = jnp.concatenate(hit_rows, axis=0)  # (POPS*8, BLOCK)
            rowany = jnp.max(hits, axis=1, keepdims=True)
            iota = jax.lax.broadcasted_iota(jnp.int32, (POPS * 8, 1), 0)
            flagbits = jnp.sum(rowany << iota)

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

        # ---- Phase B: rolling DMA of (16,128) triangle blocks + the
        # cluster kernel's unrolled MT loop (exact t/u/v/slot), with the
        # per-cluster AABB re-test against the CURRENT best_t
        # every queue slot owns a buffer (no slot reuse -> no DMA/read
        # races); issue stays rolling so at most K_CHUNK DMAs are in flight
        def dma_start(i):
            @pl.when(i < nl)
            def _():
                pltpu.make_async_copy(
                    tri_hbm.at[leaf_first_ref[i]],
                    buf_ref.at[i],
                    sem_ref.at[i],
                ).start()

        for i in range(K_CHUNK):
            dma_start(i)

        def b_body(j, carry):
            best_t, best_s, best_u, best_v = carry
            pltpu.make_async_copy(
                tri_hbm.at[leaf_first_ref[j]],
                buf_ref.at[j],
                sem_ref.at[j],
            ).wait()

            blk = leaf_first_ref[j]
            cb = blk * 8
            row6 = tuple(cbox_ref[cb + k] for k in range(6))
            alive = jnp.any(slab_rows(row6, best_t))

            for k in range(KQ):

                @pl.when(j == k)
                def _(k=k):
                    work_ref[:] = buf_ref[k]

            dma_start(j + K_CHUNK)

            def do_tests(carry):
                best_t, best_s, best_u, best_v = carry
                for jj in range(CLUSTER):
                    v0x, v0y, v0z = work_ref[0, jj], work_ref[1, jj], work_ref[2, jj]
                    e1x, e1y, e1z = work_ref[3, jj], work_ref[4, jj], work_ref[5, jj]
                    e2x, e2y, e2z = work_ref[6, jj], work_ref[7, jj], work_ref[8, jj]
                    px = dy * e2z - dz * e2y
                    py = dz * e2x - dx * e2z
                    pz = dx * e2y - dy * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                    tx = ox - v0x
                    ty = oy - v0y
                    tz = oz - v0z
                    u = (tx * px + ty * py + tz * pz) * inv_det
                    qx = ty * e1z - tz * e1y
                    qy = tz * e1x - tx * e1z
                    qz = tx * e1y - ty * e1x
                    v = (dx * qx + dy * qy + dz * qz) * inv_det
                    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    ok = (
                        (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                        & (work_ref[9, jj] > 0.0)
                        & (t > t_min) & (t < best_t)
                    )
                    if opaque_only:
                        ok &= work_ref[10, jj] > 0.0
                    sl = work_ref[11, jj].astype(jnp.int32)
                    best_t = jnp.where(ok, t, best_t)
                    best_s = jnp.where(ok, sl, best_s)
                    best_u = jnp.where(ok, u, best_u)
                    best_v = jnp.where(ok, v, best_v)
                return best_t, best_s, best_u, best_v

            return jax.lax.cond(alive, do_tests, lambda c: c, carry)

        best_t, best_s, best_u, best_v = jax.lax.fori_loop(
            0, nl, b_body, (best_t, best_s, best_u, best_v)
        )
        if opaque_only:
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
# Wrapper
# ---------------------------------------------------------------------------


_ray_spec = pl.BlockSpec(
    (1, 1, BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
)


@partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _trace(o, d, t_min, t_max, slab8, meta8, cboxes, tri_table,
           opaque_only=False, interpret=False):
    n = o.shape[0]
    o, d, t_min, t_max = (
        x.astype(jnp.float32) for x in (o, d, t_min, t_max)
    )
    o, d, t_min, t_max = jax.lax.optimization_barrier((o, d, t_min, t_max))
    orig = None
    if n >= MIN_SORT_RAYS:
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

    pad = (-n) % BLOCK
    nb = (n + pad) // BLOCK

    def prep(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(nb, 1, BLOCK)

    comps = [
        prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
        prep(d[:, 0]), prep(d[:, 1], 1.0), prep(d[:, 2]),
        prep(t_min), prep(jnp.minimum(t_max, jnp.float32(_BIG)), -1.0),
    ]
    max_steps = 4 * slab8.shape[0] + 64
    kernel = partial(
        _wide_kernel, opaque_only=opaque_only, max_steps=max_steps,
    )
    t, slot, u, v = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[_ray_spec] * 8
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # slab8
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta8 flat
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cluster boxes flat
            pl.BlockSpec(memory_space=pl.ANY),  # tri table (HBM)
        ],
        out_specs=[_ray_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((KQ, TRI_COLS, CLUSTER), jnp.float32),
            pltpu.VMEM((TRI_COLS, CLUSTER), jnp.float32),
            pltpu.SemaphoreType.DMA((KQ,)),
            pltpu.SMEM((STACK8_DEPTH,), jnp.int32),
            pltpu.SMEM((KQ,), jnp.int32),
        ],
        interpret=interpret,
    )(*comps, slab8, meta8.reshape(-1), cboxes.reshape(-1), tri_table)
    outs = (
        t.reshape(-1)[:n],
        slot.reshape(-1)[:n],
        u.reshape(-1)[:n],
        v.reshape(-1)[:n],
    )
    if orig is not None:
        _, t_u, s_u, u_u, v_u = jax.lax.sort((orig,) + outs, num_keys=1)
        outs = (t_u, s_u, u_u, v_u)
    return outs


def _trace_fwd(o, d, t_min, t_max, slab8, meta8, cboxes, tri_table,
               opaque_only=False, interpret=False):
    out = _trace(o, d, t_min, t_max, slab8, meta8, cboxes, tri_table,
                 opaque_only, interpret)
    return out, (o, d, t_min, t_max, slab8, meta8, cboxes, tri_table)


def _trace_bwd(opaque_only, interpret, res, g):
    return tuple(jnp.zeros_like(x) for x in res)


_trace.defvjp(_trace_fwd, _trace_bwd)


def trace_closest_wide8(slab8, meta8, cboxes, tri_table, rays,
                        interpret=False):
    """Closest hit; prim = CANONICAL sorted slot (-1 miss), exact bary."""
    from ..core.types import Hit

    t, slot, u, v = _trace(
        rays.origin, rays.direction, rays.t_min, rays.t_max,
        slab8, meta8, cboxes, tri_table, False, interpret,
    )
    found = slot >= 0
    return Hit(
        inst=jnp.where(found, jnp.int32(0), jnp.int32(-1)),
        prim=slot,
        bary=jnp.stack([u, v], axis=-1),
        t=t,
    )


def trace_any_wide8(slab8, meta8, cboxes, tri_table, rays, interpret=False):
    """Occlusion test against opaque triangles; bool per ray."""
    t, slot, _, _ = _trace(
        rays.origin, rays.direction, rays.t_min, rays.t_max,
        slab8, meta8, cboxes, tri_table, True, interpret,
    )
    return slot >= 0
