"""Instrument the subpacket tracer: per-subpacket Phase-A step and Phase-B
cluster-entry counts on camera vs bounce waves of the 512k scene, plus an
in-situ Phase-B cost probe (DMA+matmul+epilogue chain exactly as in the
kernel, fixed entry count, no traversal)."""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import luisarender_tpu as lr

sys.path.insert(0, "/root/repo/scratch")
from bench_meshheavy import make_scene

from luisarender_tpu.core.types import Ray
from luisarender_tpu.ops import subpacket_pallas as sp
from luisarender_tpu.ops.cluster_pallas import (
    _BIG, CLUSTER, NODE_COLS, STACK_DEPTH, _coherence_keys,
)

SUBN, WOOP_COLS, K_CHUNK = sp.SUBN, sp.WOOP_COLS, sp.K_CHUNK

scene = lr.Scene.from_dict(make_scene(res=(1280, 720), spp=1, depth=3, n=5, subdiv=5))
compiled = lr.compile_scene(scene)
geom = compiled.trace_geometry(compiled.arrays)
node_table, woop_table = geom.cluster_nodes, geom.cluster_woop
print("nodes", node_table.shape, "woop", woop_table.shape, flush=True)


# ---- instrumented kernel: counts only (no best tracking beyond pruning) ----
def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
            node_ref, woop_hbm, t_o, cnt_o,
            buf_ref, work_ref, sem_ref, stack_ref, leaf_first_ref, leaf_node_ref,
            *, max_steps):
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    t_min = tmin_ref[0]

    def safe_inv(v):
        tiny = 1e-12
        return 1.0 / jnp.where(jnp.abs(v) < tiny, jnp.where(v < 0, -tiny, tiny), v)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    mdx, mdy, mdz = jnp.sum(dx), jnp.sum(dy), jnp.sum(dz)
    feats = jnp.concatenate(
        [ox, oy, oz, jnp.ones_like(ox), dx, dy, dz, jnp.zeros_like(ox)], axis=0)
    stack_ref[0] = 0

    def read_node(idx):
        base = idx * NODE_COLS
        return tuple(node_ref[base + c] for c in range(NODE_COLS))

    def slab(row, far):
        t0x = (row[0] - ox) * ix; t1x = (row[3] - ox) * ix
        t0y = (row[1] - oy) * iy; t1y = (row[4] - oy) * iy
        t0z = (row[2] - oz) * iz; t1z = (row[5] - oz) * iz
        near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                           jnp.maximum(jnp.minimum(t0z, t1z), t_min))
        farv = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                           jnp.minimum(jnp.maximum(t0z, t1z), far))
        return near <= farv

    def outer_cond(c):
        sp_, steps, nb, best_t, best_s = c
        return (sp_ > 0) & (steps < max_steps)

    def outer_body(c):
        sp_, steps, nb, best_t, best_s = c

        def a_cond(s):
            sp_, nl, steps = s
            return (sp_ > 0) & (nl < K_CHUNK) & (steps < max_steps)

        def a_body(s):
            sp_, nl, steps = s
            node = stack_ref[sp_ - 1]
            row = read_node(node)
            hit = jnp.any(slab(row, best_t))
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
                left = node + 1
                md = jnp.where(axis == 0, mdx, jnp.where(axis == 1, mdy, mdz))
                left_near = (md >= 0.0) != left_high
                stack_ref[sp_ - 1] = jnp.where(left_near, right, left)
                stack_ref[sp_] = jnp.where(left_near, left, right)

            sp_ = jnp.where(push, sp_ + 1, sp_ - 1)
            nl = nl + take_leaf.astype(jnp.int32)
            return sp_, nl, steps + 1

        sp_, nl, steps = jax.lax.while_loop(a_cond, a_body, (sp_, 0, steps))

        def dma_start(i, _):
            @pl.when(i < nl)
            def _():
                pltpu.make_async_copy(woop_hbm.at[leaf_first_ref[i]],
                                      buf_ref.at[i], sem_ref.at[i]).start()
            return 0

        jax.lax.fori_loop(0, K_CHUNK, dma_start, 0, unroll=True)

        def b_body(j, carry):
            best_t, best_s, nb = carry
            pltpu.make_async_copy(woop_hbm.at[leaf_first_ref[j]],
                                  buf_ref.at[j], sem_ref.at[j]).wait()
            row = read_node(leaf_node_ref[j])
            alive = jnp.any(slab(row, best_t))
            for k in range(K_CHUNK):
                @pl.when(j == k)
                def _(k=k):
                    work_ref[:] = buf_ref[k]

            def do_tests(carry):
                best_t, best_s, nb = carry
                y = jax.lax.dot_general(
                    work_ref[:], feats, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                ozp = y[2 * CLUSTER:3 * CLUSTER]
                dzp = y[5 * CLUSTER:6 * CLUSTER]
                t = -ozp / dzp
                u = y[0:CLUSTER] + t * y[3 * CLUSTER:4 * CLUSTER]
                v = y[CLUSTER:2 * CLUSTER] + t * y[4 * CLUSTER:5 * CLUSTER]
                slotv = y[6 * CLUSTER:7 * CLUSTER]
                ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                      & (t > t_min) & (t < best_t) & (slotv >= 0.0))
                key = jnp.where(ok, jax.lax.bitcast_convert_type(t, jnp.int32),
                                jnp.int32(0x7F7FFFFF))
                bt_bits = jnp.min(key, axis=0, keepdims=True)
                hit = bt_bits < jnp.int32(0x7F7FFFFF)
                btf = jax.lax.bitcast_convert_type(bt_bits, jnp.float32)
                mask = key == bt_bits
                slot_w = jnp.min(jnp.where(mask, slotv, jnp.float32(_BIG)),
                                 axis=0, keepdims=True)
                best_t = jnp.where(hit, btf, best_t)
                best_s = jnp.where(hit, slot_w, best_s)
                return best_t, best_s, nb + 1

            return jax.lax.cond(alive, do_tests, lambda c: (c[0], c[1], c[2]), carry)

        best_t, best_s, nb = jax.lax.fori_loop(0, nl, b_body, (best_t, best_s, nb))
        return sp_, steps, nb, best_t, best_s

    init = (1, 0, 0, jnp.minimum(tmax_ref[0], _BIG),
            jnp.full((1, SUBN), -1.0, jnp.float32))
    sp_, steps, nb, best_t, best_s = jax.lax.while_loop(outer_cond, outer_body, init)
    t_o[0] = jnp.where(best_s >= 0.0, best_t, jnp.inf)
    z = jnp.zeros((1, SUBN), jnp.int32)
    cnt_o[0] = (z + steps) * 65536 + nb  # packed counters, same per lane


def trace_counts(o, d, t_min, t_max):
    n = o.shape[0]
    _lo = node_table[0, 0:3]
    _ext = node_table[0, 3:6] - _lo
    key = _coherence_keys(o, d, t_min, t_max, _lo, _ext)
    iota = jnp.arange(n, dtype=jnp.int32)
    (_, ox, oy, oz, dx, dy, dz, t_min, t_max, orig) = jax.lax.sort(
        (key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         t_min, t_max, iota), num_keys=1)
    o = jnp.stack([ox, oy, oz], axis=-1)
    d = jnp.stack([dx, dy, dz], axis=-1)
    pad = (-n) % SUBN
    nb = (n + pad) // SUBN

    def prep(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(nb, 1, SUBN)

    comps = [prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
             prep(d[:, 0]), prep(d[:, 1], 1.0), prep(d[:, 2]),
             prep(t_min), prep(jnp.minimum(t_max, jnp.float32(_BIG)), -1.0)]
    max_steps = 4 * node_table.shape[0] + 64
    spec = pl.BlockSpec((1, 1, SUBN), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    t, cnt = pl.pallas_call(
        partial(_kernel, max_steps=max_steps),
        grid=(nb,),
        in_specs=[spec] * 8 + [pl.BlockSpec(memory_space=pltpu.SMEM),
                               pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((nb, 1, SUBN), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 1, SUBN), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((K_CHUNK, 8, WOOP_COLS), jnp.float32),
            pltpu.VMEM((8, WOOP_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((K_CHUNK,)),
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((K_CHUNK,), jnp.int32),
            pltpu.SMEM((K_CHUNK,), jnp.int32),
        ],
    )(*comps, node_table.reshape(-1), woop_table)
    return t, cnt[:, 0, 0]


# ---- ray sets ----
w, h = 1280, 720
ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
origin = np.array([500.0, 350.0, -700.0], np.float32)
front = np.array([0.0, -0.25, 1.0]); front /= np.linalg.norm(front)
up0 = np.array([0.0, 1.0, 0.0]); right = np.cross(front, up0); right /= np.linalg.norm(right)
up = np.cross(right, front); tanf = np.tan(np.radians(50.0) / 2)
px = (xs.ravel() + 0.5) / w * 2 - 1; py = 1 - (ys.ravel() + 0.5) / h * 2
d = (front[None] + right[None] * (px[:, None] * tanf * w / h)
     + up[None] * (py[:, None] * tanf)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
N = d.shape[0]; o = np.tile(origin, (N, 1))

f = jax.jit(trace_counts)
rays_cam = (jnp.asarray(o), jnp.asarray(d), jnp.full(N, 1e-3), jnp.full(N, 3e38))
t0 = time.perf_counter()
t_cam, cnt_cam = f(*rays_cam)
cnt_cam = np.asarray(cnt_cam)
print(f"camera instr {time.perf_counter()-t0:.0f}s", flush=True)

t_cam_np = np.asarray(t_cam).reshape(-1)[:N]
m = np.isfinite(t_cam_np)
hp = o + d * np.minimum(t_cam_np, 3000.0)[:, None]
rng = np.random.default_rng(1)
bd = rng.normal(size=(N, 3)).astype(np.float32)
bd /= np.linalg.norm(bd, axis=1, keepdims=True)
bo = np.where(m[:, None], hp, o).astype(np.float32)
tmax_masked = np.where(m, 3e38, 0.0).astype(np.float32)
_, cnt_b = f(jnp.asarray(bo + bd * 1e-2), jnp.asarray(bd),
             jnp.full(N, 1e-3), jnp.asarray(tmax_masked))
cnt_b = np.asarray(cnt_b)

for name, cnt in (("camera", cnt_cam), ("bounce", cnt_b)):
    steps = cnt >> 16
    entries = cnt & 0xFFFF
    live = entries > 0
    print(f"{name}: subpackets={len(cnt)} live={live.sum()} "
          f"A-steps mean={steps[live].mean():.0f} p50={np.percentile(steps[live],50):.0f} "
          f"p90={np.percentile(steps[live],90):.0f} max={steps.max()} | "
          f"B-entries mean={entries[live].mean():.1f} p50={np.percentile(entries[live],50):.0f} "
          f"p90={np.percentile(entries[live],90):.0f} max={entries.max()} "
          f"total_entries={entries.sum()}", flush=True)

# ---- in-situ Phase-B cost: fixed M entries per subpacket, real DMA chain ----
def _bcost_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref,
                  woop_hbm, t_o, buf_ref, work_ref, sem_ref, *, m_entries):
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    t_min = tmin_ref[0]
    feats = jnp.concatenate(
        [ox, oy, oz, jnp.ones_like(ox), dx, dy, dz, jnp.zeros_like(ox)], axis=0)
    nclusters = woop_hbm.shape[0]
    pid = pl.program_id(0)

    def dma_start(i, _):
        pltpu.make_async_copy(woop_hbm.at[(pid * 7 + i * 13) % nclusters],
                              buf_ref.at[i % K_CHUNK], sem_ref.at[i % K_CHUNK]).start()
        return 0

    jax.lax.fori_loop(0, min(K_CHUNK, m_entries), dma_start, 0, unroll=True)

    def b_body(j, carry):
        best_t, best_s = carry
        pltpu.make_async_copy(woop_hbm.at[(pid * 7 + j * 13) % nclusters],
                              buf_ref.at[j % K_CHUNK], sem_ref.at[j % K_CHUNK]).wait()
        for k in range(K_CHUNK):
            @pl.when(j % K_CHUNK == k)
            def _(k=k):
                work_ref[:] = buf_ref[k]
        y = jax.lax.dot_general(
            work_ref[:], feats, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        ozp = y[2 * CLUSTER:3 * CLUSTER]
        dzp = y[5 * CLUSTER:6 * CLUSTER]
        t = -ozp / dzp
        u = y[0:CLUSTER] + t * y[3 * CLUSTER:4 * CLUSTER]
        v = y[CLUSTER:2 * CLUSTER] + t * y[4 * CLUSTER:5 * CLUSTER]
        slotv = y[6 * CLUSTER:7 * CLUSTER]
        ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t > t_min) & (t < best_t) & (slotv >= 0.0))
        key = jnp.where(ok, jax.lax.bitcast_convert_type(t, jnp.int32),
                        jnp.int32(0x7F7FFFFF))
        bt_bits = jnp.min(key, axis=0, keepdims=True)
        hit = bt_bits < jnp.int32(0x7F7FFFFF)
        btf = jax.lax.bitcast_convert_type(bt_bits, jnp.float32)
        mask = key == bt_bits
        slot_w = jnp.min(jnp.where(mask, slotv, jnp.float32(_BIG)),
                         axis=0, keepdims=True)
        # next DMA
        nxt = j + K_CHUNK

        @pl.when(nxt < m_entries)
        def _():
            pltpu.make_async_copy(woop_hbm.at[(pid * 7 + nxt * 13) % nclusters],
                                  buf_ref.at[nxt % K_CHUNK],
                                  sem_ref.at[nxt % K_CHUNK]).start()

        return (jnp.where(hit, btf, best_t), jnp.where(hit, slot_w, best_s))

    best_t, best_s = jax.lax.fori_loop(
        0, m_entries, b_body,
        (jnp.full((1, SUBN), _BIG, jnp.float32),
         jnp.full((1, SUBN), -1.0, jnp.float32)))
    t_o[0] = best_t + best_s


def bcost(m_entries, nb=1024):
    spec = pl.BlockSpec((1, 1, SUBN), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    o_ = jnp.asarray(np.random.default_rng(0).normal(size=(nb, 1, SUBN)).astype(np.float32))
    run = jax.jit(lambda o2: jnp.sum(pl.pallas_call(
        partial(_bcost_kernel, m_entries=m_entries),
        grid=(nb,),
        in_specs=[spec] * 7 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[spec],
        out_shape=[jax.ShapeDtypeStruct((nb, 1, SUBN), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((K_CHUNK, 8, WOOP_COLS), jnp.float32),
            pltpu.VMEM((8, WOOP_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((K_CHUNK,)),
        ],
    )(o2, o_, o_, o_, o_, o_, o_ * 0 + 1e-3, woop_table)[0]))
    float(run(o_))
    ts = []
    for k in range(3):
        o2 = o_ + k * 1e-6
        t0 = time.perf_counter(); float(run(o2)); ts.append(time.perf_counter() - t0)
    return min(ts)


t8 = bcost(8)
t64 = bcost(64)
per = (t64 - t8) / (64 - 8) / 1024 * 1e6
print(f"in-situ Phase-B: 8 entries {t8*1e3:.1f}ms, 64 entries {t64*1e3:.1f}ms "
      f"-> {per:.2f} us/entry/subpacket", flush=True)
