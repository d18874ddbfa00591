"""Experiment: packet-size scaling of the cluster tracer.

Measures, for BLOCK in {1024, 512, 256, 128}: wall time, pops/packet,
clusters/packet — on (a) coherent camera rays, (b) Morton-sorted random
bounce rays — 512k-tri mesh-heavy scene. Informs the round-2 tracer design.
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.core import types as ct
from luisarender_tpu.ops import cluster_pallas as cp
from luisarender_tpu.scene.geometry import surface_interaction
from luisarender_tpu.accel import traverse

CLUSTER, NODE_COLS, TRI_COLS, K_CHUNK, STACK_DEPTH = (
    cp.CLUSTER, cp.NODE_COLS, cp.TRI_COLS, cp.K_CHUNK, cp.STACK_DEPTH)
_BIG = cp._BIG


def make_kernel(block, max_steps):
    sub = block // 128

    def kern(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
             node_ref, tri_hbm,
             t_o, slot_o, stats_o,
             buf_ref, work_ref, sem_ref, stack_ref, leaf_first_ref, leaf_node_ref):
        ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
        dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
        t_min = tmin_ref[0]

        def safe_inv(v):
            tiny = 1e-12
            return 1.0 / jnp.where(jnp.abs(v) < tiny, jnp.where(v < 0, -tiny, tiny), v)

        ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
        mdx, mdy, mdz = jnp.sum(dx), jnp.sum(dy), jnp.sum(dz)
        stack_ref[0] = 0

        def read_node(idx):
            base = idx * NODE_COLS
            return tuple(node_ref[base + c] for c in range(NODE_COLS))

        def start_dma(list_idx, slot):
            return pltpu.make_async_copy(
                tri_hbm.at[leaf_first_ref[list_idx]], buf_ref.at[slot], sem_ref.at[slot])

        def outer_cond(c):
            sp, steps, ncl, *_ = c
            return (sp > 0) & (steps < max_steps)

        def outer_body(c):
            sp, steps, ncl, best_t, best_s = c

            def a_cond(s):
                sp, nl, steps = s
                return (sp > 0) & (nl < K_CHUNK) & (steps < max_steps)

            def a_body(s):
                sp, nl, steps = s
                node = stack_ref[sp - 1]
                row = read_node(node)
                hit = jnp.any(cp._slab(row, ox, oy, oz, ix, iy, iz, t_min, best_t))
                right = row[6].astype(jnp.int32)
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
                    lrow = read_node(left)
                    rrow = read_node(right)
                    score_l = (lrow[0] + lrow[3]) * mdx + (lrow[1] + lrow[4]) * mdy + (lrow[2] + lrow[5]) * mdz
                    score_r = (rrow[0] + rrow[3]) * mdx + (rrow[1] + rrow[4]) * mdy + (rrow[2] + rrow[5]) * mdz
                    l_far = score_l > score_r
                    stack_ref[sp - 1] = jnp.where(l_far, left, right)
                    stack_ref[sp] = jnp.where(l_far, right, left)

                sp = jnp.where(push, sp + 1, sp - 1)
                nl = nl + take_leaf.astype(jnp.int32)
                return sp, nl, steps + 1

            sp, nl, steps = jax.lax.while_loop(a_cond, a_body, (sp, 0, steps))

            @pl.when(nl > 0)
            def _():
                start_dma(0, 0).start()

            def b_body(j, carry):
                best_t, best_s = carry
                slot = jax.lax.rem(j, 2)
                pltpu.make_async_copy(
                    tri_hbm.at[leaf_first_ref[j]], buf_ref.at[slot], sem_ref.at[slot]).wait()

                @pl.when(j + 1 < nl)
                def _():
                    start_dma(j + 1, jax.lax.rem(j + 1, 2)).start()

                row = read_node(leaf_node_ref[j])
                alive = jnp.any(cp._slab(row, ox, oy, oz, ix, iy, iz, t_min, best_t))

                @pl.when(slot == 0)
                def _():
                    work_ref[:] = buf_ref[0]

                @pl.when(slot != 0)
                def _():
                    work_ref[:] = buf_ref[1]

                def do_tests(carry):
                    best_t, best_s = carry
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
                        ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                              & (work_ref[9, jj] > 0.0) & (t > t_min) & (t < best_t))
                        sl = work_ref[11, jj].astype(jnp.int32)
                        best_t = jnp.where(ok, t, best_t)
                        best_s = jnp.where(ok, sl, best_s)
                    return best_t, best_s

                return jax.lax.cond(alive, do_tests, lambda c: c, carry)

            best_t, best_s = jax.lax.fori_loop(0, nl, b_body, (best_t, best_s))
            return sp, steps, ncl + nl, best_t, best_s

        shape = ox.shape
        init = (1, 0, 0,
                jnp.minimum(tmax_ref[0], _BIG),
                jnp.full(shape, -1, jnp.int32))
        _, steps, ncl, best_t, best_s = jax.lax.while_loop(outer_cond, outer_body, init)
        found = best_s >= 0
        t_o[0] = jnp.where(found, best_t, jnp.inf)
        slot_o[0] = best_s
        stats_o[0, 0, 0] = steps
        stats_o[0, 0, 1] = ncl

    return kern


def run_block(node_table, tri_table, o, d, t_min, t_max, block, sort=True):
    n = o.shape[0]
    sub = block // 128
    if sort:
        _lo = node_table[0, 0:3]
        _ext = node_table[0, 3:6] - _lo
        key = cp._coherence_keys(o, d, t_min, t_max, _lo, _ext)
        iota = jnp.arange(n, dtype=jnp.int32)
        (_, ox_, oy_, oz_, dx_, dy_, dz_, t_min, t_max, orig) = jax.lax.sort(
            (key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t_min, t_max, iota),
            num_keys=1)
        o = jnp.stack([ox_, oy_, oz_], axis=-1)
        d = jnp.stack([dx_, dy_, dz_], axis=-1)
    pad = (-n) % block
    nb = (n + pad) // block

    def prep(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(nb, sub, 128)

    comps = [prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
             prep(d[:, 0]), prep(d[:, 1], 1.0), prep(d[:, 2]),
             prep(t_min), prep(t_max, -1.0)]
    max_steps = 4 * node_table.shape[0] + 64
    kern = make_kernel(block, max_steps)
    ray_spec = pl.BlockSpec((1, sub, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    f = jax.jit(lambda *a: pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[ray_spec] * 8 + [pl.BlockSpec(memory_space=pltpu.SMEM),
                                   pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[ray_spec] * 2 + [pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((nb, sub, 128), jnp.float32),
                   jax.ShapeDtypeStruct((nb, sub, 128), jnp.int32),
                   jax.ShapeDtypeStruct((nb, 1, 2), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((2, TRI_COLS, CLUSTER), jnp.float32),
            pltpu.VMEM((TRI_COLS, CLUSTER), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((K_CHUNK,), jnp.int32),
            pltpu.SMEM((K_CHUNK,), jnp.int32),
        ])(*a))
    args = comps + [node_table.reshape(-1), tri_table]
    t, slot, stats = f(*args)
    float(jnp.sum(t))  # full host sync (block_until_ready is unreliable
    # through the axon tunnel: repeated identical dispatches measured ~0 ms)
    dts = []
    for i in range(3):
        a2 = list(args)
        a2[6] = args[6] + (i + 1) * 1e-6  # new value => no result reuse
        float(jnp.sum(a2[6]))
        t0 = time.perf_counter()
        t, slot, stats = f(*a2)
        float(jnp.sum(t))
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    stats = np.asarray(stats)
    return dict(block=block, ms=round(dt * 1e3, 1), mray=round(n / dt / 1e6, 2),
                pops_per_packet=round(float(stats[:, 0, 0].mean()), 1),
                clusters_per_packet=round(float(stats[:, 0, 1].mean()), 1),
                hit_frac=round(float((np.asarray(slot).reshape(-1) >= 0).mean()), 3))


def main():
    w, h = 1280, 720
    scene = lr.Scene.from_dict(testing.mesh_heavy(res=(w, h), spp=4, depth=5, accel="flat"))
    compiled = lr.compile_scene(scene)
    camera = scene.cameras[0]
    integ = scene.integrator
    sampler = integ.sampler
    geom = compiled.trace_geometry(compiled.arrays)
    node_table, tri_table = geom.cluster_nodes, geom.cluster_tris
    n = w * h

    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32), jnp.arange(w, dtype=jnp.int32), indexing="ij")
    pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
    state0 = sampler.start(pixel_xy, jnp.int32(0))
    state0, u_filter = sampler.generate_pixel_2d(state0)
    u_lens = jnp.full((n, 2), 0.5, jnp.float32)
    ray, _, _ = camera.generate_rays(pixel_xy, u_filter, u_lens, 0.0)

    hit = traverse.trace_closest(geom, ray)
    it = surface_interaction(compiled.arrays, hit, ray, needs_uv=False)
    key = jax.random.PRNGKey(0)
    dd = jax.random.normal(key, (n, 3))
    dd = dd / jnp.linalg.norm(dd, axis=-1, keepdims=True)
    # cosine-ish: flip into hemisphere of shading normal (realistic bounce)
    flip = jnp.sum(dd * it.ns, axis=-1) < 0
    dd = jnp.where(flip[:, None], -dd, dd)
    ray2 = ct.Ray(origin=it.p + it.ng * 1e-3, direction=dd,
                  t_min=jnp.full((n,), 1e-3), t_max=jnp.full((n,), 3e38))
    # ~40% dead lanes like a depth-2+ wave
    dead = jax.random.uniform(jax.random.PRNGKey(1), (n,)) < 0.4
    ray2d = ray2._replace(t_max=jnp.where(dead, 0.0, ray2.t_max))

    for block in (1024, 512, 256, 128):
        r = run_block(node_table, tri_table, ray.origin, ray.direction, ray.t_min, ray.t_max, block)
        print("camera   ", r)
        r = run_block(node_table, tri_table, ray2.origin, ray2.direction, ray2.t_min, ray2.t_max, block)
        print("bounce   ", r)
        r = run_block(node_table, tri_table, ray2d.origin, ray2d.direction, ray2d.t_min, ray2d.t_max, block)
        print("bounce40d", r)


if __name__ == "__main__":
    main()
