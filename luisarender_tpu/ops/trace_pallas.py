"""Pallas packet BVH traversal kernel.

The TPU-native replacement for hardware ray-tracing cores (the reference
drives OptiX/DXR through LuisaCompute, base/geometry.cpp:218-279; BASELINE's
north star asks for "a Pallas BVH traversal + ray-triangle intersection
kernel"). Mosaic has no per-lane gather and no unaligned dynamic VMEM loads,
so the kernel uses the two idiomatic TPU mechanisms instead:

- *packet traversal*: each grid step owns a BLOCK = 8x128 ray block in
  vector registers; ONE SMEM traversal stack is shared by the block, and a
  node is entered when ANY ray hits its AABB (speculative packet traversal —
  great for coherent camera/shadow rays, conservative for incoherent
  bounces);
- *one-hot MXU fetch*: per-node and per-triangle records are rows of dense
  f32 tables in VMEM; a dynamic row fetch is a (1, N) one-hot x (N, 8)
  matmul on the MXU (~N x 8 MACs, a handful of cycles) — the Mosaic-legal
  "gather". Integer fields (skip/first/count/prim id) are stored as exact
  f32 VALUES (all < 2^24).

Interior nodes push (left = node+1, right = skip[node+1]) — the preorder
skip-link layout from accel/bvh.py gives the right child for free.

VMEM budget bounds the BVH to roughly 100k triangles; larger scenes use the
XLA while_loop traversal (accel/traverse.py).

STATUS: semantics are validated against brute force in interpret mode
(tests/test_pallas_trace.py) and the kernel Mosaic-compiles for v5e; on the
current axon-tunneled worker the compiled kernel stalls at runtime (the
worker also sporadically faults on large XLA programs — see
.claude/skills/verify/SKILL.md), so production tracing stays on the XLA
traversal until the kernel is profiled on direct-attached hardware.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import Hit

BLOCK = 1024  # rays per grid step (8 sublanes x 128 lanes)
STACK_DEPTH = 96
_BIG = 3.0e38

# node table columns: min.xyz, max.xyz, skip, count, first, pad...
NODE_COLS = 16
# tri table columns: v0.xyz, e1.xyz, e2.xyz, pid, pad...
TRI_COLS = 16


def pack_tables(geom):
    """Host-side packing of TraceGeometry into MXU-fetchable f32 tables."""
    n = geom.aabb_min.shape[0]
    node = np.zeros((n, NODE_COLS), np.float32)
    node[:, 0:3] = np.asarray(geom.aabb_min)
    node[:, 3:6] = np.asarray(geom.aabb_max)
    node[:, 6] = np.asarray(geom.skip, np.float32)
    node[:, 7] = np.asarray(geom.node_count, np.float32)
    node[:, 8] = np.asarray(geom.node_first, np.float32)

    p = geom.tri_v0.shape[0]
    tri = np.zeros((p, TRI_COLS), np.float32)
    tri[:, 0:3] = np.asarray(geom.tri_v0)
    tri[:, 3:6] = np.asarray(geom.tri_e1)
    tri[:, 6:9] = np.asarray(geom.tri_e2)
    tri[:, 9] = np.asarray(geom.prim_index, np.float32)
    return jnp.asarray(node), jnp.asarray(tri)


def _row_fetch(table_ref, index):
    """Dynamic row fetch via one-hot matmul: (1, cols) from (N, cols)."""
    n = table_ref.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    onehot = (ids == index).astype(jnp.float32)
    return jnp.dot(onehot, table_ref[:], preferred_element_type=jnp.float32)


def _traverse_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
    node_ref, tri_ref,
    t_ref, prim_ref, u_ref, v_ref,
    stack_ref,
    *, leaf_size: int,
):
    shape = ox_ref.shape[1:]  # (8, 128)
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    t_min = tmin_ref[0]

    def safe_inv(v):
        tiny = 1e-12
        return 1.0 / jnp.where(jnp.abs(v) < tiny, jnp.where(v < 0, -tiny, tiny), v)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    stack_ref[0] = 0  # root

    def cond(state):
        sp, *_ = state
        return sp > 0

    def body(state):
        sp, best_t, best_prim, best_u, best_v = state
        node = stack_ref[sp - 1]
        sp = sp - 1

        row = _row_fetch(node_ref, node)  # (1, NODE_COLS)
        t0x = (row[0, 0] - ox) * ix
        t1x = (row[0, 3] - ox) * ix
        t0y = (row[0, 1] - oy) * iy
        t1y = (row[0, 4] - oy) * iy
        t0z = (row[0, 2] - oz) * iz
        t1z = (row[0, 5] - oz) * iz
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), t_min),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), best_t),
        )
        any_hit = jnp.any(near <= far)
        skip_f = row[0, 6]
        cnt = row[0, 7].astype(jnp.int32)
        first = row[0, 8].astype(jnp.int32)

        def visit_leaf(args):
            sp, best_t, best_prim, best_u, best_v = args

            def tri_body(j, carry):
                best_t, best_prim, best_u, best_v = carry
                trow = _row_fetch(tri_ref, first + j)  # (1, TRI_COLS)
                pid = trow[0, 9].astype(jnp.int32)
                # Moller-Trumbore, componentwise with broadcast scalars
                p_x = dy * trow[0, 8] - dz * trow[0, 7]
                p_y = dz * trow[0, 6] - dx * trow[0, 8]
                p_z = dx * trow[0, 7] - dy * trow[0, 6]
                det = trow[0, 3] * p_x + trow[0, 4] * p_y + trow[0, 5] * p_z
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tx = ox - trow[0, 0]
                ty = oy - trow[0, 1]
                tz = oz - trow[0, 2]
                u = (tx * p_x + ty * p_y + tz * p_z) * inv_det
                q_x = ty * trow[0, 5] - tz * trow[0, 4]
                q_y = tz * trow[0, 3] - tx * trow[0, 5]
                q_z = tx * trow[0, 4] - ty * trow[0, 3]
                v = (dx * q_x + dy * q_y + dz * q_z) * inv_det
                t = trow[0, 6] * q_x + trow[0, 7] * q_y + trow[0, 8] * q_z
                t = t * inv_det
                ok = (
                    (jnp.abs(det) > 1e-12)
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t > t_min)
                    & (t < best_t)
                    & (j < cnt)
                    & (pid >= 0)
                )
                return (
                    jnp.where(ok, t, best_t),
                    jnp.where(ok, first + j, best_prim),
                    jnp.where(ok, u, best_u),
                    jnp.where(ok, v, best_v),
                )

            best_t, best_prim, best_u, best_v = jax.lax.fori_loop(
                0, leaf_size, tri_body, (best_t, best_prim, best_u, best_v)
            )
            return sp, best_t, best_prim, best_u, best_v

        def visit_interior(args):
            sp, best_t, best_prim, best_u, best_v = args
            left = node + 1
            lrow = _row_fetch(node_ref, left)
            right = lrow[0, 6].astype(jnp.int32)  # skip[left] == right child
            # push right first so the left (spatially first in preorder)
            # pops next; a right of -1 (root spine) is never produced for
            # interior nodes' left children
            stack_ref[sp] = right
            stack_ref[sp + 1] = left
            return sp + 2, best_t, best_prim, best_u, best_v

        def enter(args):
            return jax.lax.cond(cnt > 0, visit_leaf, visit_interior, args)

        sp, best_t, best_prim, best_u, best_v = jax.lax.cond(
            any_hit, enter, lambda a: a,
            (sp, best_t, best_prim, best_u, best_v),
        )
        return sp, best_t, best_prim, best_u, best_v

    init = (
        1,
        jnp.minimum(tmax_ref[0], _BIG),
        jnp.full(shape, -1, jnp.int32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
    )
    _, best_t, best_prim, best_u, best_v = jax.lax.while_loop(cond, body, init)
    t_ref[0] = jnp.where(best_prim >= 0, best_t, jnp.inf)
    prim_ref[0] = best_prim
    u_ref[0] = best_u
    v_ref[0] = best_v


def trace_closest_pallas(geom, rays, interpret: bool = False, tables=None) -> Hit:
    """Packet-traversal closest hit. geom: accel.traverse.TraceGeometry.

    tables: optional pre-packed (node_table, tri_table) from pack_tables()
    to avoid re-packing per call."""
    o, d = rays.origin, rays.direction
    n = o.shape[0]
    pad = (-n) % BLOCK
    nb = (n + pad) // BLOCK
    node_table, tri_table = tables if tables is not None else pack_tables(geom)

    def prep(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(nb, 8, 128)

    comps = [
        prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
        prep(d[:, 0]), prep(d[:, 1], 1.0), prep(d[:, 2]),
        prep(rays.t_min), prep(rays.t_max, -1.0),
    ]
    kernel = partial(_traverse_kernel, leaf_size=geom.leaf_size)
    t, prim, u, v = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ] * 8
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((2 * STACK_DEPTH,), jnp.int32)],
        interpret=interpret,
    )(*comps, node_table, tri_table)
    t = t.reshape(-1)[:n]
    prim = prim.reshape(-1)[:n]
    u = u.reshape(-1)[:n]
    v = v.reshape(-1)[:n]
    found = prim >= 0
    return Hit(
        inst=jnp.where(found, jnp.int32(0), jnp.int32(-1)),
        prim=prim,
        bary=jnp.stack([u, v], axis=-1),
        t=t,
    )
