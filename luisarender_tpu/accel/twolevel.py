"""Two-level acceleration structure: TLAS over instances, shared BLAS per mesh.

TPU-native equivalent of the reference's Accel/Mesh split
(/root/reference/src/base/geometry.cpp:16,62-67 — LuisaCompute TLAS over
per-mesh BLASes with instance transforms). The default path flattens
instances to world space into ONE BVH (accel/traverse.py) because a
single-level walk keeps TPU lanes coherent; this module is for scenes where
instancing would blow up the flattened memory (the compiler switches
automatically when duplication exceeds a threshold — scene/compiler.py).

Design: one `lax.while_loop` whose per-lane state is either *in the TLAS*
(blas_node < 0) or *inside an instance's BLAS*. TLAS leaves hold exactly one
instance; entering one fetches the instance row (world-to-object transform +
mesh table offsets, packed for a single fetch_rows), moves the ray into
object space WITHOUT renormalizing the direction — so the ray parameter t is
identical in both spaces and hit ordering is global — and walks the mesh's
skip-link BLAS. Leaving the BLAS resumes the saved TLAS skip node.

Instance row layout (INST_COLS wide):
  0:12  world-to-object, row-major 3x4
  12:24 object-to-world, row-major 3x4 (interaction reconstruction)
  24    BLAS node offset     25 BLAS prim offset
  26    opaque (blocks shadow rays)   27 visible
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.fetch import fetch_rows
from ..core.types import Hit

INST_COLS = 32


class TraceGeometry2L(NamedTuple):
    """Device-resident two-level structure (see compiler.py construction)."""

    # TLAS (preorder skip-link; leaves reference one instance)
    tlas_aabb_min: jnp.ndarray  # (Nt, 3)
    tlas_aabb_max: jnp.ndarray  # (Nt, 3)
    tlas_skip: jnp.ndarray  # (Nt,)
    tlas_inst: jnp.ndarray  # (Nt,) instance id at leaves (-1 = padded leaf)
    tlas_leaf: jnp.ndarray  # (Nt,) bool — interior nodes DESCEND, leaves
    # (incl. padding) never do: an inverted padding box can still pass the
    # slab test when a zero direction component makes +-inf bounds
    # concatenated BLAS over all unique meshes (local skip links, -1 = done)
    blas_aabb_min: jnp.ndarray  # (Nb, 3)
    blas_aabb_max: jnp.ndarray  # (Nb, 3)
    blas_skip: jnp.ndarray  # (Nb,)
    blas_first: jnp.ndarray  # (Nb,) leaf first prim slot (mesh-local), -1
    blas_count: jnp.ndarray  # (Nb,)
    # object-space sorted triangles (concatenated over meshes)
    tri_v0: jnp.ndarray  # (P, 3)
    tri_e1: jnp.ndarray  # (P, 3)
    tri_e2: jnp.ndarray  # (P, 3)
    tri_valid: jnp.ndarray  # (P,) bool (padding = False)
    # packed per-instance rows (see module docstring)
    inst_rows: jnp.ndarray  # (I, INST_COLS) float32
    leaf_size: int
    num_tris: int  # total instanced (logical) triangles
    # composed cluster path (round 5): per-unique-mesh cluster tables
    # shared by every instance, plus STATIC per-instance routing info
    cluster_sets: tuple = ()  # ((node_table, tri_table), ...) per mesh
    inst_mesh: tuple = ()  # instance -> mesh id (python ints, static)
    inst_opaque: tuple = ()  # static: instance blocks shadow rays
    inst_visible: tuple = ()  # static: instance visible to closest rays


def _xform_point(row, base, p):
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    return jnp.stack(
        [
            row[..., base + 0] * x + row[..., base + 1] * y
            + row[..., base + 2] * z + row[..., base + 3],
            row[..., base + 4] * x + row[..., base + 5] * y
            + row[..., base + 6] * z + row[..., base + 7],
            row[..., base + 8] * x + row[..., base + 9] * y
            + row[..., base + 10] * z + row[..., base + 11],
        ],
        axis=-1,
    )


def _xform_vector(row, base, v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [
            row[..., base + 0] * x + row[..., base + 1] * y + row[..., base + 2] * z,
            row[..., base + 4] * x + row[..., base + 5] * y + row[..., base + 6] * z,
            row[..., base + 8] * x + row[..., base + 9] * y + row[..., base + 10] * z,
        ],
        axis=-1,
    )


def _xform_normal(row, base, n):
    """Transform a normal by the transpose of the 3x3 at `base` (pass the
    INVERSE transform's base to get the inverse-transpose)."""
    x, y, z = n[..., 0], n[..., 1], n[..., 2]
    return jnp.stack(
        [
            row[..., base + 0] * x + row[..., base + 4] * y + row[..., base + 8] * z,
            row[..., base + 1] * x + row[..., base + 5] * y + row[..., base + 9] * z,
            row[..., base + 2] * x + row[..., base + 6] * y + row[..., base + 10] * z,
        ],
        axis=-1,
    )


def _safe_inv(d):
    tiny = 1e-12
    return 1.0 / jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)


def _slab(o, inv_d, t_min, t_max, bmin, bmax):
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    near = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), t_min)
    far = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1), t_max)
    return near <= far


def _intersect(o, d, v0, e1, e2):
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    ok = (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1.0)
    return ok, t, u, v


def trace_closest_2l(
    geom: TraceGeometry2L, rays, shadow: bool = False
):
    """Closest hit through TLAS+BLAS. Returns Hit with prim = GLOBAL sorted
    BLAS slot (prim offset applied) and inst = instance id.

    shadow=True skips non-opaque instances (shadow-ray variant)."""
    o_w, d_w = rays.origin, rays.direction
    inv_w = _safe_inv(d_w)
    shape = o_w.shape[:-1]
    zero_i = jnp.zeros(shape, jnp.int32)
    zero_f = jnp.zeros(shape, jnp.float32)
    leaf_size = geom.leaf_size

    init = {
        "tlas": zero_i,  # current TLAS node (-1 = done)
        "blas": zero_i - 1,  # current BLAS node (global idx; -1 = in TLAS)
        "inst": zero_i - 1,
        "prim_off": zero_i,
        "node_off": zero_i,
        "o": o_w,  # object-space ray while in a BLAS
        "d": d_w,
        "inv": inv_w,
        "t": jnp.minimum(rays.t_max, jnp.float32(3e38)) + zero_f,
        "best_inst": zero_i - 1,
        "best_prim": zero_i - 1,
        "best_u": zero_f,
        "best_v": zero_f,
    }

    def cond(s):
        return jnp.any((s["tlas"] >= 0) | (s["blas"] >= 0))

    def body(s):
        in_blas = s["blas"] >= 0
        # ---- TLAS step (lanes not inside a BLAS) ----
        tnode = jnp.maximum(s["tlas"], 0)
        t_active = (~in_blas) & (s["tlas"] >= 0)
        t_hit = t_active & _slab(
            o_w, inv_w, rays.t_min, s["t"],
            geom.tlas_aabb_min[tnode], geom.tlas_aabb_max[tnode],
        )
        inst_at = geom.tlas_inst[tnode]
        is_leaf = geom.tlas_leaf[tnode]
        enter = t_hit & is_leaf & (inst_at >= 0)
        irow = fetch_rows(geom.inst_rows, jnp.maximum(inst_at, 0))
        if shadow:
            enter = enter & (irow[..., 26] > 0.0)
        enter = enter & (irow[..., 27] > 0.0)
        # advance the TLAS cursor now; the BLAS walk resumes from here
        next_tlas = jnp.where(
            t_hit & ~is_leaf,
            tnode + 1,
            jnp.where(t_active, geom.tlas_skip[tnode], s["tlas"]),
        )
        # entering lanes: object-space ray (direction NOT renormalized so t
        # is shared between spaces)
        o_obj = _xform_point(irow, 0, o_w)
        d_obj = _xform_vector(irow, 0, d_w)
        o_new = jnp.where(enter[..., None], o_obj, s["o"])
        d_new = jnp.where(enter[..., None], d_obj, s["d"])
        inv_new = jnp.where(enter[..., None], _safe_inv(d_obj), s["inv"])
        blas = jnp.where(enter, irow[..., 24].astype(jnp.int32), s["blas"])
        inst = jnp.where(enter, inst_at, s["inst"])
        prim_off = jnp.where(enter, irow[..., 25].astype(jnp.int32), s["prim_off"])
        node_off = jnp.where(enter, irow[..., 24].astype(jnp.int32), s["node_off"])
        tlas = jnp.where(t_active, next_tlas, s["tlas"])

        # ---- BLAS step (lanes inside a BLAS, including just-entered) ----
        b_active = blas >= 0
        bnode = jnp.maximum(blas, 0)
        b_hit = b_active & _slab(
            o_new, inv_new, rays.t_min, s["t"],
            geom.blas_aabb_min[bnode], geom.blas_aabb_max[bnode],
        )
        cnt = geom.blas_count[bnode]
        b_leaf = cnt > 0
        do_leaf = b_hit & b_leaf
        base = jnp.maximum(geom.blas_first[bnode], 0) + prim_off
        best_t = s["t"]
        best_inst = s["best_inst"]
        best_prim = s["best_prim"]
        best_u = s["best_u"]
        best_v = s["best_v"]
        for j in range(leaf_size):
            pidx = jnp.minimum(base + j, geom.tri_v0.shape[0] - 1)
            ok, t, u, v = _intersect(
                o_new, d_new,
                geom.tri_v0[pidx], geom.tri_e1[pidx], geom.tri_e2[pidx],
            )
            ok &= (
                do_leaf & (j < cnt) & geom.tri_valid[pidx]
                & (t > rays.t_min) & (t < best_t)
            )
            best_t = jnp.where(ok, t, best_t)
            best_prim = jnp.where(ok, pidx, best_prim)
            best_inst = jnp.where(ok, inst, best_inst)
            best_u = jnp.where(ok, u, best_u)
            best_v = jnp.where(ok, v, best_v)
        descend = b_hit & ~b_leaf
        blas_local = bnode - node_off
        next_local = jnp.where(
            descend,
            blas_local + 1,
            geom.blas_skip[bnode],  # -1 -> leave this BLAS
        )
        blas_next = jnp.where(
            b_active,
            jnp.where(next_local < 0, -1, next_local + node_off),
            blas,
        )
        return {
            "tlas": tlas,
            "blas": blas_next,
            "inst": inst,
            "prim_off": prim_off,
            "node_off": node_off,
            "o": o_new,
            "d": d_new,
            "inv": inv_new,
            "t": best_t,
            "best_inst": best_inst,
            "best_prim": best_prim,
            "best_u": best_u,
            "best_v": best_v,
        }

    out = jax.lax.while_loop(cond, body, init)
    found = out["best_prim"] >= 0
    return Hit(
        inst=jnp.where(found, out["best_inst"], -1),
        prim=out["best_prim"],
        bary=jnp.stack([out["best_u"], out["best_v"]], axis=-1),
        t=jnp.where(found, out["t"], jnp.inf),
    )


def trace_any_2l(geom: TraceGeometry2L, rays):
    hit = trace_closest_2l(geom, rays, shadow=True)
    return ~hit.miss


# ---------------------------------------------------------------------------
# Composed cluster path (round 5): per-instance launches of the
# cluster-streaming Pallas tracer over SHARED per-mesh tables
# ---------------------------------------------------------------------------


def _inst_ray(geom, i, rays):
    """Rays in instance i's object space (direction NOT renormalized, so t
    is shared between spaces and hit ordering is global)."""
    row = geom.inst_rows[i][None, :]
    o = _xform_point(row, 0, rays.origin)
    d = _xform_vector(row, 0, rays.direction)
    return o, d


def trace_closest_2l_cluster(geom: TraceGeometry2L, rays, interpret=False):
    """Closest hit for two-level scenes via the cluster kernel.

    The reference's TLAS/BLAS split is its FAST path for instanced scenes
    (base/geometry.cpp:16,62-67: hardware instancing). The TPU composition:
    one cluster-kernel launch per INSTANCE against its mesh's shared
    tables, rays moved to object space per launch, with the running best_t
    fed to each successive launch as t_max — later instances prune against
    earlier hits, and fully-pruned lanes ride the kernel's dead-to-tail
    sort into all-dead packets that exit at the root test. Instance
    visibility/opacity are STATIC python skips. Returned prim = GLOBAL
    shade-row slot (the per-mesh tables carry prim-offset canonical ids),
    exactly like trace_closest_2l."""
    from ..ops import cluster_pallas as cp

    n = rays.origin.shape[0]
    best_t = jnp.minimum(rays.t_max, 3.0e38)
    best_prim = jnp.full((n,), -1, jnp.int32)
    best_inst = jnp.full((n,), -1, jnp.int32)
    best_u = jnp.zeros((n,), jnp.float32)
    best_v = jnp.zeros((n,), jnp.float32)
    for i, mesh_i in enumerate(geom.inst_mesh):
        if not geom.inst_visible[i]:
            continue
        o, d = _inst_ray(geom, i, rays)
        nodes, tris = geom.cluster_sets[mesh_i]
        t, slot, u, v = cp._trace(
            o, d, rays.t_min, best_t, nodes, tris, False, interpret
        )
        ok = (slot >= 0) & (t < best_t)
        best_t = jnp.where(ok, t, best_t)
        best_prim = jnp.where(ok, slot, best_prim)
        best_inst = jnp.where(ok, jnp.int32(i), best_inst)
        best_u = jnp.where(ok, u, best_u)
        best_v = jnp.where(ok, v, best_v)
    found = best_prim >= 0
    return Hit(
        inst=jnp.where(found, best_inst, -1),
        prim=best_prim,
        bary=jnp.stack([best_u, best_v], axis=-1),
        t=jnp.where(found, best_t, jnp.inf),
    )


def trace_any_2l_cluster(geom: TraceGeometry2L, rays, interpret=False):
    """Occlusion for two-level scenes via per-instance any-hit launches.
    Already-occluded lanes get t_max = 0 for later instances (dead-lane
    fast path); non-blocking instances are static skips."""
    from ..ops import cluster_pallas as cp

    n = rays.origin.shape[0]
    occ = jnp.zeros((n,), bool)
    for i, mesh_i in enumerate(geom.inst_mesh):
        if not (geom.inst_visible[i] and geom.inst_opaque[i]):
            continue
        o, d = _inst_ray(geom, i, rays)
        nodes, tris = geom.cluster_sets[mesh_i]
        t_max = jnp.where(occ, 0.0, rays.t_max)
        _, slot, _, _ = cp._trace(
            o, d, rays.t_min, t_max, nodes, tris, True, interpret
        )
        occ = occ | (slot >= 0)
    return occ
