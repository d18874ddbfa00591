"""Pallas brute-force ray/triangle intersection for small scenes.

TPU replacement for hardware ray tracing on Cornell-class scenes (the
reference drives OptiX/DXR, /root/reference/src/base/geometry.cpp:218-279).
The XLA brute-force tracer (accel/traverse.py) materializes (n_rays, n_tris)
intermediates in HBM; this kernel keeps the whole triangle table and all
Möller-Trumbore temporaries in VMEM/registers — measured 9.6x faster
(3.4 ms vs 32.9 ms for 1M rays x 32 tris on v5e).

Design:
- rays are blocked (SUB, 128) per grid step; every block loops over ALL
  triangles with a static Python unroll (the table is tiny by construction);
- the triangle table is one (P, 16) f32 array resident in VMEM:
  cols 0-8 = v0/e1/e2, col 9 = valid (padding = 0), col 10 = opaque
  (blocks shadow rays);
- closest-hit returns (t, slot, u, v) where `slot` is the SORTED primitive
  slot (same indexing as the packed shade table, scene/geometry.py);
- the wrappers carry a custom zero-gradient VJP: scene geometry is constant
  and sampled directions are detached in the differentiable integrator
  (diff/render.py), so every cotangent reaching the trace outputs is zero
  anyway. Geometry-parameter derivatives (d/d vertex positions) require the
  XLA path (set ENABLED=False).

Static unroll bounds compile time: MAX_TRIS caps the (padded) table size;
bigger scenes take the XLA/BVH path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ENABLED = True
MAX_TRIS = 512  # padded-table cap for the static unroll
BLK = 2048  # rays per grid step
SUB = BLK // 128
TRI_COLS = 16


def make_tri_table(geom) -> jnp.ndarray:
    """(P, 16) VMEM-resident triangle table from a TraceGeometry."""
    p = geom.tri_v0.shape[0]
    valid = (geom.prim_index >= 0).astype(jnp.float32)[:, None]
    opaque = geom.tri_opaque.astype(jnp.float32)[:, None]
    pad = jnp.zeros((p, TRI_COLS - 11), jnp.float32)
    return jnp.concatenate(
        [geom.tri_v0, geom.tri_e1, geom.tri_e2, valid, opaque, pad], axis=-1
    )


def _moller_trumbore(tri, j, Ox, Oy, Oz, Dx, Dy, Dz):
    """One triangle (static row j) against a ray block. Returns
    (geom_ok, t, u, v) — geom_ok excludes the t-range test."""
    v0x, v0y, v0z = tri[j, 0], tri[j, 1], tri[j, 2]
    e1x, e1y, e1z = tri[j, 3], tri[j, 4], tri[j, 5]
    e2x, e2y, e2z = tri[j, 6], tri[j, 7], tri[j, 8]
    px = Dy * e2z - Dz * e2y
    py = Dz * e2x - Dx * e2z
    pz = Dx * e2y - Dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = Ox - v0x
    ty = Oy - v0y
    tz = Oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (Dx * qx + Dy * qy + Dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (tri[j, 9] > 0.0)
    return ok, t, u, v


def _closest_kernel(ox, oy, oz, dx, dy, dz, tmin, tmax, tri,
                    t_o, slot_o, u_o, v_o, *, n_rows):
    Ox, Oy, Oz = ox[0], oy[0], oz[0]
    Dx, Dy, Dz = dx[0], dy[0], dz[0]
    tmn = tmin[0]
    best_t = tmax[0]
    best_s = jnp.full(Ox.shape, -1, jnp.int32)
    best_u = jnp.zeros_like(Ox)
    best_v = jnp.zeros_like(Ox)
    for j in range(n_rows):
        ok, t, u, v = _moller_trumbore(tri, j, Ox, Oy, Oz, Dx, Dy, Dz)
        ok &= (t > tmn) & (t < best_t)
        best_t = jnp.where(ok, t, best_t)
        best_s = jnp.where(ok, j, best_s)
        best_u = jnp.where(ok, u, best_u)
        best_v = jnp.where(ok, v, best_v)
    t_o[0] = best_t
    slot_o[0] = best_s
    u_o[0] = best_u
    v_o[0] = best_v


def _any_kernel(ox, oy, oz, dx, dy, dz, tmin, tmax, tri, occ_o, *, n_rows):
    Ox, Oy, Oz = ox[0], oy[0], oz[0]
    Dx, Dy, Dz = dx[0], dy[0], dz[0]
    tmn = tmin[0]
    tmx = tmax[0]
    occ = jnp.zeros(Ox.shape, jnp.bool_)
    for j in range(n_rows):
        ok, t, _, _ = _moller_trumbore(tri, j, Ox, Oy, Oz, Dx, Dy, Dz)
        occ |= ok & (t > tmn) & (t < tmx) & (tri[j, 10] > 0.0)
    occ_o[0] = occ.astype(jnp.int32)


def _ray_blocks(rays):
    o, d = rays.origin, rays.direction
    n = o.shape[0]
    pad = (-n) % BLK
    nb = (n + pad) // BLK

    def prep(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(nb, SUB, 128)

    comps = [
        prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
        prep(d[:, 0]), prep(d[:, 1], 1.0), prep(d[:, 2]),
        prep(rays.t_min), prep(rays.t_max, -1.0),
    ]
    return comps, n, nb


_ray_spec = pl.BlockSpec((1, SUB, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _closest(o, d, t_min, t_max, tri_table, interpret=False):
    from ..core.types import Ray  # local import to avoid a cycle

    comps, n, nb = _ray_blocks(Ray(o, d, t_min, t_max))
    t, slot, u, v = pl.pallas_call(
        partial(_closest_kernel, n_rows=tri_table.shape[0]),
        grid=(nb,),
        in_specs=[_ray_spec] * 8 + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[_ray_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((nb, SUB, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb, SUB, 128), jnp.int32),
            jax.ShapeDtypeStruct((nb, SUB, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb, SUB, 128), jnp.float32),
        ],
        interpret=interpret,
    )(*comps, tri_table)
    return (t.reshape(-1)[:n], slot.reshape(-1)[:n],
            u.reshape(-1)[:n], v.reshape(-1)[:n])


def _closest_fwd(o, d, t_min, t_max, tri_table, interpret=False):
    return _closest(o, d, t_min, t_max, tri_table, interpret), (
        o, d, t_min, t_max, tri_table)


def _closest_bwd(interpret, res, g):
    return tuple(jnp.zeros_like(x) for x in res)


_closest.defvjp(_closest_fwd, _closest_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _any(o, d, t_min, t_max, tri_table, interpret=False):
    from ..core.types import Ray

    comps, n, nb = _ray_blocks(Ray(o, d, t_min, t_max))
    occ = pl.pallas_call(
        partial(_any_kernel, n_rows=tri_table.shape[0]),
        grid=(nb,),
        in_specs=[_ray_spec] * 8 + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=_ray_spec,
        out_shape=jax.ShapeDtypeStruct((nb, SUB, 128), jnp.int32),
        interpret=interpret,
    )(*comps, tri_table)
    return occ.reshape(-1)[:n]


def _any_fwd(o, d, t_min, t_max, tri_table, interpret=False):
    return _any(o, d, t_min, t_max, tri_table, interpret), (
        o, d, t_min, t_max, tri_table)


def _any_bwd(interpret, res, g):
    return tuple(jnp.zeros_like(x) for x in res)


_any.defvjp(_any_fwd, _any_bwd)


def trace_closest_pallas(geom, rays, interpret: bool = False):
    """Closest hit; returns a Hit with prim = sorted slot (-1 miss)."""
    from ..core.types import Hit

    tri_table = make_tri_table(geom)
    t, slot, u, v = _closest(
        rays.origin, rays.direction, rays.t_min,
        jnp.minimum(rays.t_max, jnp.float32(3e38)), tri_table, interpret)
    found = slot >= 0
    return Hit(
        inst=jnp.where(found, jnp.int32(0), jnp.int32(-1)),
        prim=slot,
        bary=jnp.stack([u, v], axis=-1),
        t=jnp.where(found, t, jnp.inf),
    )


def trace_any_pallas(geom, rays, interpret: bool = False):
    """Occlusion test (opaque triangles only); returns bool per ray."""
    tri_table = make_tri_table(geom)
    occ = _any(rays.origin, rays.direction, rays.t_min, rays.t_max,
               tri_table, interpret)
    return occ > 0
