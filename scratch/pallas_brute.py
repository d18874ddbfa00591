"""Experiment: Pallas brute-force ray-triangle kernel + packed-gather interaction.

Goal: replace the 33ms XLA trace_closest and 27ms 11-gather surface_interaction
at 1M rays / 32 tris with VMEM-resident compute.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.accel import traverse

res = 1024
scene = lr.Scene.from_dict(testing.cornell_box(resolution=(res, res), spp=8, depth=5))
compiled = lr.compile_scene(scene)
arrays = compiled.arrays
geom = compiled.trace_geometry(arrays)
P = geom.tri_v0.shape[0]
print("padded tris:", P, "num:", geom.num_tris)

h = w = res
n = res * res
# camera-ish rays: diverging fan from one point (coherent)
key = jax.random.PRNGKey(0)
d = jax.random.normal(key, (n, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
o = jnp.broadcast_to(jnp.asarray([278.0, 273.0, -800.0]), (n, 3))

from luisarender_tpu.core.types import Ray
rays = Ray(origin=o, direction=d, t_min=jnp.zeros(n), t_max=jnp.full(n, 1e30))


def timed(name, fn, *args, iters=10):
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:8.2f} ms  ({n/dt/1e6:8.1f} M/s)")
    return r


# ---------- baseline: XLA brute force
@jax.jit
def xla_closest(rays):
    return traverse.trace_closest_brute(geom, rays)

base_hit = timed("XLA trace_closest_brute", xla_closest, rays)


# ---------- Pallas brute-force closest
# triangle table: rows [v0(3), e1(3), e2(3), pid(1)] padded to 16 cols
tri_tab = np.zeros((P, 16), np.float32)
tri_tab[:, 0:3] = np.asarray(geom.tri_v0)
tri_tab[:, 3:6] = np.asarray(geom.tri_e1)
tri_tab[:, 6:9] = np.asarray(geom.tri_e2)
tri_tab[:, 9] = np.asarray(geom.prim_index, np.float32)
tri_tab = jnp.asarray(tri_tab)

BLK = 2048  # rays per grid step: (16, 128)
SUB = BLK // 128


def _brute_kernel(ox, oy, oz, dx, dy, dz, tmin, tmax, tri,
                  t_o, prim_o, u_o, v_o, *, n_tris):
    Ox, Oy, Oz = ox[0], oy[0], oz[0]
    Dx, Dy, Dz = dx[0], dy[0], dz[0]
    tmn = tmin[0]
    best_t = tmax[0]
    best_p = jnp.full(Ox.shape, -1.0, jnp.float32)
    best_u = jnp.zeros_like(Ox)
    best_v = jnp.zeros_like(Ox)
    for j in range(n_tris):
        v0x, v0y, v0z = tri[j, 0], tri[j, 1], tri[j, 2]
        e1x, e1y, e1z = tri[j, 3], tri[j, 4], tri[j, 5]
        e2x, e2y, e2z = tri[j, 6], tri[j, 7], tri[j, 8]
        pid = tri[j, 9]
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
        ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t > tmn) & (t < best_t))
        best_t = jnp.where(ok, t, best_t)
        best_p = jnp.where(ok, pid, best_p)
        best_u = jnp.where(ok, u, best_u)
        best_v = jnp.where(ok, v, best_v)
    t_o[0] = best_t
    prim_o[0] = best_p.astype(jnp.int32)
    u_o[0] = best_u
    v_o[0] = best_v


def pallas_closest(rays, tri_tab, n_tris):
    o, d = rays.origin, rays.direction
    nn = o.shape[0]
    pad = (-nn) % BLK
    nb = (nn + pad) // BLK

    def prep(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(nb, SUB, 128)

    comps = [prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
             prep(d[:, 0]), prep(d[:, 1], 1.0), prep(d[:, 2]),
             prep(rays.t_min), prep(rays.t_max, -1.0)]
    t, prim, u, v = pl.pallas_call(
        partial(_brute_kernel, n_tris=n_tris),
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, SUB, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 8
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, SUB, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((nb, SUB, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb, SUB, 128), jnp.int32),
            jax.ShapeDtypeStruct((nb, SUB, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb, SUB, 128), jnp.float32),
        ],
    )(*comps, tri_tab)
    return (t.reshape(-1)[:nn], prim.reshape(-1)[:nn],
            u.reshape(-1)[:nn], v.reshape(-1)[:nn])


@jax.jit
def pl_closest(rays):
    return pallas_closest(rays, tri_tab, P)

t, prim, u, v = timed("Pallas brute closest", pl_closest, rays)

# correctness vs XLA
bt = jnp.where(base_hit.prim >= 0, base_hit.t, jnp.inf)
pt = jnp.where(prim >= 0, t, jnp.inf)
match_prim = jnp.mean((base_hit.prim == prim).astype(jnp.float32))
finite = jnp.isfinite(bt) & jnp.isfinite(pt)
terr = jnp.max(jnp.where(finite, jnp.abs(bt - pt), 0.0))
print("prim match:", float(match_prim), " max |t| err:", float(terr))


# ---------- gather experiments
V = arrays["vertex_p"].shape[0]
print("verts:", V)
pidx = jnp.maximum(base_hit.prim, 0)

@jax.jit
def gather_11(pidx):
    tri = arrays["triangles"][pidx]
    acc = 0.0
    for k in ("vertex_p", "vertex_n", "vertex_uv"):
        for j in range(3):
            acc += arrays[k][tri[..., j]].sum()
    return acc + arrays["tri_inst"][pidx].sum()

timed("11-gather interaction fetch", gather_11, pidx)

packed = jnp.concatenate([
    arrays["vertex_n"][arrays["triangles"][:, 0]],
    arrays["vertex_n"][arrays["triangles"][:, 1]],
    arrays["vertex_n"][arrays["triangles"][:, 2]],
    arrays["vertex_uv"][arrays["triangles"][:, 0]],
    arrays["vertex_uv"][arrays["triangles"][:, 1]],
    arrays["vertex_uv"][arrays["triangles"][:, 2]],
    arrays["tri_inst"][:, None].astype(jnp.float32),
], axis=-1)
packed = jnp.pad(packed, ((0, 0), (0, 32 - packed.shape[1])))
print("packed table:", packed.shape)

@jax.jit
def gather_packed(pidx):
    return packed[pidx].sum()

timed("1-gather packed (T,32)", gather_packed, pidx)

@jax.jit
def onehot_packed(pidx):
    oh = jax.nn.one_hot(pidx, packed.shape[0], dtype=jnp.float32)
    return (oh @ packed).sum()

timed("one-hot matmul packed", onehot_packed, pidx)
