"""Subpacket MXU tracer vs cluster-streaming tracer on the 512k-tri scene:
camera / shuffled / bounce-like / shadow ray sets. Round-4 flagship probe."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import luisarender_tpu as lr

sys.path.insert(0, "/root/repo/scratch")
from bench_meshheavy import make_scene

n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 5
subdiv = int(sys.argv[sys.argv.index("--subdiv") + 1]) if "--subdiv" in sys.argv else 5

scene = lr.Scene.from_dict(make_scene(res=(1280, 720), spp=1, depth=3, n=n, subdiv=subdiv))
compiled = lr.compile_scene(scene)
geom = compiled.trace_geometry(compiled.arrays)
print("tris", compiled.plan.num_tris, "nodes", geom.cluster_nodes.shape,
      "woop", geom.cluster_woop.shape, flush=True)

from luisarender_tpu.core.types import Ray
from luisarender_tpu.ops import cluster_pallas as cp
from luisarender_tpu.ops import subpacket_pallas as sp

w, h = 1280, 720
ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
origin = np.array([500.0, 350.0, -700.0], np.float32)
front = np.array([0.0, -0.25, 1.0]); front /= np.linalg.norm(front)
up0 = np.array([0.0, 1.0, 0.0])
right = np.cross(front, up0); right /= np.linalg.norm(right)
up = np.cross(right, front)
tanf = np.tan(np.radians(50.0) / 2)
px = (xs.ravel() + 0.5) / w * 2 - 1
py = 1 - (ys.ravel() + 0.5) / h * 2
d = (front[None] + right[None] * (px[:, None] * tanf * w / h) + up[None] * (py[:, None] * tanf)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
N = d.shape[0]
o = np.tile(origin, (N, 1))

FNS = {
    "cluster": (
        lambda r: cp.trace_closest_cluster(geom.cluster_nodes, geom.cluster_tris, r),
        lambda r: cp.trace_any_cluster(geom.cluster_nodes, geom.cluster_tris, r),
    ),
    "subpacket": (
        lambda r: sp.trace_closest_subpacket(geom.cluster_slab8, geom.cluster_meta8, geom.cluster_woop, r),
        lambda r: sp.trace_any_subpacket(geom.cluster_slab8, geom.cluster_meta8, geom.cluster_woop, r),
    ),
}


def bench(which, name, o_, d_, tmin=None, tmax=3e38):
    rays = Ray(jnp.asarray(o_), jnp.asarray(d_),
               jnp.full(N, 1e-3) if tmin is None else jnp.asarray(tmin),
               jnp.full(N, tmax) if np.isscalar(tmax) else jnp.asarray(tmax))
    f = jax.jit(lambda r: FNS[which][0](r).t)
    t = f(rays); jax.block_until_ready(t)
    dt = 1e9
    for _ in range(2):
        t0 = time.perf_counter(); t = f(rays); jax.block_until_ready(t)
        dt = min(dt, time.perf_counter() - t0)
    hitfrac = float(jnp.mean(jnp.isfinite(t)))
    print(f"{which:9s} {name}: {dt*1000:7.1f} ms -> {N/dt/1e6:6.2f} Mray/s (hit {hitfrac:.2f})", flush=True)
    return np.asarray(t)


def bench_any(which, name, o_, d_, tmax):
    rays = Ray(jnp.asarray(o_), jnp.asarray(d_), jnp.full(N, 1e-3), jnp.asarray(tmax))
    f = jax.jit(lambda r: FNS[which][1](r))
    occ = f(rays); jax.block_until_ready(occ)
    dt = 1e9
    for _ in range(2):
        t0 = time.perf_counter(); occ = f(rays); jax.block_until_ready(occ)
        dt = min(dt, time.perf_counter() - t0)
    print(f"{which:9s} {name}: {dt*1000:7.1f} ms -> {N/dt/1e6:6.2f} Mray/s (occ {float(jnp.mean(occ)):.2f})", flush=True)


import os
WHICH = os.environ.get("BENCH_TRACERS", "cluster,subpacket").split(",")
t_cam = None
for which in WHICH:
    t = bench(which, "camera coherent ", o, d)
    if t_cam is None:
        t_cam = t

# bounce-like: random cosine directions from hit points (PERF.md wave)
m = np.isfinite(t_cam)
hp = o + d * np.minimum(t_cam, 3000.0)[:, None]
rng = np.random.default_rng(1)
bd = rng.normal(size=(N, 3)).astype(np.float32)
bd /= np.linalg.norm(bd, axis=1, keepdims=True)
bo = np.where(m[:, None], hp, o).astype(np.float32)
# dead-masked: miss lanes get t_max <= t_min (the integrator convention)
tmax_masked = np.where(m, 3e38, 0.0).astype(np.float32)
for which in WHICH:
    bench(which, "bounce incoherent", bo + bd * 1e-2, bd, tmax=tmax_masked)

# shadow corridor
lc = np.array([500.0, 600.0, 500.0], np.float32)
sd = lc[None] - bo; sl = np.linalg.norm(sd, axis=1, keepdims=True); sd /= sl
for which in WHICH:
    bench_any(which, "shadow any      ", bo + sd * 1e-2, sd.astype(np.float32),
              (sl[:, 0] - 2e-2).astype(np.float32))

# correctness cross-check on a slice of bounce rays
rays = Ray(jnp.asarray(bo[:200000] + bd[:200000] * 1e-2), jnp.asarray(bd[:200000]),
           jnp.full(200000, 1e-3), jnp.full(200000, 3e38))
# pad N-dependence: reuse full-N fns with sliced arrays via fresh jit
h1 = jax.jit(lambda r: FNS["cluster"][0](r))(rays)
h2 = jax.jit(lambda r: FNS["subpacket"][0](r))(rays)
t1, t2 = np.asarray(h1.t), np.asarray(h2.t)
flips = (np.isinf(t1) != np.isinf(t2)).mean()
hh = np.isfinite(t1) & np.isfinite(t2)
rel = np.abs(t1[hh] - t2[hh]) / np.maximum(t1[hh], 1e-6)
slot_agree = (np.asarray(h1.prim)[hh] == np.asarray(h2.prim)[hh]).mean()
print(f"cross-check: miss flips {flips:.5f}, max t rel err {rel.max():.2e}, slot agree {slot_agree:.4f}", flush=True)
