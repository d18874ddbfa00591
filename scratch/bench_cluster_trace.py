"""Trace-only benchmark of the cluster tracer on the mesh-heavy scene:
camera rays (coherent) vs shuffled rays (incoherent) vs bounce-like rays."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import luisarender_tpu as lr

sys.path.insert(0, "/root/repo/scratch")
from bench_meshheavy import make_scene

n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 2
subdiv = int(sys.argv[sys.argv.index("--subdiv") + 1]) if "--subdiv" in sys.argv else 4

scene = lr.Scene.from_dict(make_scene(res=(1280, 720), spp=1, depth=3, n=n, subdiv=subdiv))
compiled = lr.compile_scene(scene)
geom = compiled.trace_geometry(compiled.arrays)
print("tris", compiled.plan.num_tris, "cluster tables",
      None if geom.cluster_nodes is None else (geom.cluster_nodes.shape, geom.cluster_tris.shape), flush=True)

from luisarender_tpu.core.types import Ray
from luisarender_tpu.ops import cluster_pallas as cp

# camera rays
cam = scene.cameras[0]
w, h = 1280, 720
ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
# generate rays through the camera model quickly: use lookat params directly
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

def bench(name, o_, d_, tmax=3e38):
    rays = Ray(jnp.asarray(o_), jnp.asarray(d_), jnp.full(N, 1e-3), jnp.full(N, tmax))
    f = jax.jit(lambda r: cp.trace_closest_cluster(geom.cluster_nodes, geom.cluster_tris, r))
    hit = f(rays); jax.block_until_ready(hit.t)
    t0 = time.perf_counter(); hit = f(rays); jax.block_until_ready(hit.t)
    dt = time.perf_counter() - t0
    hitfrac = float(jnp.mean(jnp.isfinite(hit.t)))
    print(f"{name}: {dt*1000:.1f} ms -> {N/dt/1e6:.2f} Mray/s (hit {hitfrac:.2f})", flush=True)
    return hit

hit = bench("camera coherent", o, d)

# shuffled camera rays (destroys block coherence, same ray set)
perm = np.random.default_rng(0).permutation(N)
bench("camera shuffled", o[perm], d[perm])

# bounce-like: random cosine directions from hit points
t = np.asarray(hit.t); m = np.isfinite(t)
hp = o + d * np.minimum(t, 3000.0)[:, None]
rng = np.random.default_rng(1)
bd = rng.normal(size=(N, 3)).astype(np.float32)
bd /= np.linalg.norm(bd, axis=1, keepdims=True)
bo = np.where(m[:, None], hp, o).astype(np.float32)
bench("bounce incoherent", bo + bd * 1e-2, bd)

# shadow-like: from hit points toward the light panel center
lc = np.array([500.0, 600.0, 500.0], np.float32)
sd = lc[None] - bo; sl = np.linalg.norm(sd, axis=1, keepdims=True); sd /= sl
rays = Ray(jnp.asarray(bo + sd * 1e-2), jnp.asarray(sd.astype(np.float32)), jnp.full(N, 1e-3), jnp.asarray((sl[:, 0] - 2e-2).astype(np.float32)))
f = jax.jit(lambda r: cp.trace_any_cluster(geom.cluster_nodes, geom.cluster_tris, r))
occ = f(rays); jax.block_until_ready(occ)
t0 = time.perf_counter(); occ = f(rays); jax.block_until_ready(occ); dt = time.perf_counter() - t0
print(f"shadow any: {dt*1000:.1f} ms -> {N/dt/1e6:.2f} Mray/s (occ {float(jnp.mean(occ)):.2f})", flush=True)
