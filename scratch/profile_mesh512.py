"""Marginal per-depth cost on the 512k-tri flat scene: where do 11s/4spp go?"""
import sys, time
import jax, jax.numpy as jnp
import luisarender_tpu as lr
sys.path.insert(0, "/root/repo/scratch")
from bench_meshheavy import make_scene
from luisarender_tpu.integrators.mega_path import path_trace_batch
from luisarender_tpu.accel import traverse
from luisarender_tpu.core.types import Ray

scene = lr.Scene.from_dict(make_scene(res=(1280, 720), spp=1, depth=5, n=5, subdiv=5, accel="flat"))
compiled = lr.compile_scene(scene)
camera, integ = scene.cameras[0], scene.integrator
w, h = 1280, 720
ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32), jnp.arange(w, dtype=jnp.int32), indexing="ij")
pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)

def timeit(name, f, *a):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter(); r = jax.block_until_ready(f(*a)); dt = time.perf_counter() - t0
    print(f"{name}: {dt*1e3:.0f} ms", flush=True)
    return r

geom = compiled.trace_geometry(compiled.arrays)
n = w * h
o = jnp.broadcast_to(jnp.asarray([500.0, 350.0, -700.0]), (n, 3))
import numpy as np
rng = np.random.default_rng(0)
d = rng.normal(size=(n, 3)).astype(np.float32); d /= np.linalg.norm(d, axis=1, keepdims=True)
rays = Ray(o, jnp.asarray(d), jnp.full(n, 1e-3), jnp.full(n, 3e38))
timeit("trace_closest 921k random", jax.jit(lambda r: traverse.trace_closest(geom, r).t), rays)
timeit("trace_any 921k random", jax.jit(lambda r: traverse.trace_any(geom, r)), rays)

for depth in (1, 2, 3, 5):
    f = jax.jit(lambda arrays, si, depth=depth: path_trace_batch(
        compiled, arrays, camera, integ.sampler, integ.light_sampler,
        pixel_xy, si, max_depth=depth, rr_depth=integ.rr_depth,
        rr_threshold=integ.rr_threshold)[0].sum())
    timeit(f"megapath depth={depth}", f, compiled.arrays, jnp.int32(0))
