"""Cluster-tracer experiments on the mixed-material scene's bounce rays.

Measures trace_closest on (a) camera rays, (b) bounce-1 rays, for the env's
LR_SORT_KEY / LR_CLUSTER_BLOCK / LR_CLUSTER_KCHUNK, plus dead-fraction
sensitivity. Prints one JSON line per measurement.
"""
import functools
import json
import os
import sys
import time

print = functools.partial(print, flush=True)

import jax
import jax.numpy as jnp

import luisarender_tpu as lr
from luisarender_tpu.accel import traverse
from luisarender_tpu.integrators import common
from luisarender_tpu.ops import cluster_pallas

d = json.load(open(os.path.join(os.path.dirname(__file__), "..", "scenes", "materials.json")))
d["render"]["cameras"][0]["prop"]["film"]["prop"]["resolution"] = [512, 512]
scene = lr.Scene.from_dict(d)
compiled = lr.compile_scene(scene)
camera, integ = scene.cameras[0], scene.integrator
sampler, light_sampler = integ.sampler, integ.light_sampler
arrays = compiled.arrays
w, h = camera.film.resolution
n = w * h
ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32), jnp.arange(w, dtype=jnp.int32), indexing="ij")
pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
geom = compiled.trace_geometry(arrays)
print(json.dumps({"tris": int(geom.num_tris),
                  "nodes": int(geom.cluster_nodes.shape[0]),
                  "clusters": int(geom.cluster_tris.shape[0]),
                  "block": cluster_pallas.BLOCK,
                  "kchunk": cluster_pallas.K_CHUNK,
                  "sortkey": cluster_pallas.SORT_KEY_MODE}))

c = compiled.plan.spectral_dim
state0 = sampler.start(pixel_xy, jnp.int32(0))
state0, u_filter = sampler.generate_pixel_2d(state0)
u_lens = jnp.full((n, 2), 0.5, jnp.float32)
cam_ray, _, cw = camera.generate_rays(pixel_xy, u_filter, u_lens, 0.0)

def make_carry(arrays):
    swl = compiled.spectrum.sample_wavelengths(jnp.zeros((n, 1), jnp.float32))
    init = common.init_carry(cam_ray, jnp.broadcast_to(cw[..., None], (n, c)), state0, swl)
    ca = init
    for _ in range(2):
        ca = common.bounce_step(compiled, arrays, sampler, light_sampler, ca,
                                max_depth=10, rr_depth=0, rr_threshold=0.95)
    return ca

carry = jax.block_until_ready(jax.jit(make_carry)(arrays))
b_ray = carry["ray"]
active = carry["active"]
print(json.dumps({"alive_frac_bounce2": float(jnp.mean(active.astype(jnp.float32)))}))


def timed(name, ray):
    def bench(iters):
        @jax.jit
        def run(r):
            def step(i, acc):
                hh = traverse.trace_closest(geom, r._replace(origin=r.origin + jnp.float32(i) * 1e-7))
                return acc + jnp.sum(hh.prim).astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, step, 0.0)
        jax.block_until_ready(run(ray))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(run(ray))
            best = min(best, time.perf_counter() - t0)
        return best
    t4, t32 = bench(4), bench(32)
    ms = (t32 - t4) / 28 * 1e3
    print(json.dumps({"trace": name, "ms": round(ms, 3), "Mray/s": round(n / ms / 1e3, 2)}))


timed("camera", cam_ray)
timed("bounce2", b_ray)
# dead-masked variant: only active lanes trace (t_max=0 on dead)
masked = b_ray._replace(t_max=jnp.where(active, b_ray.t_max, 0.0))
timed("bounce2_deadmasked", masked)
