"""Measure cluster-tracer camera + bounce throughput on the 512k scene.

Run: python - < scratch/meas_cluster_pack.py  (cwd=/root/repo, real TPU)
Baselines (round 4, unpacked 0.655-fill clusters): camera raw 18.0 Mray/s
(51 ms), bounce1_deadmasked ~437 ms.
"""
import time

import jax
import jax.numpy as jnp

import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.accel import traverse
from luisarender_tpu.integrators import common

w, h = 1280, 720
scene = lr.Scene.from_dict(
    testing.mesh_heavy(res=(w, h), spp=4, depth=5, accel="flat")
)
compiled = lr.compile_scene(scene)
tr = compiled.arrays["trace"]
import numpy as np
tt = np.asarray(tr["cluster_tris"])
valid = tt[:, 9, :] > 0
print(f"clusters={tt.shape[0]} fill={valid.mean():.3f} "
      f"nodes={np.asarray(tr['cluster_nodes']).shape[0]}")

camera, integ = scene.cameras[0], scene.integrator
sampler, light_sampler = integ.sampler, integ.light_sampler
arrays = compiled.arrays
n = w * h
ys, xs = jnp.meshgrid(
    jnp.arange(h, dtype=jnp.int32), jnp.arange(w, dtype=jnp.int32),
    indexing="ij",
)
pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
geom = compiled.trace_geometry(arrays)
c = compiled.plan.spectral_dim


def timed(name, r, total_rays):
    def bench(iters):
        @jax.jit
        def run(rr):
            def step(i, acc):
                hh = traverse.trace_closest(
                    geom,
                    rr._replace(origin=rr.origin + jnp.float32(i) * 1e-7),
                )
                return acc + jnp.sum(hh.prim).astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, step, 0.0)
        float(run(r))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(r))
            best = min(best, time.perf_counter() - t0)
        return best
    t2, t10 = bench(2), bench(10)
    ms = (t10 - t2) / 8 * 1e3
    print(f"{name}: {ms:.1f} ms  ({total_rays/ms/1e3:.1f} Mray/s)")


# camera rays
state0 = sampler.start(pixel_xy, jnp.int32(0))
state0, u_filter = sampler.generate_pixel_2d(state0)
u_lens = jnp.full((n, 2), 0.5, jnp.float32)
cray, _, _ = camera.generate_rays(pixel_xy, u_filter, u_lens, 0.0)
timed("camera", cray, n)

# bounce-1 dead-masked rays
def make_carry(arrays):
    state = sampler.start(pixel_xy, jnp.int32(0))
    state, u_filter = sampler.generate_pixel_2d(state)
    u_lens = jnp.full((n, 2), 0.5, jnp.float32)
    ray, _, cw = camera.generate_rays(pixel_xy, u_filter, u_lens, 0.0)
    swl = compiled.spectrum.sample_wavelengths(jnp.zeros((n, 1), jnp.float32))
    init = common.init_carry(
        ray, jnp.broadcast_to(cw[..., None], (n, c)), state, swl
    )
    return common.bounce_step(
        compiled, arrays, sampler, light_sampler, init,
        max_depth=5, rr_depth=0, rr_threshold=0.95,
    )

carry = jax.block_until_ready(jax.jit(make_carry)(arrays))
bray = carry["ray"]._replace(
    t_max=jnp.where(carry["active"], carry["ray"].t_max, 0.0)
)
live = int(jnp.sum(carry["active"]))
timed("bounce1_deadmasked", bray, live)
print("live bounce rays:", live)
