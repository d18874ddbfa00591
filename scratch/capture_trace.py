import time
import jax, jax.numpy as jnp
import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.integrators.mega_path import path_trace_batch

res, depth = 1024, 5
scene = lr.Scene.from_dict(testing.cornell_box(resolution=(res, res), spp=8, depth=depth))
compiled = lr.compile_scene(scene)
camera, integ = scene.cameras[0], scene.integrator
sampler, light_sampler = integ.sampler, integ.light_sampler
h = w = res
ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32), jnp.arange(w, dtype=jnp.int32), indexing="ij")
pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)

@jax.jit
def full_sample(arrays, si):
    rgb, wgt = path_trace_batch(compiled, arrays, camera, sampler, light_sampler,
        pixel_xy, si, max_depth=depth, rr_depth=0, rr_threshold=0.95)
    return rgb.sum()

r = jax.block_until_ready(full_sample(compiled.arrays, jnp.int32(0)))
t0 = time.perf_counter()
with jax.profiler.trace("/tmp/jaxtrace"):
    for i in range(3):
        r = full_sample(compiled.arrays, jnp.int32(i))
    jax.block_until_ready(r)
print("3 samples:", (time.perf_counter()-t0)/3*1e3, "ms each")
