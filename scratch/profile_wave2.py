"""Time the wavefront launch directly (per-launch, per-iteration cost)."""
import time
import jax
import jax.numpy as jnp
import luisarender_tpu as lr
from luisarender_tpu import testing

res, spp, depth = 512, 4, 5   # smaller for faster compile; pool = total
d = testing.cornell_box(resolution=(res, res), spp=spp, depth=depth, integrator="wavepath")
scene = lr.Scene.from_dict(d)
compiled = lr.compile_scene(scene)
integ = scene.integrator
camera = scene.cameras[0]
print("iters/launch:", integ.iterations_per_launch, "pool cap:", integ.state_count)

launch, (carry, accum, counter), total, pool = integ._build_launch(compiled, camera)
print("pool:", pool, "total:", total)

t0 = time.perf_counter()
out = launch(compiled.arrays, carry, accum, counter)
jax.block_until_ready(out[0]["L"])
print("launch compile+first:", time.perf_counter() - t0)

# fresh state for timing steady-state launches
launch2, (carry, accum, counter), *_ = integ._build_launch(compiled, camera)
t0 = time.perf_counter()
nl = 0
while True:
    carry, accum, counter, all_done = launch(compiled.arrays, carry, accum, counter)
    nl += 1
    if bool(all_done) or nl > 50:
        break
dt = time.perf_counter() - t0
print(f"launches: {nl}  total: {dt:.3f}s  per-launch: {dt/nl*1e3:.1f}ms  "
      f"per-iter: {dt/nl/integ.iterations_per_launch*1e3:.1f}ms")
print("paths/s:", total / dt / 1e6, "M")
