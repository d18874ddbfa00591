"""Find the wavefront integrator's 100x slowdown: time one launch and its
pieces at bench shapes (1024^2, spp 4, depth 5, pool 1M)."""
import time
import jax
import jax.numpy as jnp
import luisarender_tpu as lr
from luisarender_tpu import testing

res, spp, depth = 1024, 4, 5
d = testing.cornell_box(resolution=(res, res), spp=spp, depth=depth, integrator="wavepath")
scene = lr.Scene.from_dict(d)
compiled = lr.compile_scene(scene)
integ = scene.integrator
camera = scene.cameras[0]

# replicate internals
from luisarender_tpu.integrators import common
w, h = camera.film.resolution
film = camera.film
spectrum = compiled.spectrum
self = integ
n_pixels = w * h
total_samples = n_pixels * spp
pool = min(self.state_count, total_samples)
print("pool:", pool, "total:", total_samples)

# grab the inner functions by running _render_one_camera? easier: copy logic
# via the module (it's a method); instead time the public render and per-call
t0 = time.perf_counter()
img = integ.render(compiled)
print("first render (incl compile):", time.perf_counter() - t0)
t0 = time.perf_counter()
img = integ.render(compiled)
dt = time.perf_counter() - t0
print("second render:", dt, "->", total_samples / dt / 1e6, "Mpaths/s")
