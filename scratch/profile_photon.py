"""Per-phase slope profile of the photon integrator on the bench scene.

Run: python - < scratch/profile_photon.py   (cwd=/root/repo, real TPU)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import luisarender_tpu as lr
from luisarender_tpu import testing

res, spp = 128, 16
d = testing.cornell_box(resolution=(res, res), spp=spp, depth=6)
d["render"]["integrator"] = {"impl": "megapm", "prop": {"depth": 6}}
scene = lr.Scene.from_dict(d)
compiled = lr.compile_scene(scene)
integ = scene.integrator
arrays = compiled.arrays
camera = integ  # placeholder




def slope(fn, *args, n1=1, n2=5):
    f = jax.jit(fn, static_argnums=(0,))
    float(f(n1, *args))
    float(f(n2, *args))
    ts = {}
    for n in (n1, n2):
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(n, *args))
            reps.append(time.perf_counter() - t0)
        ts[n] = min(reps)
    return (ts[n2] - ts[n1]) / (n2 - n1) * 1e3


# --- emit phase ---
def emit_n(n, arrays):
    def step(i, acc):
        ph = integ._emit_photons(compiled, arrays, i)
        return acc + ph[1][0, 0] + ph[0][-1, 0]
    return jax.lax.fori_loop(0, n, step, jnp.float32(0.0))

ms = slope(emit_n, arrays)
print(f"emit_photons: {ms:.1f} ms/iter")


# --- grid build ---
def grid_n(n, arrays):
    ph = integ._emit_photons(compiled, arrays, 0)
    def step(i, acc):
        ph2 = (ph[0] + 0.0 * i, ph[1], ph[2], ph[3])
        cellrow, table = integ._build_grid(compiled, arrays, ph2, 5.0)
        return acc + cellrow[0].astype(jnp.float32) + table[0, 0]
    return jax.lax.fori_loop(0, n, step, jnp.float32(0.0))

ms = slope(grid_n, arrays)
print(f"build_grid: {ms:.1f} ms/iter")

# --- camera pass (includes the 27-cell gather x4 bounces) ---
cam_obj = None
cam_obj = compiled.scene.cameras[0]
w, h = cam_obj.film.resolution
ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32), jnp.arange(w, dtype=jnp.int32), indexing="ij")
pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)

def campass_n(n, arrays):
    ph = integ._emit_photons(compiled, arrays, 0)
    grid = integ._build_grid(compiled, arrays, ph, 5.0)
    def step(i, acc):
        rgb, wgt = integ._camera_pass(
            compiled, arrays, cam_obj, pixel_xy, i, grid,
            jnp.float32(5.0), jnp.float32(65536.0),
        )
        return acc + rgb[0, 0] + rgb[-1, -1]
    return jax.lax.fori_loop(0, n, step, jnp.float32(0.0))

ms = slope(campass_n, arrays, n1=1, n2=3)
print(f"camera_pass: {ms:.1f} ms/iter")
print("done")
