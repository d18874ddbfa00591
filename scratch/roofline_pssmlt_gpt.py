"""PSSMLT / GPT rooflines (VERDICT r4 item 8): where do the Msamples go?

Phase tables via the slope method on the bench configs (128^2, depth 6/4),
plus the 16k-vs-256k-chain PSSMLT quality comparison at equal mutation
budget. Run: python - < scratch/roofline_pssmlt_gpt.py  (cwd=/root/repo)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import luisarender_tpu as lr
from luisarender_tpu import testing


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


# ---------------- PSSMLT ----------------
res = 128
d = testing.cornell_box(resolution=(res, res), spp=16, depth=6)
d["render"]["integrator"] = {"impl": "pssmlt", "prop": {"depth": 6}}
scene = lr.Scene.from_dict(d)
compiled = lr.compile_scene(scene)
integ = scene.integrator
arrays = compiled.arrays
camera = scene.cameras[0]
sampler = integ  # unused
chains = integ.chains
dims = integ._dims()
print(f"pssmlt chains={chains} dims={dims}", flush=True)

from luisarender_tpu.integrators.pssmlt import PSSSampler

u0 = jnp.asarray(
    np.random.default_rng(0).uniform(size=(chains, dims)).astype(np.float32)
)


def trace_n(n, arrays, u0):
    def step(i, acc):
        rgb, lum, pxy = integ._trace(
            compiled, arrays, camera, PSSSampler(dims),
            jnp.clip(u0 + i * 1e-6, 0.0, 0.999),
        )
        return acc + jnp.sum(lum) + rgb[0, 0]
    return jax.lax.fori_loop(0, n, step, jnp.float32(0.0))


ms_trace = slope(trace_n, arrays, u0)
print(f"pssmlt path-eval ({chains} chains): {ms_trace:.2f} ms "
      f"({chains/ms_trace/1e3:.2f} Msamples/s eval-only)", flush=True)


def mutate_n(n, arrays, u0):
    def step(i, acc):
        ur = jnp.clip(u0 * 0.77 + i * 1e-6, 0.0, 0.999)
        u2 = integ._mutate(u0, ur, (ur[:, 0] < 0.3), 5e-3)
        return acc + jnp.sum(u2[:, 0])
    return jax.lax.fori_loop(0, n, step, jnp.float32(0.0))


ms_mut = slope(mutate_n, arrays, u0)
print(f"pssmlt mutate: {ms_mut:.2f} ms", flush=True)

# full iteration (one mutation round incl. accept/splat) measured from the
# integrator's own cached pass if accessible — approximate from a render
t0 = time.perf_counter()
integ.render(compiled)
warm = time.perf_counter() - t0
t0 = time.perf_counter()
integ.render(compiled)
full = time.perf_counter() - t0
spp = camera.spp
print(f"pssmlt full render ({spp} spp-equiv): {full*1e3:.0f} ms "
      f"({res*res*spp/full/1e6:.2f} Msamples/s)", flush=True)

# ---------------- GPT ----------------
d2 = testing.cornell_box(resolution=(res, res), spp=16, depth=4)
d2["render"]["integrator"] = {"impl": "gpt", "prop": {"depth": 4}}
scene2 = lr.Scene.from_dict(d2)
compiled2 = lr.compile_scene(scene2)
integ2 = scene2.integrator
integ2.render(compiled2)
t0 = time.perf_counter()
integ2.render(compiled2)
full2 = time.perf_counter() - t0
print(f"gpt full render: {full2*1e3:.0f} ms "
      f"({res*res*16/full2/1e6:.2f} Msamples/s)", flush=True)
print("done", flush=True)
