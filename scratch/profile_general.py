"""Per-phase MARGINAL timing of the general path on the exact bench scenes.

Usage: python scratch/profile_general.py [mixed|hero|mesh|cornell]

Slope method: run each phase in a fori_loop at ITERS=4 and 32 inside one
jit; marginal ms = slope. Removes the ~30ms axon RPC overhead and fixed
program overhead. Also times one FULL sample pass (path_trace_batch) for
an end-to-end anchor.
"""
import json
import sys
import time
import functools
print = functools.partial(print, flush=True)

import jax
import jax.numpy as jnp

import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.accel import traverse
from luisarender_tpu.core import types as ct
from luisarender_tpu.integrators import common
from luisarender_tpu.integrators.mega_path import path_trace_batch
from luisarender_tpu.scene.geometry import surface_interaction
from luisarender_tpu.surfaces import base as surf_base

which = sys.argv[1] if len(sys.argv) > 1 else "mixed"

import os

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")
if which == "mixed":
    d = json.load(open(os.path.join(SCENES, "materials.json")))
    d["render"]["cameras"][0]["prop"]["film"]["prop"]["resolution"] = [512, 512]
elif which == "hero":
    d = json.load(open(os.path.join(SCENES, "cornell_spectral.json")))
elif which == "mesh":
    d = testing.mesh_heavy(res=(1280, 720), spp=4, depth=5, accel="flat")
else:
    d = testing.cornell_box(resolution=(1024, 1024), spp=8, depth=5)

scene = lr.Scene.from_dict(d)
compiled = lr.compile_scene(scene)
camera, integ = scene.cameras[0], scene.integrator
sampler, light_sampler = integ.sampler, integ.light_sampler
arrays = compiled.arrays
w, h = camera.film.resolution
n = w * h
depth = integ.max_depth
ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32), jnp.arange(w, dtype=jnp.int32), indexing="ij")
pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)

geom = compiled.trace_geometry(arrays)
ctx = compiled.context(arrays)
c = compiled.plan.spectral_dim
print(json.dumps({
    "scene": which, "lanes": n, "depth": depth, "spectral_dim": c,
    "num_tris": int(geom.num_tris),
    "surface_types": [cls.__name__ for cls in compiled.plan.surface_types],
    "spectrum": type(compiled.spectrum).__name__,
    "fused_eligible": __import__("luisarender_tpu.ops.fused_path", fromlist=["use_fused"]).use_fused(compiled, sampler, light_sampler),
}))

# ---- build a representative carry (after 1 bounce) ----
def make_carry(arrays):
    spectrum = compiled.spectrum
    state = sampler.start(pixel_xy, jnp.int32(0))
    state, u_filter = sampler.generate_pixel_2d(state)
    u_lens = jnp.full((n, 2), 0.5, jnp.float32)
    ray, _, cw = camera.generate_rays(pixel_xy, u_filter, u_lens, 0.0)
    if spectrum.is_fixed:
        swl = spectrum.sample_wavelengths(jnp.zeros((n, 1), jnp.float32))
    else:
        state, u_swl = sampler.generate_1d(state)
        swl = spectrum.sample_wavelengths(u_swl[..., None])
    init = common.init_carry(ray, jnp.broadcast_to(cw[..., None], (n, c)), state, swl, cone=camera.ray_cone())
    return common.bounce_step(compiled, arrays, sampler, light_sampler, init,
                              max_depth=depth, rr_depth=0, rr_threshold=0.95)

carry = jax.block_until_ready(jax.jit(make_carry)(arrays))
ray = carry["ray"]; swl = carry["swl"]; state = carry["state"]


def timed(name, body, reduce_out):
    def bench(iters):
        @jax.jit
        def run():
            def step(i, acc):
                return acc + reduce_out(body(i))
            return jax.lax.fori_loop(0, iters, step, 0.0)
        jax.block_until_ready(run())
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(run())
            best = min(best, time.perf_counter() - t0)
        return best
    t4, t32 = bench(4), bench(32)
    ms = (t32 - t4) / 28 * 1e3
    print(json.dumps({"phase": name, "ms": round(ms, 3),
                      "Mray/s@depth%d" % depth: round(n / ms / 1e3 / depth, 2)}))


hit0 = jax.block_until_ready(jax.jit(lambda: traverse.trace_closest(geom, ray))())
it0 = jax.block_until_ready(jax.jit(lambda: surface_interaction(arrays, hit0, ray, needs_uv=compiled.plan.needs_uv))())
it0 = it0._replace(valid=it0.valid & carry["active"])
u_sel = jnp.full((n,), 0.37, jnp.float32)
u2 = jnp.full((n, 2), 0.3, jnp.float32)
ls0 = jax.block_until_ready(jax.jit(lambda: light_sampler.sample(ctx, it0, u_sel, u2, swl, 0.0))())
wo = -ray.direction
sray0 = jax.block_until_ready(jax.jit(lambda: ct.spawn_ray_to(it0, ls0["p"], ls0["ng"]))())

timed("trace_closest", lambda i: traverse.trace_closest(geom, ray._replace(origin=ray.origin + jnp.float32(i) * 1e-7)),
      lambda hh: jnp.sum(hh.t * 0) + jnp.sum(hh.prim).astype(jnp.float32))
timed("surface_interaction",
      lambda i: surface_interaction(arrays, hit0._replace(bary=hit0.bary + jnp.float32(i) * 1e-7), ray, needs_uv=compiled.plan.needs_uv),
      lambda it: jnp.sum(it.p))
timed("light_sampler.sample",
      lambda i: light_sampler.sample(ctx, it0, (u_sel + jnp.float32(i) * 1e-3) % 1.0, u2, swl, 0.0),
      lambda ls: jnp.sum(ls["L"]) + jnp.sum(ls["wi"]))
timed("dispatch evaluate",
      lambda i: surf_base.dispatch(ctx, it0, "evaluate", swl, wo, ls0["wi"] + jnp.float32(i) * 1e-7,
        init={"f": jnp.zeros((n, c), jnp.float32), "pdf": jnp.zeros((n,), jnp.float32)}),
      lambda rr: jnp.sum(rr["f"]) + jnp.sum(rr["pdf"]))
timed("dispatch sample",
      lambda i: surf_base.dispatch(ctx, it0, "sample", swl, wo, (u_sel + jnp.float32(i) * 1e-3) % 1.0, u2,
        init={"f": jnp.zeros((n, c), jnp.float32), "pdf": jnp.zeros((n,), jnp.float32),
              "wi": jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3)),
              "event": jnp.zeros((n,), jnp.int32), "eta": jnp.ones((n,), jnp.float32)}),
      lambda rr: jnp.sum(rr["f"]) + jnp.sum(rr["wi"]))

# per-surface-type sample cost (which closure is the expensive one?)
for t, cls in enumerate(compiled.plan.surface_types):
    rows0 = surf_base._gather_rows(surf_base.params_arrays(ctx, t), jnp.zeros((n,), jnp.int32))
    timed("  type %d %s.sample" % (t, cls.__name__),
          lambda i, rows0=rows0, cls=cls: cls.sample(rows0, ctx, it0, swl, wo, (u_sel + jnp.float32(i) * 1e-3) % 1.0, u2),
          lambda rr: jnp.sum(rr["f"]) + jnp.sum(rr["wi"]))

timed("trace_any (shadow)",
      lambda i: traverse.trace_any(geom, sray0._replace(origin=sray0.origin + jnp.float32(i) * 1e-7)),
      lambda occ: jnp.sum(occ).astype(jnp.float32))

def shade(i):
    return common.shade_surface(compiled, arrays, light_sampler, it0, wo, swl,
        carry["L"], ray, carry["beta"] + jnp.float32(i) * 1e-7, carry["pdf_bsdf"], carry["eta_scale"],
        carry["active"], carry["n_rays"], (u_sel, u2, u_sel, u2))
timed("shade_surface (full NEE+BSDF)", shade,
      lambda rr: jnp.sum(rr[0]) + jnp.sum(rr[2]))

def full(i):
    ca = dict(carry)
    ca["beta"] = carry["beta"] + jnp.float32(i) * 1e-7
    return common.bounce_step(compiled, arrays, sampler, light_sampler, ca,
                              max_depth=depth, rr_depth=0, rr_threshold=0.95)
timed("bounce_step (full)", full, lambda ca: jnp.sum(ca["L"]) + jnp.sum(ca["beta"]))

# ---- end-to-end: one full sample pass (the bench's unit of work) ----
@jax.jit
def full_pass(arrays, s0):
    rgb, _, stats = path_trace_batch(
        compiled, arrays, camera, sampler, light_sampler, pixel_xy, s0,
        max_depth=depth, rr_depth=integ.rr_depth,
        rr_threshold=integ.rr_threshold, with_stats=True)
    return jnp.sum(rgb), stats["rays"]

s, r = full_pass(arrays, jnp.int32(0))
jax.block_until_ready(s)
best = 1e9
for k in range(3):
    t0 = time.perf_counter()
    s, r = full_pass(arrays, jnp.int32(1 + k))
    jax.block_until_ready(s)
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"phase": "FULL sample pass", "ms": round(best * 1e3, 2),
                  "rays": int(r), "Mray/s": round(int(r) / best / 1e6, 3)}))

