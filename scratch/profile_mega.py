"""Ablation profiling of the megakernel hot path on the real TPU.

Times each stage of the bounce step in isolation at bench shapes
(1024^2 rays) to locate the bottleneck behind 6.7 Mray/s.
"""

import time

import jax
import jax.numpy as jnp

import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.accel import traverse
from luisarender_tpu.core import types as ct
from luisarender_tpu.integrators import common
from luisarender_tpu.scene.geometry import surface_interaction
from luisarender_tpu.surfaces import base as surf_base

res = 1024
depth = 5
scene = lr.Scene.from_dict(testing.cornell_box(resolution=(res, res), spp=8, depth=depth))
compiled = lr.compile_scene(scene)
camera = scene.cameras[0]
integ = scene.integrator
sampler = integ.sampler
light_sampler = integ.light_sampler
arrays = compiled.arrays
geom = compiled.trace_geometry(arrays)
print("num_tris:", geom.num_tris, "platform:", jax.devices()[0].platform)

h = w = res
ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32), jnp.arange(w, dtype=jnp.int32), indexing="ij")
pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
n = pixel_xy.shape[0]


def timed(name, fn, *args, iters=8):
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.2f} ms   ({n/dt/1e6:8.2f} M/s)")
    return dt


# --- stage 0: camera ray gen + sampler start
@jax.jit
def gen_rays(arrays, si):
    state = sampler.start(pixel_xy, si)
    state, u_filter = sampler.generate_pixel_2d(state)
    u_lens = jnp.full((n, 2), 0.5, jnp.float32)
    ray, _, wgt = camera.generate_rays(pixel_xy, u_filter, u_lens, 0.0)
    return ray, wgt, state

ray, wgt, state = gen_rays(arrays, jnp.int32(0))
timed("camera ray gen + sampler start", gen_rays, arrays, jnp.int32(0))


# --- stage 1: closest trace only
@jax.jit
def trace_only(arrays, ray):
    g = compiled.trace_geometry(arrays)
    hit = traverse.trace_closest(g, ray)
    return hit.t.sum()

timed("trace_closest (1 launch)", trace_only, arrays, ray)


@jax.jit
def trace_any_only(arrays, ray):
    g = compiled.trace_geometry(arrays)
    occ = traverse.trace_any(g, ray)
    return occ.sum()

timed("trace_any (1 launch)", trace_any_only, arrays, ray)


# --- stage 2: surface interaction reconstruction
@jax.jit
def interact_only(arrays, ray):
    g = compiled.trace_geometry(arrays)
    hit = traverse.trace_closest(g, ray)
    it = surface_interaction(arrays, hit, ray, needs_uv=compiled.plan.needs_uv)
    return it.p.sum() + it.ns.sum()

timed("trace + surface_interaction", interact_only, arrays, ray)


# --- stage 3: sampler draws (the per-bounce 8 dims)
@jax.jit
def sampler_only(state):
    state, u_sel = sampler.generate_1d(state)
    state, u_light = sampler.generate_2d(state)
    state, u_lobe = sampler.generate_1d(state)
    state, u_bsdf = sampler.generate_2d(state)
    state, u_rr = sampler.generate_1d(state)
    return u_sel.sum() + u_light.sum() + u_lobe.sum() + u_bsdf.sum() + u_rr.sum()

timed("sampler 8 dims", sampler_only, state)


# --- stage 4: surface dispatch evaluate+sample
@jax.jit
def shade_only(arrays, ray):
    g = compiled.trace_geometry(arrays)
    ctx = compiled.context(arrays)
    hit = traverse.trace_closest(g, ray)
    it = surface_interaction(arrays, hit, ray, needs_uv=compiled.plan.needs_uv)
    spectrum = compiled.spectrum
    swl = spectrum.sample_wavelengths(jnp.zeros((n, 1), jnp.float32))
    c = compiled.plan.spectral_dim
    wo = -ray.direction
    u = jnp.full((n,), 0.4)
    u2 = jnp.full((n, 2), 0.3)
    f_eval = surf_base.dispatch(ctx, it, "evaluate", swl, wo, wo,
        init={"f": jnp.zeros((n, c)), "pdf": jnp.zeros((n,))})
    s = surf_base.dispatch(ctx, it, "sample", swl, wo, u, u2,
        init={"f": jnp.zeros((n, c)), "pdf": jnp.zeros((n,)),
              "wi": jnp.broadcast_to(jnp.asarray([0.,0.,1.]), (n,3)),
              "event": jnp.zeros((n,), jnp.int32), "eta": jnp.ones((n,))})
    return f_eval["f"].sum() + s["f"].sum()

timed("trace + interact + surf eval+sample", shade_only, arrays, ray)


# --- stage 5: light sampler sample (NEE)
@jax.jit
def nee_only(arrays, ray):
    g = compiled.trace_geometry(arrays)
    ctx = compiled.context(arrays)
    hit = traverse.trace_closest(g, ray)
    it = surface_interaction(arrays, hit, ray, needs_uv=compiled.plan.needs_uv)
    spectrum = compiled.spectrum
    swl = spectrum.sample_wavelengths(jnp.zeros((n, 1), jnp.float32))
    u = jnp.full((n,), 0.4)
    u2 = jnp.full((n, 2), 0.3)
    ls = light_sampler.sample(ctx, it, u, u2, swl, 0.0)
    return ls["L"].sum() + ls["pdf"].sum()

timed("trace + interact + light sample", nee_only, arrays, ray)


# --- full bounce step
swl = compiled.spectrum.sample_wavelengths(jnp.zeros((n, 1), jnp.float32))
init = common.init_carry(ray, jnp.ones((n, compiled.plan.spectral_dim)), state, swl)

@jax.jit
def one_bounce(arrays, carry):
    return common.bounce_step(compiled, arrays, sampler, light_sampler, carry,
                              max_depth=depth, rr_depth=0, rr_threshold=0.95)

timed("full bounce_step (1 iter)", one_bounce, arrays, init)


# --- full while_loop sample
@jax.jit
def full_sample(arrays, si):
    from luisarender_tpu.integrators.mega_path import path_trace_batch
    rgb, wgt, stats = path_trace_batch(
        compiled, arrays, camera, sampler, light_sampler, pixel_xy, si,
        max_depth=depth, rr_depth=0, rr_threshold=0.95, with_stats=True)
    return rgb.sum(), stats["rays"]

r = jax.block_until_ready(full_sample(arrays, jnp.int32(0)))
print("rays per sample:", int(r[1]))
dt = timed("full path_trace_batch (1 spp)", full_sample, arrays, jnp.int32(0))
print(f"=> {int(r[1])/dt/1e6:.2f} Mray/s")
