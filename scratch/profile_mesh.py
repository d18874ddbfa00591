"""Per-phase timing breakdown of the 512k-tri mesh bench (VERDICT item 9).

Times each component of one bounce separately on the real TPU:
  trace_closest (camera rays), trace_any (shadow), surface_interaction,
  NEE (light sample + surface evaluate), BSDF sample, full bounce_step.
"""
import json
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

w, h, spp, depth = 1280, 720, 4, 5
scene = lr.Scene.from_dict(
    testing.mesh_heavy(res=(w, h), spp=spp, depth=depth, accel="flat")
)
compiled = lr.compile_scene(scene)
camera, integ = scene.cameras[0], scene.integrator
sampler, light_sampler = integ.sampler, integ.light_sampler
n = w * h

ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32), jnp.arange(w, dtype=jnp.int32), indexing="ij")
pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)

arrays = compiled.arrays
geom = compiled.trace_geometry(arrays)
print("num_tris", geom.num_tris, "cluster nodes", None if geom.cluster_nodes is None else geom.cluster_nodes.shape)
print("surface types:", [c.__name__ for c in compiled.plan.surface_types])

# camera rays
state0 = sampler.start(pixel_xy, jnp.int32(0))
state0, u_filter = sampler.generate_pixel_2d(state0)
u_lens = jnp.full((n, 2), 0.5, jnp.float32)
ray, _, cam_weight = camera.generate_rays(pixel_xy, u_filter, u_lens, 0.0)
ray = jax.tree.map(lambda x: x.block_until_ready(), ray)


def timed(name, fn, *args, iters=4):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"phase": name, "ms": round(dt * 1e3, 2), "Mray/s": round(n / dt / 1e6, 2)}))
    return r


hit = timed("trace_closest(camera)", lambda r: traverse.trace_closest(geom, r), ray)

# a secondary ray batch: random directions from hit points (incoherent-ish)
it = jax.jit(lambda a, hh, r: surface_interaction(a, hh, r, needs_uv=compiled.plan.needs_uv))(arrays, hit, ray)
jax.block_until_ready(it)
timed("surface_interaction", lambda a, hh, r: surface_interaction(a, hh, r, needs_uv=compiled.plan.needs_uv), arrays, hit, ray)

key = jax.random.PRNGKey(0)
d2 = jax.random.normal(key, (n, 3))
d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
ray2 = ct.Ray(origin=it.p, direction=d2, t_min=jnp.full((n,), 1e-3), t_max=jnp.full((n,), 3e38))
timed("trace_closest(bounce,unsorted-random)", lambda r: traverse.trace_closest(geom, r), ray2)
timed("trace_any(shadow)", lambda r: traverse.trace_any(geom, r), ray2)

# NEE block
c = compiled.plan.spectral_dim
swl = compiled.spectrum.sample_wavelengths(jnp.zeros((n, 1), jnp.float32))
wo = -ray.direction
u = jnp.full((n,), 0.5)
u2 = jnp.full((n, 2), 0.5)


def nee(a, itx):
    ctx = compiled.context(a)
    ls = light_sampler.sample(ctx, itx, u, u2, swl, 0.0)
    f_eval = surf_base.dispatch(ctx, itx, "evaluate", swl, ls["wi"], ls["wi"],
                                init={"f": jnp.zeros((n, c), jnp.float32),
                                      "pdf": jnp.zeros((n,), jnp.float32)})
    return ls["L"] * f_eval["f"]


timed("NEE sample+evaluate (no trace)", nee, arrays, it)


def bsdf_sample(a, itx):
    ctx = compiled.context(a)
    s = surf_base.dispatch(ctx, itx, "sample", swl, wo, u, u2,
                           init={"f": jnp.zeros((n, c), jnp.float32),
                                 "pdf": jnp.zeros((n,), jnp.float32),
                                 "wi": jnp.broadcast_to(jnp.asarray([0., 0., 1.], jnp.float32), (n, 3)),
                                 "event": jnp.zeros((n,), jnp.int32),
                                 "eta": jnp.ones((n,), jnp.float32)})
    return s["f"]


timed("BSDF dispatch sample", bsdf_sample, arrays, it)

# full bounce step
init = common.init_carry(ray, jnp.broadcast_to(cam_weight[..., None], (n, c)), state0, swl, cone=camera.ray_cone())


def one_bounce(a, carry):
    return common.bounce_step(compiled, a, sampler, light_sampler, carry,
                              max_depth=depth, rr_depth=0, rr_threshold=0.95)


carry1 = timed("bounce_step (1st)", one_bounce, arrays, init)
timed("bounce_step (2nd, from carry1)", one_bounce, arrays, carry1)
