"""Per-phase MARGINAL timing of one bounce at 1M lanes (slope method:
run fori_loop at ITERS=4 and 32 inside one jit, marginal = slope). This
removes both the ~30ms axon RPC overhead and any fixed program overhead.
"""
import time
import jax, jax.numpy as jnp
import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.integrators import common
from luisarender_tpu.accel import traverse
from luisarender_tpu.scene.geometry import surface_interaction
from luisarender_tpu.surfaces import base as surf_base
from luisarender_tpu.core import types as ct

res, depth = 1024, 5
scene = lr.Scene.from_dict(testing.cornell_box(resolution=(res, res), spp=8, depth=depth))
compiled = lr.compile_scene(scene)
camera, integ = scene.cameras[0], scene.integrator
sampler, light_sampler = integ.sampler, integ.light_sampler
arrays = compiled.arrays
n = res * res
ys, xs = jnp.meshgrid(jnp.arange(res, dtype=jnp.int32), jnp.arange(res, dtype=jnp.int32), indexing="ij")
pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)

def make_carry(arrays):
    spectrum = compiled.spectrum
    c = compiled.plan.spectral_dim
    state = sampler.start(pixel_xy, jnp.int32(0))
    state, u_filter = sampler.generate_pixel_2d(state)
    u_lens = jnp.full((n, 2), 0.5, jnp.float32)
    ray, _, cw = camera.generate_rays(pixel_xy, u_filter, u_lens, 0.0)
    swl = spectrum.sample_wavelengths(jnp.zeros((n, 1), jnp.float32))
    init = common.init_carry(ray, jnp.broadcast_to(cw[..., None], (n, c)), state, swl, cone=camera.ray_cone())
    ca = common.bounce_step(compiled, arrays, sampler, light_sampler, init,
                            max_depth=depth, rr_depth=0, rr_threshold=0.95)
    return ca

carry = jax.block_until_ready(jax.jit(make_carry)(arrays))
ray = carry["ray"]; swl = carry["swl"]; state = carry["state"]
c = compiled.plan.spectral_dim
geom = compiled.trace_geometry(arrays)
ctx = compiled.context(arrays)

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
    print(f"{name:34s} {(t32-t4)/28*1e3:8.3f} ms")

hit0 = jax.block_until_ready(jax.jit(lambda: traverse.trace_closest(geom, ray))())
it0 = jax.block_until_ready(jax.jit(lambda: surface_interaction(arrays, hit0, ray, needs_uv=compiled.plan.needs_uv))())
it0 = it0._replace(valid=it0.valid & carry["active"])
u_sel = jnp.full((n,), 0.37, jnp.float32)
u2 = jnp.full((n, 2), 0.3, jnp.float32)
ls0 = jax.block_until_ready(jax.jit(lambda: light_sampler.sample(ctx, it0, u_sel, u2, swl, 0.0))())
wo = -ray.direction
sray0 = jax.block_until_ready(jax.jit(lambda: ct.spawn_ray_to(it0, ls0["p"], ls0["ng"]))())

timed("trace_closest", lambda i: traverse.trace_closest(geom, ray._replace(origin=ray.origin + jnp.float32(i) * 1e-7)),
      lambda h: jnp.sum(h.t * 0) + jnp.sum(h.prim).astype(jnp.float32))
timed("surface_interaction",
      lambda i: surface_interaction(arrays, hit0._replace(bary=hit0.bary + jnp.float32(i) * 1e-7), ray, needs_uv=compiled.plan.needs_uv),
      lambda it: jnp.sum(it.p))
timed("light_sampler.sample",
      lambda i: light_sampler.sample(ctx, it0, (u_sel + jnp.float32(i) * 1e-3) % 1.0, u2, swl, 0.0),
      lambda ls: jnp.sum(ls["L"]) + jnp.sum(ls["wi"]))
timed("dispatch evaluate",
      lambda i: surf_base.dispatch(ctx, it0, "evaluate", swl, wo, ls0["wi"] + jnp.float32(i) * 1e-7,
        init={"f": jnp.zeros((n, c), jnp.float32), "pdf": jnp.zeros((n,), jnp.float32)}),
      lambda r: jnp.sum(r["f"]) + jnp.sum(r["pdf"]))
timed("dispatch sample",
      lambda i: surf_base.dispatch(ctx, it0, "sample", swl, wo, (u_sel + jnp.float32(i) * 1e-3) % 1.0, u2,
        init={"f": jnp.zeros((n, c), jnp.float32), "pdf": jnp.zeros((n,), jnp.float32),
              "wi": jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3)),
              "event": jnp.zeros((n,), jnp.int32), "eta": jnp.ones((n,), jnp.float32)}),
      lambda r: jnp.sum(r["f"]) + jnp.sum(r["wi"]))
timed("trace_any (shadow)",
      lambda i: traverse.trace_any(geom, sray0._replace(origin=sray0.origin + jnp.float32(i) * 1e-7)),
      lambda occ: jnp.sum(occ).astype(jnp.float32))

def shade(i):
    return common.shade_surface(compiled, arrays, light_sampler, it0, wo, swl,
        carry["L"], ray, carry["beta"] + jnp.float32(i) * 1e-7, carry["pdf_bsdf"], carry["eta_scale"],
        carry["active"], carry["n_rays"], (u_sel, u2, u_sel, u2))
timed("shade_surface (full NEE+BSDF)", shade,
      lambda r: jnp.sum(r[0]) + jnp.sum(r[2]))

def full(i):
    ca = dict(carry)
    ca["beta"] = carry["beta"] + jnp.float32(i) * 1e-7
    return common.bounce_step(compiled, arrays, sampler, light_sampler, ca,
                              max_depth=depth, rr_depth=0, rr_threshold=0.95)
timed("bounce_step (full)", full, lambda ca: jnp.sum(ca["L"]) + jnp.sum(ca["beta"]))
