"""In-context ablation: full bounce vs bounce with surface dispatch stubbed
vs bounce with NEE stubbed. Deltas give the real fused-program cost."""
import time
import jax
import jax.numpy as jnp
import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.integrators import common
from luisarender_tpu.surfaces import base as surf_base

res, depth = 1024, 5
scene = lr.Scene.from_dict(testing.cornell_box(resolution=(res, res), spp=8, depth=depth))
compiled = lr.compile_scene(scene)
camera = scene.cameras[0]
integ = scene.integrator
sampler = integ.sampler
light_sampler = integ.light_sampler
n = res * res

h = w = res
ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32), jnp.arange(w, dtype=jnp.int32), indexing="ij")
pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)

state = sampler.start(pixel_xy, jnp.int32(0))
state, uf = sampler.generate_pixel_2d(state)
ray, _, wgt = camera.generate_rays(pixel_xy, uf, jnp.full((n, 2), 0.5), 0.0)
swl = compiled.spectrum.sample_wavelengths(jnp.zeros((n, 1), jnp.float32))
c = compiled.plan.spectral_dim
carry0 = common.init_carry(ray, jnp.ones((n, c)), state, swl, cone=camera.ray_cone())
carry1 = jax.jit(lambda ca: common.bounce_step(compiled, compiled.arrays, sampler, light_sampler, ca, max_depth=depth, rr_depth=0, rr_threshold=0.95))(carry0)
jax.block_until_ready(carry1["L"])

def timed(name, f, *a, iters=8):
    fj = jax.jit(f)
    r = jax.block_until_ready(jax.tree_util.tree_leaves(fj(*a))[0])
    t0 = time.perf_counter()
    for _ in range(iters): r = fj(*a)
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    print(f"{name:38s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms")

def bounce(ca):
    return common.bounce_step(compiled, compiled.arrays, sampler, light_sampler, ca, max_depth=depth, rr_depth=0, rr_threshold=0.95)

timed("full bounce", bounce, carry1)

real_dispatch = surf_base.dispatch
def stub_dispatch(ctx, it, method, *args, init):
    if method == "sample":
        out = dict(init)
        out["f"] = jnp.full_like(init["f"], 0.5)
        out["pdf"] = jnp.full_like(init["pdf"], 1.0)
        out["wi"] = it.ns
        return out
    out = dict(init)
    out["f"] = jnp.full_like(init["f"], 0.3)
    out["pdf"] = jnp.full_like(init["pdf"], 1.0)
    return out

surf_base.dispatch = stub_dispatch
import luisarender_tpu.integrators.common as common2
common2.surf_base.dispatch = stub_dispatch
timed("bounce, surface dispatch stubbed", bounce, carry1)
surf_base.dispatch = real_dispatch

# NEE stubbed: monkeypatch light_sampler.sample
real_sample = type(light_sampler).sample
def stub_sample(self, ctx, it, u_sel, u_surface, swl, time=0.0):
    shape = it.p.shape[:-1]
    return {"L": jnp.ones(shape + (swl.dimension,)), "pdf": jnp.ones(shape),
            "p": it.p + it.ng, "ng": -it.ng, "wi": it.ng,
            "is_env": jnp.zeros(shape, bool)}
type(light_sampler).sample = stub_sample
timed("bounce, light sample stubbed", bounce, carry1)
type(light_sampler).sample = real_sample

# both stubbed
surf_base.dispatch = stub_dispatch
type(light_sampler).sample = stub_sample
timed("bounce, both stubbed", bounce, carry1)
surf_base.dispatch = real_dispatch
type(light_sampler).sample = real_sample
