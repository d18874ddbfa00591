"""Ablation round 2: stub the traces / interaction inside the full bounce to
find where the 15.4 ms actually goes."""
import time
import jax
import jax.numpy as jnp
import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.accel import traverse
from luisarender_tpu.core import types as ct
from luisarender_tpu.integrators import common
from luisarender_tpu.scene import geometry as geo

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
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms")

def bounce(ca):
    return common.bounce_step(compiled, compiled.arrays, sampler, light_sampler, ca, max_depth=depth, rr_depth=0, rr_threshold=0.95)

timed("full bounce", bounce, carry1)

# --- stub trace_closest: fixed plausible hit
real_closest = traverse.trace_closest
def stub_closest(geom, rays):
    n_ = rays.origin.shape[0]
    return ct.Hit(inst=jnp.zeros(n_, jnp.int32), prim=jnp.zeros(n_, jnp.int32),
                  bary=jnp.full((n_, 2), 0.3), t=jnp.full(n_, 100.0))
traverse.trace_closest = stub_closest
timed("bounce, trace_closest stubbed", bounce, carry1)
traverse.trace_closest = real_closest

# --- stub trace_any
real_any = traverse.trace_any
traverse.trace_any = lambda geom, rays: rays.t_max < 0.0
timed("bounce, trace_any stubbed", bounce, carry1)
traverse.trace_any = real_any

# --- stub surface_interaction (keep trace)
real_it = geo.surface_interaction
def stub_it(arrays, hit, rays, needs_uv=False, cone_width=None):
    it = real_it(arrays, hit, rays, needs_uv=needs_uv, cone_width=cone_width)
    n_ = rays.origin.shape[0]
    z = jnp.zeros((n_, 3)); o = jnp.broadcast_to(jnp.asarray([0., 0., 1.]), (n_, 3))
    return it._replace(p=rays.origin + rays.direction * 100.0, ns=o, ng=o,
                       tangent=jnp.broadcast_to(jnp.asarray([1., 0., 0.]), (n_, 3)),
                       uv=jnp.full((n_, 2), 0.25))
common.surface_interaction = stub_it
timed("bounce, interaction fields stubbed", bounce, carry1)
common.surface_interaction = real_it

# --- stub both traces
traverse.trace_closest = stub_closest
traverse.trace_any = lambda geom, rays: rays.t_max < 0.0
timed("bounce, both traces stubbed", bounce, carry1)
# --- and interaction too
common.surface_interaction = stub_it
timed("bounce, traces+interaction stubbed", bounce, carry1)
traverse.trace_closest = real_closest
traverse.trace_any = real_any
common.surface_interaction = real_it

# --- sampler stub (keep everything else)
real_1d, real_2d = type(sampler).generate_1d, type(sampler).generate_2d
type(sampler).generate_1d = lambda self, st: (st, jnp.full((n,), 0.4))
type(sampler).generate_2d = lambda self, st: (st, jnp.full((n, 2), 0.3))
timed("bounce, sampler stubbed", bounce, carry1)
type(sampler).generate_1d, type(sampler).generate_2d = real_1d, real_2d
