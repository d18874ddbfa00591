"""Ablate the matte dispatch cost at 1M lanes on TPU."""
import time
import jax
import jax.numpy as jnp
import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.accel import traverse
from luisarender_tpu.scene.geometry import surface_interaction
from luisarender_tpu.surfaces import base as surf_base
from luisarender_tpu.surfaces.matte import MatteSurface
from luisarender_tpu.textures.base import evaluate_handles
from luisarender_tpu.core import frame as fr

res = 1024
scene = lr.Scene.from_dict(testing.cornell_box(resolution=(res, res), spp=8, depth=5))
compiled = lr.compile_scene(scene)
arrays = compiled.arrays
n = res * res

key = jax.random.PRNGKey(0)
d = jax.random.normal(key, (n, 3)); d /= jnp.linalg.norm(d, axis=-1, keepdims=True)
o = jnp.broadcast_to(jnp.asarray([278.0, 273.0, 279.6]), (n, 3))
from luisarender_tpu.core.types import Ray
rays = Ray(origin=o, direction=d, t_min=jnp.zeros(n), t_max=jnp.full(n, 1e30))
geom = compiled.trace_geometry(arrays)
hit = jax.jit(lambda: traverse.trace_closest(geom, rays))()
jax.block_until_ready(hit.t)
it = jax.jit(lambda: surface_interaction(arrays, hit, rays))()
jax.block_until_ready(it.p)
ctx = compiled.context(arrays)
swl = compiled.spectrum.sample_wavelengths(jnp.zeros((n, 1), jnp.float32))
wo = -d
u = jnp.full((n,), 0.4); u2 = jnp.full((n, 2), 0.3)
c = compiled.plan.spectral_dim

def timed(name, fn, iters=10):
    f = jax.jit(fn)
    r = jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:8.2f} ms")

inst = arrays["instances"]
index = inst["surface_index"][it.inst]
rows = jax.jit(lambda: surf_base._gather_rows(surf_base.params_arrays(ctx, 0), index))()

timed("tag+index gathers", lambda: (inst["surface_tag"][it.inst] + inst["surface_index"][it.inst]).sum())
timed("evaluate_handles kd", lambda: evaluate_handles(ctx, rows["kd"], it, default=(1.,1.,1.,0.)).sum())
timed("oriented_frame", lambda: sum(v.sum() for v in surf_base.oriented_frame(rows, ctx, it, wo).values()))
timed("matte.evaluate direct", lambda: sum(v.sum() for v in MatteSurface.evaluate(rows, ctx, it, swl, wo, wo).values()))
timed("matte.sample direct", lambda: sum(v.sum() for v in MatteSurface.sample(rows, ctx, it, swl, wo, u, u2).values()))
timed("dispatch evaluate", lambda: sum(v.sum() for v in surf_base.dispatch(ctx, it, "evaluate", swl, wo, wo, init={"f": jnp.zeros((n, c)), "pdf": jnp.zeros((n,))}).values()))
timed("dispatch sample", lambda: sum(v.sum() for v in surf_base.dispatch(ctx, it, "sample", swl, wo, u, u2, init={"f": jnp.zeros((n, c)), "pdf": jnp.zeros((n,)), "wi": jnp.broadcast_to(jnp.asarray([0.,0.,1.]), (n,3)), "event": jnp.zeros((n,), jnp.int32), "eta": jnp.ones((n,))}).values()))
