"""while_loop vs unrolled bounce loop at bench shapes."""
import time
import jax, jax.numpy as jnp
import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.integrators import common

res, depth = 1024, 5
scene = lr.Scene.from_dict(testing.cornell_box(resolution=(res, res), spp=8, depth=depth))
compiled = lr.compile_scene(scene)
camera, integ = scene.cameras[0], scene.integrator
sampler, light_sampler = integ.sampler, integ.light_sampler
n = res * res
ys, xs = jnp.meshgrid(jnp.arange(res, dtype=jnp.int32), jnp.arange(res, dtype=jnp.int32), indexing="ij")
pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)

def make_sample(loop_kind):
    def full_sample(arrays, si):
        spectrum = compiled.spectrum
        c = compiled.plan.spectral_dim
        state = sampler.start(pixel_xy, si)
        state, u_filter = sampler.generate_pixel_2d(state)
        u_lens = jnp.full((n, 2), 0.5, jnp.float32)
        ray, _, cw = camera.generate_rays(pixel_xy, u_filter, u_lens, 0.0)
        swl = spectrum.sample_wavelengths(jnp.zeros((n, 1), jnp.float32))
        init = common.init_carry(ray, jnp.broadcast_to(cw[..., None], (n, c)), state, swl, cone=camera.ray_cone())
        body = lambda ca: common.bounce_step(compiled, arrays, sampler, light_sampler, ca,
                                             max_depth=depth, rr_depth=0, rr_threshold=0.95)
        if loop_kind == "while":
            final = jax.lax.while_loop(common.has_work, body, init)
        elif loop_kind == "unroll":
            ca = init
            for _ in range(depth):
                ca = body(ca)
            final = ca
        else:  # fori
            final = jax.lax.fori_loop(0, depth, lambda i, ca: body(ca), init)
        return spectrum.srgb(final["L"], final["swl"]).sum()
    return jax.jit(full_sample)

for kind in ["while", "fori", "unroll"]:
    f = make_sample(kind)
    t0 = time.perf_counter()
    r = jax.block_until_ready(f(compiled.arrays, jnp.int32(0)))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(4):
        r = f(compiled.arrays, jnp.int32(i))
    jax.block_until_ready(r)
    dt = (time.perf_counter()-t0)/4
    print(f"{kind:8s} compile {tc:6.1f}s   run {dt*1e3:8.2f} ms   {3.7/dt:6.1f} Mray/s-est")
