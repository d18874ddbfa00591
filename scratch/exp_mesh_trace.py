"""Sort-key / tuning sweep for the cluster tracer on mesh-heavy bounce rays.

Env LR_SORT_KEY / LR_CLUSTER_BLOCK / LR_CLUSTER_KCHUNK are read by
cluster_pallas at import, so this script is run once per config by the
sweep driver at the bottom of the file (spawn mode) or directly.
"""
import functools
import json
import os
import sys
import time

print = functools.partial(print, flush=True)

if os.environ.get("EXP_CHILD"):
    import jax
    import jax.numpy as jnp

    import luisarender_tpu as lr
    from luisarender_tpu import testing
    from luisarender_tpu.accel import traverse
    from luisarender_tpu.integrators import common
    from luisarender_tpu.ops import cluster_pallas

    w, h = 1280, 720
    scene = lr.Scene.from_dict(testing.mesh_heavy(res=(w, h), spp=4, depth=5, accel="flat"))
    compiled = lr.compile_scene(scene)
    camera, integ = scene.cameras[0], scene.integrator
    sampler, light_sampler = integ.sampler, integ.light_sampler
    arrays = compiled.arrays
    n = w * h
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32), jnp.arange(w, dtype=jnp.int32), indexing="ij")
    pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
    geom = compiled.trace_geometry(arrays)
    c = compiled.plan.spectral_dim

    def make_carry(arrays):
        state = sampler.start(pixel_xy, jnp.int32(0))
        state, u_filter = sampler.generate_pixel_2d(state)
        u_lens = jnp.full((n, 2), 0.5, jnp.float32)
        ray, _, cw = camera.generate_rays(pixel_xy, u_filter, u_lens, 0.0)
        swl = compiled.spectrum.sample_wavelengths(jnp.zeros((n, 1), jnp.float32))
        init = common.init_carry(ray, jnp.broadcast_to(cw[..., None], (n, c)), state, swl)
        return common.bounce_step(compiled, arrays, sampler, light_sampler, init,
                                  max_depth=5, rr_depth=0, rr_threshold=0.95)

    carry = jax.block_until_ready(jax.jit(make_carry)(arrays))
    ray = carry["ray"]._replace(
        t_max=jnp.where(carry["active"], carry["ray"].t_max, 0.0)
    )

    def timed(name, r):
        def bench(iters):
            @jax.jit
            def run(rr):
                def step(i, acc):
                    hh = traverse.trace_closest(geom, rr._replace(origin=rr.origin + jnp.float32(i) * 1e-7))
                    return acc + jnp.sum(hh.prim).astype(jnp.float32)
                return jax.lax.fori_loop(0, iters, step, 0.0)
            jax.block_until_ready(run(r))
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                jax.block_until_ready(run(r))
                best = min(best, time.perf_counter() - t0)
            return best
        t2, t10 = bench(2), bench(10)
        ms = (t10 - t2) / 8 * 1e3
        print(json.dumps({
            "cfg": {"sort": cluster_pallas.SORT_KEY_MODE,
                    "block": cluster_pallas.BLOCK,
                    "kchunk": cluster_pallas.K_CHUNK},
            "trace": name, "ms": round(ms, 2)}))

    timed("bounce1_deadmasked", ray)
else:
    import subprocess
    cfgs = [
        {},
        {"LR_SORT_KEY": "1"},
        {"LR_SORT_KEY": "2"},
        {"LR_CLUSTER_KCHUNK": "16"},
        {"LR_CLUSTER_BLOCK": "2048"},
        {"LR_SORT_KEY": "1", "LR_CLUSTER_BLOCK": "2048"},
    ]
    for cfg in cfgs:
        env = dict(os.environ)
        env.update(cfg)
        env["EXP_CHILD"] = "1"
        subprocess.run([sys.executable, __file__], env=env, timeout=2400)
