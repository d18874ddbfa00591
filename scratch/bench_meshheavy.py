"""Benchmark the GENERAL (non-fused) path on a bedroom-class synthetic scene:
~500k triangles (grid of subdivided icospheres in a box), Disney + checker
textures, BVH accel, 1280x720 megapath. BASELINE.json config #3 probe."""

import json
import sys
import time

import jax
import jax.numpy as jnp

import luisarender_tpu as lr
from luisarender_tpu.integrators.mega_path import path_trace_batch


from luisarender_tpu.testing import mesh_heavy as make_scene


def main():
    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 5
    subdiv = int(sys.argv[sys.argv.index("--subdiv") + 1]) if "--subdiv" in sys.argv else 5
    accel = sys.argv[sys.argv.index("--accel") + 1] if "--accel" in sys.argv else "auto"
    spp = int(sys.argv[sys.argv.index("--spp") + 1]) if "--spp" in sys.argv else 4
    depth = 5
    res = (1280, 720)

    t0 = time.perf_counter()
    scene = lr.Scene.from_dict(make_scene(res=res, spp=spp, depth=depth, n=n, subdiv=subdiv, accel=accel))
    compiled = lr.compile_scene(scene)
    t_compile = time.perf_counter() - t0
    plan = compiled.plan
    print(
        f"scene build+compile {t_compile:.1f}s; tris={compiled.arrays['tri_v0'].shape[0] if 'tri_v0' in compiled.arrays else '?'}",
        flush=True,
    )
    print("plan keys:", {k: v for k, v in vars(plan).items() if not k.startswith('_')} if hasattr(plan, '__dict__') else plan, flush=True)

    camera = scene.cameras[0]
    integrator = scene.integrator
    w, h = res
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32), jnp.arange(w, dtype=jnp.int32), indexing="ij")
    pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)

    @jax.jit
    def bench_pass(arrays, sample_index):
        rgb, weight, stats = path_trace_batch(
            compiled, arrays, camera, integrator.sampler, integrator.light_sampler,
            pixel_xy, sample_index, max_depth=depth,
            rr_depth=integrator.rr_depth, rr_threshold=integrator.rr_threshold,
            with_stats=True,
        )
        return jnp.sum(rgb), stats["rays"]

    @jax.jit
    def bench_batch(arrays, s0):
        def one(i, acc):
            s_acc, r_acc = acc
            s, r = bench_pass(arrays, s0 + i)
            return s_acc + s, r_acc + r
        return jax.lax.fori_loop(0, spp, one, (jnp.float32(0.0), jnp.int32(0)))

    t0 = time.perf_counter()
    s, r = bench_batch(compiled.arrays, jnp.int32(0))
    s.block_until_ready()
    print(f"jit+first run {time.perf_counter()-t0:.1f}s", flush=True)

    dt = float("inf")
    for k in range(3):
        t0 = time.perf_counter()
        s, r = bench_batch(compiled.arrays, jnp.int32(1 + k * spp))
        total_rays = int(r)
        sv = float(s)
        dt = min(dt, time.perf_counter() - t0)
        print(f"k={k} rays={total_rays} rgb_sum={sv:.2f} dt={time.perf_counter()-t0:.2f}", flush=True)

    print(json.dumps({
        "metric": "meshheavy_1280x720_megapath",
        "value": round(total_rays / dt / 1e6, 3),
        "unit": "Mray/s",
        "rays": total_rays,
        "dt": round(dt, 3),
    }))


if __name__ == "__main__":
    main()
