"""Benchmark: Mray/s on the 1024^2 Cornell box (BASELINE.md headline metric).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Runs on whatever accelerator jax selects (the real TPU chip under the driver).

Secondary metrics (BASELINE.json): `python bench.py --grad` measures the
gradient-pass overhead ratio (forward+adjoint vs forward); `--wave` runs the
wavefront integrator on the same scene; `--mesh` runs the 512k-triangle
bedroom-class scene through the cluster-streaming tracer.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def grad_overhead():
    """Adjoint-vs-forward wall-clock ratio on a small Cornell config."""
    import luisarender_tpu as lr
    from luisarender_tpu import testing
    from luisarender_tpu.diff.render import get_in, make_render_fn

    scene = lr.Scene.from_dict(
        testing.cornell_box(resolution=(128, 128), spp=2, depth=4)
    )
    compiled = lr.compile_scene(scene)
    render = make_render_fn(
        compiled, scene.cameras[0], scene.integrator, spp=2, max_depth=4
    )
    path = ("textures", "constant", "value")
    params = {path: get_in(compiled.arrays, path)}

    fwd = jax.jit(lambda p, a: jnp.mean(render(p, a)))
    bwd = jax.jit(jax.grad(lambda p, a: jnp.mean(render(p, a))))

    def timed(f, pull):
        pull(f(params, compiled.arrays))  # compile
        t0 = time.perf_counter()
        for _ in range(4):
            r = f(params, compiled.arrays)
        pull(r)
        return (time.perf_counter() - t0) / 4

    t_f = timed(fwd, lambda r: float(r))
    t_b = timed(bwd, lambda r: float(jnp.sum(r[path])))
    ratio = (t_f + t_b) / t_f
    print(
        json.dumps(
            {
                "metric": "grad_pass_overhead",
                "value": round(ratio, 3),
                "unit": "x_forward",
                "vs_baseline": round(ratio / 3.0, 4),
            }
        )
    )


def wave_bench():
    """Wavefront integrator throughput on the Cornell config."""
    import luisarender_tpu as lr
    from luisarender_tpu import testing

    res, spp, depth = 1024, 4, 5
    d = testing.cornell_box(
        resolution=(res, res), spp=spp, depth=depth, integrator="wavepath"
    )
    scene = lr.Scene.from_dict(d)
    compiled = lr.compile_scene(scene)
    # compile+run once, then timed run
    scene.integrator.render(compiled)
    t0 = time.perf_counter()
    scene.integrator.render(compiled)
    dt = time.perf_counter() - t0
    paths = res * res * spp
    print(
        json.dumps(
            {
                "metric": "cornell_1024_wavefront_paths",
                "value": round(paths / dt / 1e6, 3),
                "unit": "Mpaths/s",
                "vs_baseline": 0.0,
            }
        )
    )


def mesh_bench():
    """Large-scene megapath throughput: 512k triangles, 1280x720, depth 5
    (cluster-streaming Pallas tracer + coherence-sorted rays)."""
    import luisarender_tpu as lr
    from luisarender_tpu import testing
    from luisarender_tpu.integrators.mega_path import path_trace_batch

    w, h, spp, depth = 1280, 720, 4, 5
    scene = lr.Scene.from_dict(
        testing.mesh_heavy(res=(w, h), spp=spp, depth=depth, accel="flat",
                           textured="--textured" in sys.argv)
    )
    compiled = lr.compile_scene(scene)
    camera, integ = scene.cameras[0], scene.integrator
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.int32), jnp.arange(w, dtype=jnp.int32),
        indexing="ij",
    )
    pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)

    @jax.jit
    def bench_batch(arrays, s0):
        def one(i, acc):
            s_acc, r_acc = acc
            rgb, _, stats = path_trace_batch(
                compiled, arrays, camera, integ.sampler, integ.light_sampler,
                pixel_xy, s0 + i, max_depth=depth, rr_depth=integ.rr_depth,
                rr_threshold=integ.rr_threshold, with_stats=True,
            )
            return s_acc + jnp.sum(rgb), r_acc + stats["rays"]
        return jax.lax.fori_loop(0, spp, one, (jnp.float32(0.0), jnp.int32(0)))

    s, r = bench_batch(compiled.arrays, jnp.int32(0))
    s.block_until_ready()
    dt = float("inf")
    for k in range(3):
        t0 = time.perf_counter()
        s, r = bench_batch(compiled.arrays, jnp.int32(1 + k * spp))
        rays = int(r)
        assert float(s) > 0.0, "black render — tracer regression"
        dt = min(dt, time.perf_counter() - t0)
    print(json.dumps({
        "metric": "meshheavy_512k_textured" if "--textured" in sys.argv else "meshheavy_512k_1280x720_megapath",
        "value": round(rays / dt / 1e6, 3),
        "unit": "Mray/s",
        "vs_baseline": 0.0,
    }))


def main():
    if "--grad" in sys.argv:
        return grad_overhead()
    if "--wave" in sys.argv:
        return wave_bench()
    if "--mesh" in sys.argv:
        return mesh_bench()
    import luisarender_tpu as lr
    from luisarender_tpu import testing
    from luisarender_tpu.integrators.mega_path import path_trace_batch

    res = 1024
    spp_warm = 1
    spp_bench = 32
    depth = 5

    scene = lr.Scene.from_dict(
        testing.cornell_box(resolution=(res, res), spp=spp_bench, depth=depth)
    )
    compiled = lr.compile_scene(scene)
    camera = scene.cameras[0]
    integrator = scene.integrator

    h = w = res
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.int32), jnp.arange(w, dtype=jnp.int32), indexing="ij"
    )
    pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)

    @jax.jit
    def bench_pass(arrays, sample_index):
        rgb, weight, stats = path_trace_batch(
            compiled,
            arrays,
            camera,
            integrator.sampler,
            integrator.light_sampler,
            pixel_xy,
            sample_index,
            max_depth=depth,
            rr_depth=integrator.rr_depth,
            rr_threshold=integrator.rr_threshold,
            with_stats=True,
        )
        return jnp.sum(rgb), stats["rays"]

    # all spp batched in ONE dispatch (matching the production render loop,
    # integrators/base.py samples-per-pass batching) so host->TPU round-trip
    # latency is amortized, not measured
    @jax.jit
    def bench_batch(arrays, sample_index0):
        def one(i, acc):
            s_acc, r_acc = acc
            s, r = bench_pass(arrays, sample_index0 + i)
            return s_acc + s, r_acc + r

        return jax.lax.fori_loop(
            0, spp_bench, one, (jnp.float32(0.0), jnp.int32(0))
        )

    # warmup + compile
    s, r = bench_batch(compiled.arrays, jnp.int32(0))
    s.block_until_ready()

    # best-of-3: a single timed call would fold the fixed per-dispatch
    # host->TPU round-trip (~30 ms through the axon tunnel) into a ~100 ms
    # measurement; production renders amortize it over many passes
    dt = float("inf")
    for k in range(3):
        t0 = time.perf_counter()
        s, r = bench_batch(compiled.arrays, jnp.int32(spp_warm + k * spp_bench))
        total_rays = int(r)
        float(s)  # sync
        dt = min(dt, time.perf_counter() - t0)

    mray_s = total_rays / dt / 1e6
    # No published baseline exists (BASELINE.json "published": {}) — report
    # vs_baseline as ratio to our own first-round target of 100 Mray/s.
    out = {
        "metric": "cornell_1024_megapath_rays",
        "value": round(mray_s, 3),
        "unit": "Mray/s",
        "vs_baseline": round(mray_s / 100.0, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
