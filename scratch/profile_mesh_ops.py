import sys, time, glob, gzip, json, collections
import jax, jax.numpy as jnp
import luisarender_tpu as lr
sys.path.insert(0, "/root/repo/scratch")
from bench_meshheavy import make_scene
from luisarender_tpu.integrators.mega_path import path_trace_batch

scene = lr.Scene.from_dict(make_scene(res=(1280, 720), spp=1, depth=3, n=5, subdiv=5, accel="flat"))
compiled = lr.compile_scene(scene)
camera, integ = scene.cameras[0], scene.integrator
w, h = 1280, 720
ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32), jnp.arange(w, dtype=jnp.int32), indexing="ij")
pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
f = jax.jit(lambda arrays, si: path_trace_batch(
    compiled, arrays, camera, integ.sampler, integ.light_sampler,
    pixel_xy, si, max_depth=3, rr_depth=integ.rr_depth,
    rr_threshold=integ.rr_threshold)[0].sum())
r = jax.block_until_ready(f(compiled.arrays, jnp.int32(0)))
with jax.profiler.trace("/tmp/jtrace"):
    r = jax.block_until_ready(f(compiled.arrays, jnp.int32(1)))
print("traced", float(r), flush=True)

# parse the trace: sum durations by op name on the device track
paths = glob.glob("/tmp/jtrace/**/*.trace.json.gz", recursive=True)
print(paths, flush=True)
ev = []
for p in paths:
    with gzip.open(p, "rt") as fh:
        data = json.load(fh)
    ev.extend(data.get("traceEvents", []))
dur = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and "dur" in e:
        name = e.get("name", "?")
        cat = (e.get("args") or {}).get("long_name", "")
        dur[name[:60]] += e["dur"]
for name, d in dur.most_common(25):
    print(f"{d/1e3:9.1f} ms  {name}", flush=True)
