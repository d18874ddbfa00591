"""Step-count instrumentation on the mesh-heavy scene (camera + bounce)."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
import luisarender_tpu as lr
sys.path.insert(0, "/root/repo/scratch")
from bench_meshheavy import make_scene
import cluster_instr as ci

scene = lr.Scene.from_dict(make_scene(res=(1280, 720), spp=1, depth=3, n=2, subdiv=4))
compiled = lr.compile_scene(scene)
geom = compiled.trace_geometry(compiled.arrays)
nodes, tris = geom.cluster_nodes, geom.cluster_tris
print("tris", compiled.plan.num_tris, "clusters", tris.shape[0], "nodes", nodes.shape[0], flush=True)

w, h = 1280, 720
ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
origin = np.array([500.0, 350.0, -700.0], np.float32)
front = np.array([0.0, -0.25, 1.0]); front /= np.linalg.norm(front)
up0 = np.array([0.0, 1.0, 0.0]); right = np.cross(front, up0); right /= np.linalg.norm(right)
up = np.cross(right, front)
tanf = np.tan(np.radians(50.0) / 2)
px = (xs.ravel() + 0.5) / w * 2 - 1
py = 1 - (ys.ravel() + 0.5) / h * 2
d = (front[None] + right[None] * (px[:, None] * tanf * w / h) + up[None] * (py[:, None] * tanf)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
N = d.shape[0]; o = np.tile(origin, (N, 1))

def stats(name, o_, d_):
    f = jax.jit(lambda o, d: ci._trace(o, d, jnp.full(N, 1e-3), jnp.full(N, 3e38), nodes, tris))
    r = f(jnp.asarray(o_), jnp.asarray(d_)); jax.block_until_ready(r[0])
    t0 = time.perf_counter(); r = f(jnp.asarray(o_), jnp.asarray(d_)); jax.block_until_ready(r[0]); dt = time.perf_counter() - t0
    a = np.asarray(r[4])[:, 0, 0]; b = np.asarray(r[5])[:, 0, 0]
    st = np.asarray(r[4])
    nb = st.shape[0]
    print(f"{name}: {dt*1e3:.1f} ms {N/dt/1e6:.2f} Mray/s | packets {nb} | A steps tot {a.sum():.0f} mean {a.mean():.0f} max {a.max():.0f} | B clusters tot {b.sum():.0f} mean {b.mean():.1f} max {b.max():.0f}", flush=True)
    return r

r = stats("camera", o, d)
t = np.asarray(r[0]); m = np.isfinite(t)
hp = o + d * np.minimum(np.nan_to_num(t, posinf=3000.0), 3000.0)[:, None]
rng = np.random.default_rng(1)
bd = rng.normal(size=(N, 3)).astype(np.float32); bd /= np.linalg.norm(bd, axis=1, keepdims=True)
bo = np.where(m[:, None], hp, o).astype(np.float32)
stats("bounce", bo + bd * 1e-2, bd)
