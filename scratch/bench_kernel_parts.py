"""How much of the fused kernel is the triangle loops? Trace-only kernel
(closest+any per 'bounce', same select pattern) vs the full fused kernel."""
import time
from functools import partial
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.ops import fused_path as fp
from luisarender_tpu.ops.brute_pallas import make_tri_table

res, depth = 1024, 5
scene = lr.Scene.from_dict(testing.cornell_box(resolution=(res, res), spp=8, depth=depth))
compiled = lr.compile_scene(scene)
geom = compiled.trace_geometry(compiled.arrays)
tri_table = np.asarray(make_tri_table(geom))
shade = np.asarray(compiled.arrays["trace"]["shade_table"])
P = tri_table.shape[0]
n = res * res
BLK, SUB = fp.BLK, fp.SUB
nb = n // BLK

def trace_only_kernel(ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, tri_r, shade_r, out_o, *, sel_cols, n_bounce):
    tri = tri_r; shade = shade_r
    ox, oy, oz = ox_r[0], oy_r[0], oz_r[0]
    dx, dy, dz = dx_r[0], dy_r[0], dz_r[0]
    zero = jnp.zeros_like(ox)
    acc = zero
    for b in range(n_bounce):
        best_t = zero + 3e38
        cols = [zero for _ in range(sel_cols)]
        hit_u = zero; hit_v = zero
        for j in range(P):
            ok, t, u, v = fp._moller_trumbore_row(tri, j, ox, oy, oz, dx, dy, dz)
            ok &= (t > 0.0) & (t < best_t)
            best_t = jnp.where(ok, t, best_t)
            hit_u = jnp.where(ok, u, hit_u)
            hit_v = jnp.where(ok, v, hit_v)
            for k in range(sel_cols):
                cols[k] = jnp.where(ok, shade[j, k], cols[k])
        # shadow trace (any)
        occ = zero > 1.0
        for j in range(P):
            ok, t, _, _ = fp._moller_trumbore_row(tri, j, oy, oz, ox, dy, dz, dx)
            occ |= ok & (t > 0.0) & (t < best_t)
        acc = acc + best_t + hit_u + sum(cols) + jnp.where(occ, 1.0, 0.0)
        # perturb rays so bounces aren't CSE'd
        dx = dx + 1e-7 * acc * 1e-30
    out_o[0] = acc

spec = pl.BlockSpec((1, SUB, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
tspec = pl.BlockSpec(memory_space=pltpu.VMEM)

key = jax.random.PRNGKey(0)
o = np.asarray([278.0, 273.0, -800.0], np.float32)
d = np.asarray(jax.random.normal(key, (n, 3)), np.float32)
d = d / np.linalg.norm(d, axis=-1, keepdims=True)
comps = [np.broadcast_to(o[i], (nb, SUB, 128)).copy() for i in range(3)] + [
    d[:, i].reshape(nb, SUB, 128) for i in range(3)]
comps = [jnp.asarray(c) for c in comps]
tri_j = jnp.asarray(tri_table); shade_j = jnp.asarray(shade)

def bench(sel_cols, n_bounce, label):
    kern = partial(trace_only_kernel, sel_cols=sel_cols, n_bounce=n_bounce)
    @jax.jit
    def run():
        return pl.pallas_call(kern, grid=(nb,),
            in_specs=[spec]*6 + [tspec]*2, out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((nb, SUB, 128), jnp.float32))(*comps, tri_j, shade_j).sum()
    r = jax.block_until_ready(run())
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); jax.block_until_ready(run()); ts.append(time.perf_counter()-t0)
    print(f"{label:42s} {min(ts)*1e3:7.2f} ms")

bench(0, 5, "trace-only x5 bounces (0 sel cols)")
bench(26, 5, "trace+26-col select x5 bounces")
bench(17, 5, "trace+17-col select x5 bounces")
