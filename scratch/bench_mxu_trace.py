"""MXU ray-triangle trace prototype: det/u_num/v_num/t_num for ALL triangles
via one (BLK,16)x(16,4P) matmul per ray block, vs the unrolled MT loop.

Checks (a) Mosaic handles the lane->matrix relayout, (b) numerics match,
(c) timing.
"""
import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.ops import fused_path as fp

res = 1024
scene = lr.Scene.from_dict(testing.cornell_box(resolution=(res, res), spp=8, depth=5))
compiled = lr.compile_scene(scene)
tabs = fp._host_tables(compiled)
tri = tabs["tri"]  # (P,16)
P = tri.shape[0]
n = res * res
BLK, SUB = 4096, 32
nb = n // BLK

# --- host coefficient matrix (16, 4P): columns [det, u_num, v_num, t_num] per tri
# feature order: [o0d0,o0d1,o0d2, o1d0,...,o2d2 (9), o0,o1,o2, d0,d1,d2, 1]
eps = np.zeros((3, 3, 3), np.float32)
for a, b, c in ((0, 1, 2), (1, 2, 0), (2, 0, 1)):
    eps[a, b, c] = 1.0
    eps[a, c, b] = -1.0

C = np.zeros((16, 4 * P), np.float32)
for j in range(P):
    v0 = tri[j, 0:3]; e1 = tri[j, 3:6]; e2 = tri[j, 6:9]
    nrm = np.cross(e1, e2)
    # det = -d.n
    C[12:15, 4 * j + 0] = -nrm
    # u_num = eps_mpq o_m d_p e2_q - d.(e2 x v0)
    B = np.einsum("mpq,q->mp", eps, e2)  # coeff on o_m d_p
    C[0:9, 4 * j + 1] = B.reshape(-1)
    C[12:15, 4 * j + 1] = -np.cross(e2, v0)
    # v_num = eps_mpq d_m o_p e1_q - d.(v0 x e1)  -> coeff on o_p d_m
    Bv = np.einsum("mpq,q->pm", eps, e1)  # [o_p, d_m]
    C[0:9, 4 * j + 2] = Bv.reshape(-1)
    C[12:15, 4 * j + 2] = -np.cross(v0, e1)
    # t_num = o.n - v0.n
    C[9:12, 4 * j + 3] = nrm
    C[15, 4 * j + 3] = -np.dot(v0, nrm)

C_j = jnp.asarray(C.T.copy())  # (4P, 16), row 4j+k = [det,u,v,t][k] of tri j
# NOTE: slicing Y[0::4] needs rows ordered det*P then u*P...: reorder so
# Y[0::4] picks det rows: build C_T with layout [det_0..det_{P-1}, ...]? No:
# strided slice 0::4 picks rows 0,4,8... = det of tris 0..P-1 under the
# interleaved order. Keep interleaved; iota below must then be row//... use
# grouped order instead for a clean tri index:
C_g = np.zeros((4 * P, 16), np.float32)
C_g[0 * P:1 * P] = C.T[0::4]
C_g[1 * P:2 * P] = C.T[1::4]
C_g[2 * P:3 * P] = C.T[2::4]
C_g[3 * P:4 * P] = C.T[3::4]
C_j = jnp.asarray(C_g)

def mxu_kernel(ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, coef_r, t_o, s_o, *, n_bounce):
    ox, oy, oz = ox_r[0], oy_r[0], oz_r[0]
    dx, dy, dz = dx_r[0], dy_r[0], dz_r[0]
    acc_t = jnp.zeros_like(ox)
    acc_s = jnp.zeros_like(ox)
    for b in range(n_bounce):
        feats = [ox * dx, ox * dy, ox * dz,
                 oy * dx, oy * dy, oy * dz,
                 oz * dx, oz * dy, oz * dz,
                 ox, oy, oz, dx, dy, dz, jnp.ones_like(ox)]
        # (16, SUB, 128) -> (16, BLK): minor-dims collapse, no relayout
        F = jnp.stack(feats, axis=0).reshape(16, BLK)
        # coef_r is C^T (4P, 16); Y rows = [det,u,v,t] x tris, cols = rays
        Y = jnp.dot(coef_r[...], F, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (4P, BLK)
        det = Y[0 * P:1 * P]    # (P, BLK)
        u_num = Y[1 * P:2 * P]
        v_num = Y[2 * P:3 * P]
        t_num = Y[3 * P:4 * P]
        s = jnp.where(det >= 0.0, 1.0, -1.0)
        adet = jnp.abs(det)
        ok = (adet > 1e-12) & (u_num * s >= 0.0) & (v_num * s >= 0.0) & (
            (u_num + v_num) * s <= adet) & (t_num * s > 0.0)
        t = jnp.where(ok, t_num / jnp.where(adet > 1e-12, det, 1.0), 3e38)
        # key-pack min over triangles (axis 0)
        kb = jax.lax.bitcast_convert_type(jnp.maximum(t, 1e-7), jnp.int32)
        key = (kb & jnp.int32(~63)) | jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        best = jnp.min(key, axis=0)  # (BLK,)
        bt = jax.lax.bitcast_convert_type(best & jnp.int32(~63), jnp.float32)
        bs = (best & 63).astype(jnp.float32)
        acc_t = acc_t + bt.reshape(SUB, 128)
        acc_s = acc_s + bs.reshape(SUB, 128)
        dx = dx + acc_t * 1e-30
    t_o[0] = acc_t
    s_o[0] = acc_s

spec = pl.BlockSpec((1, SUB, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
tspec = pl.BlockSpec(memory_space=pltpu.VMEM)

key = jax.random.PRNGKey(0)
o_np = np.broadcast_to(np.asarray([278.0, 273.0, -800.0], np.float32), (n, 3))
d = np.asarray(jax.random.normal(key, (n, 3)), np.float32)
d = d / np.linalg.norm(d, axis=-1, keepdims=True)
comps = [jnp.asarray(o_np[:, i].reshape(nb, SUB, 128)) for i in range(3)] + [
    jnp.asarray(d[:, i].reshape(nb, SUB, 128)) for i in range(3)]

def bench(n_bounce):
    kern = partial(mxu_kernel, n_bounce=n_bounce)
    @jax.jit
    def run():
        t, s = pl.pallas_call(kern, grid=(nb,),
            in_specs=[spec]*6 + [tspec], out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((nb, SUB, 128), jnp.float32)]*2)(*comps, C_j)
        return t, s
    t, s = jax.block_until_ready(run())
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); jax.block_until_ready(run()); ts.append(time.perf_counter()-t0)
    print(f"MXU trace x{n_bounce}: {min(ts)*1e3:7.2f} ms")
    return np.asarray(t[0]).ravel(), np.asarray(s[0]).ravel()

t_mxu, s_mxu = bench(1)
bench(5)

# reference: MT loop on same rays (XLA brute, same convention)
from luisarender_tpu.accel import traverse
from luisarender_tpu.core.types import Ray
geom = compiled.trace_geometry(compiled.arrays)
ray = Ray(jnp.asarray(o_np), jnp.asarray(d), jnp.zeros(n), jnp.full(n, 3e38))
hit = jax.jit(lambda: traverse.trace_closest(geom, ray))()
t_ref = np.asarray(hit.t)[:BLK]
s_ref = np.asarray(hit.prim)[:BLK]
miss = ~np.isfinite(t_ref)
tm = t_mxu.copy(); tm[tm > 1e37] = np.inf
agree_slot = (s_mxu == s_ref) | (miss & (tm[:len(s_ref)] == np.inf))
print("slot agreement:", agree_slot.mean())
ok = np.isfinite(t_ref)
print("t rel err (hits):", np.nanmax(np.abs(tm[ok] - t_ref[ok]) / t_ref[ok]))
