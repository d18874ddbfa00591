"""Probe: Mosaic support + speed for dot_general((8,896),(8,128), contract
dim0 x dim0) -> (896,128) inside a Pallas TPU kernel, at HIGHEST precision.

This is the core op of the subpacket Woop tracer (round-4 flagship): per
(subpacket=128 rays, cluster=128 tris) the 6 Woop outputs + slot row come
from one K=8 matmul with both operands K-major (avoids any minor-dim-8
layout).
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBN = 128      # rays per subpacket
G = 7           # field groups
COLS = G * 128  # 896


def kernel(coef_ref, f_ref, out_ref, *, n_iter, prec):
    F = f_ref[:]
    acc = jnp.zeros((1, SUBN), jnp.float32)
    for i in range(n_iter):
        Y = jax.lax.dot_general(
            coef_ref[:], F + acc * 1e-30,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (896, 128)
        oz = Y[256:384]
        dz = Y[640:768]
        t = -oz / dz
        u = Y[0:128] + t * Y[384:512]
        v = Y[128:256] + t * Y[512:640]
        slotv = Y[768:896]
        ok = (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t > 0.0) & (slotv >= 0.0)
        key = jnp.where(ok, jax.lax.bitcast_convert_type(t, jnp.int32),
                        jnp.int32(0x7F7FFFFF))
        bt = jnp.min(key, axis=0, keepdims=True)
        mask = key == bt
        sw = jnp.min(jnp.where(mask, slotv, 3e38), axis=0, keepdims=True)
        acc = acc + jax.lax.bitcast_convert_type(bt, jnp.float32) * 1e-6 + sw
    out_ref[:] = acc


def run(n_iter, prec):
    from functools import partial
    coef = jnp.asarray(np.random.randn(8, COLS).astype(np.float32))
    F = jnp.asarray(np.random.randn(8, SUBN).astype(np.float32))
    f = jax.jit(lambda c, f: pl.pallas_call(
        partial(kernel, n_iter=n_iter, prec=prec),
        out_shape=jax.ShapeDtypeStruct((1, SUBN), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(c, f))
    r = jax.block_until_ready(f(coef, F))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(coef, F))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3, np.asarray(r)


for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT):
    try:
        t1, _ = run(8, prec)
        t2, _ = run(64, prec)
        per = (t2 - t1) / 56 * 1e3  # us per iter
        cyc = per * 940  # ~cycles at 940MHz
        print(f"prec={prec}: 8it={t1:.3f}ms 64it={t2:.3f}ms -> {per:.2f} us/cluster (~{cyc:.0f} cyc)")
    except Exception as e:
        print(f"prec={prec}: FAILED: {type(e).__name__}: {str(e)[:300]}")
