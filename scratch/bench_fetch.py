"""Microbench row-fetch strategies at wavefront scale, amortized inside jit."""
import time
import jax, jax.numpy as jnp
from functools import partial

N = 1 << 20
ITERS = 30

def timed(name, make_fn, R, C):
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, R)
    table = jax.random.normal(key, (R, C), jnp.float32)
    fn = make_fn(table)
    @jax.jit
    def run(idx):
        def body(i, acc):
            # vary idx cheaply to defeat CSE/hoisting
            out = fn((idx + i) % R)
            return acc + out.sum()
        return jax.lax.fori_loop(0, ITERS, body, 0.0)
    r = jax.block_until_ready(run(idx))
    t0 = time.perf_counter()
    r = jax.block_until_ready(run(idx))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} R={R:4d} C={C:3d} {dt*1e3:7.3f} ms")
    return dt

def mk_highest(table):
    def f(idx):
        oh = (idx[:, None] == jnp.arange(table.shape[0], dtype=idx.dtype)).astype(jnp.float32)
        return jnp.matmul(oh, table, precision=jax.lax.Precision.HIGHEST)
    return f

def mk_bf16pack(table):
    t0 = table.astype(jnp.bfloat16)
    r1 = table - t0.astype(jnp.float32)
    t1 = r1.astype(jnp.bfloat16)
    r2 = r1 - t1.astype(jnp.float32)
    t2 = r2.astype(jnp.bfloat16)
    packed = jnp.concatenate([t0, t1, t2], axis=1)  # (R, 3C)
    C = table.shape[1]
    def f(idx):
        oh = (idx[:, None] == jnp.arange(table.shape[0], dtype=idx.dtype)).astype(jnp.bfloat16)
        o = jax.lax.dot_general(oh, packed, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return o[:, :C] + o[:, C:2*C] + o[:, 2*C:]
    return f

def mk_gather(table):
    return lambda idx: table[idx]

def mk_select(table):
    R, C = table.shape
    def f(idx):
        out = jnp.zeros((N, C), jnp.float32)
        for i in range(R):
            out = jnp.where((idx == i)[:, None], table[i], out)
        return out
    return f

for R, C in [(32, 16), (32, 45), (8, 16), (128, 16)]:
    timed("one-hot f32 HIGHEST (current)", mk_highest, R, C)
    timed("one-hot bf16 packed x3", mk_bf16pack, R, C)
    timed("gather", mk_gather, R, C)
    if R <= 32:
        timed("select chain", mk_select, R, C)
