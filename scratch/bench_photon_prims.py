"""Microbench the primitives for the photon camera-pass redesign (round 5).

Question: the current 27-cell gather loop costs ~4 s/iteration at
(16k queries x 32 budget) from a 327k-photon SoA (~70 ns per gathered
row).  Candidate replacements need measured costs for:

  1. row-gather (M,F)[idx] as a function of F (row bytes)
  2. minor-dim gather (F,M)[:, idx]
  3. lax.sort with payload columns at the sizes the sort-merge needs
  4. searchsorted
  5. the windowed one-hot conveyor block (dynamic_slice + 2 bf16 matmuls)
  6. scatter-add accumulation

Run: python - < scratch/bench_photon_prims.py   (cwd = /root/repo)
Slope method per axon-tpu-benchmarking memory: time iters=N1,N2 inside one
jit'd fori_loop, subtract; pull a scalar to host to defeat the RPC cache.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

M = 327_680          # photons
NREQ = 442_368       # 16384 queries x 27 cells
BUDGET = 32

rng = np.random.default_rng(0)


def timed(fn, *args, n1=2, n2=10):
    """Marginal ms per iteration via the slope method."""
    f = jax.jit(fn, static_argnums=(0,))
    float(f(n1, *args))  # compile+warm
    float(f(n2, *args))
    ts = {}
    for n in (n1, n2):
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(n, *args))
            reps.append(time.perf_counter() - t0)
        ts[n] = min(reps)
    return (ts[n2] - ts[n1]) / (n2 - n1) * 1e3


def loopify(body):
    """fn(n, *args) running body n times with a data dependency."""
    def fn(n, *args):
        def step(i, carry):
            return body(i, carry, *args)
        out = jax.lax.fori_loop(0, n, step, jnp.float32(0.0))
        return out
    return fn


# ---- 1. row gather, varying F ----
idx = jnp.asarray(rng.integers(0, M, NREQ).astype(np.int32))
for F in (4, 16, 32, 128):
    tab = jnp.asarray(rng.normal(size=(M, F)).astype(np.float32))

    def body(i, carry, tab, idx):
        g = tab[(idx + i.astype(jnp.int32)) % M]
        return carry + jnp.sum(g[:: 4096, 0])

    ms = timed(loopify(body), tab, idx)
    print(f"row-gather (M,{F})[{NREQ} idx]: {ms:8.2f} ms  "
          f"({ms*1e6/NREQ:6.1f} ns/row, {NREQ*F*4/ms/1e6:8.2f} GB/s)")

# ---- 1b. row gather with SORTED indices ----
sidx = jnp.sort(idx)
tab = jnp.asarray(rng.normal(size=(M, 16)).astype(np.float32))

def body_s(i, carry, tab, sidx):
    g = tab[jnp.minimum(sidx + i.astype(jnp.int32), M - 1)]
    return carry + jnp.sum(g[:: 4096, 0])

ms = timed(loopify(body_s), tab, sidx)
print(f"row-gather sorted idx (M,16): {ms:8.2f} ms ({ms*1e6/NREQ:6.1f} ns/row)")

# ---- 2. minor-dim gather ----
tabT = jnp.asarray(rng.normal(size=(16, M)).astype(np.float32))

def body_t(i, carry, tabT, idx):
    g = tabT[:, (idx + i.astype(jnp.int32)) % M]
    return carry + jnp.sum(g[0, :: 4096])

ms = timed(loopify(body_t), tabT, idx)
print(f"minor-gather (16,M)[:,idx]:  {ms:8.2f} ms ({ms*1e6/NREQ:6.1f} ns/row)")

# ---- 2b. 1-D gather ----
vec = jnp.asarray(rng.normal(size=(M,)).astype(np.float32))

def body_1d(i, carry, vec, idx):
    g = vec[(idx + i.astype(jnp.int32)) % M]
    return carry + jnp.sum(g[:: 4096])

ms = timed(loopify(body_1d), vec, idx)
print(f"1-D gather (M,)[idx]:        {ms:8.2f} ms ({ms*1e6/NREQ:6.1f} ns/el)")

# ---- 3. lax.sort with payloads ----
key = jnp.asarray(rng.integers(0, 262144, M).astype(np.int32))
pay = [jnp.asarray(rng.normal(size=(M,)).astype(np.float32)) for _ in range(12)]

def body_sort(i, carry, key, *pay):
    out = jax.lax.sort((key + i.astype(jnp.int32),) + pay, num_keys=1)
    return carry + out[1][0] + out[3][-1]

ms = timed(loopify(body_sort), key, *pay)
print(f"lax.sort 327k x (1key+12pay): {ms:8.2f} ms")

keyr = jnp.asarray(rng.integers(0, 262144, NREQ).astype(np.int32))
payr = [jnp.asarray(rng.normal(size=(NREQ,)).astype(np.float32)) for _ in range(2)]

def body_sort2(i, carry, keyr, *payr):
    out = jax.lax.sort((keyr + i.astype(jnp.int32),) + payr, num_keys=1)
    return carry + out[1][0] + out[1][-1]

ms = timed(loopify(body_sort2), keyr, *payr)
print(f"lax.sort 442k x (1key+2pay):  {ms:8.2f} ms")

payr6 = [jnp.asarray(rng.normal(size=(NREQ,)).astype(np.float32)) for _ in range(6)]
def body_sort3(i, carry, keyr, *payr6):
    out = jax.lax.sort((keyr + i.astype(jnp.int32),) + payr6, num_keys=1)
    return carry + out[1][0] + out[1][-1]

ms = timed(loopify(body_sort3), keyr, *payr6)
print(f"lax.sort 442k x (1key+6pay):  {ms:8.2f} ms")

# ---- 3b. argsort only ----
def body_argsort(i, carry, keyr):
    o = jnp.argsort(keyr + i.astype(jnp.int32))
    return carry + o[0].astype(jnp.float32)

ms = timed(loopify(body_argsort), keyr)
print(f"argsort 442k:                 {ms:8.2f} ms")

# ---- 4. searchsorted ----
sk = jnp.sort(key)

def body_ss(i, carry, sk, keyr):
    s = jnp.searchsorted(sk, keyr + (i.astype(jnp.int32) % 3))
    return carry + s[0].astype(jnp.float32)

ms = timed(loopify(body_ss), sk, keyr)
print(f"searchsorted 442k in 327k:    {ms:8.2f} ms")

# ---- 5. conveyor block: dynamic_slice + one-hot matmul ----
# stride-aligned table (Rrows, 32*16) f32; B=256 requests/block;
# window = 512 rows; 2 bf16 matmuls reconstruct f32 exactly (hi/lo split).
Rrows = 16384
table = jnp.asarray(rng.normal(size=(Rrows, BUDGET * 16)).astype(np.float32))
starts = jnp.sort(jnp.asarray(rng.integers(0, Rrows - 1, NREQ).astype(np.int32)))
B = 256
W = 512
NBLK = NREQ // B

def conveyor(i, carry, table, starts):
    def blk(b, acc):
        s0 = starts[b * B]
        rows = jax.lax.dynamic_slice(starts, (b * B,), (B,)) - s0
        win = jax.lax.dynamic_slice(
            table, (jnp.minimum(s0, Rrows - W), 0), (W, BUDGET * 16)
        )
        oh = (rows[:, None] == jnp.arange(W)[None, :]).astype(jnp.bfloat16)
        hi = jnp.asarray(win, jnp.bfloat16)
        lo = jnp.asarray(win - hi.astype(jnp.float32), jnp.bfloat16)
        g = (jnp.dot(oh, hi, preferred_element_type=jnp.float32)
             + jnp.dot(oh, lo, preferred_element_type=jnp.float32))
        # pairwise epilogue stand-in: d2 + mask + reduce
        gg = g.reshape(B, BUDGET, 16)
        d2 = jnp.sum((gg[..., :3] - 0.5) ** 2, axis=-1)
        ok = d2 < 0.1
        return acc + jnp.sum(jnp.where(ok[..., None], gg[..., 4:8], 0.0))

    out = jax.lax.fori_loop(0, NBLK, blk, jnp.float32(0.0))
    return carry + out + jnp.float32(i)

ms = timed(loopify(conveyor), table, starts)
print(f"conveyor {NBLK}x(B={B},W={W}): {ms:8.2f} ms "
      f"({ms*1e3/NBLK:6.1f} us/block)")

# ---- 6. scatter-add (n,4) from 442k rows ----
qid = jnp.asarray(rng.integers(0, 16384, NREQ).astype(np.int32))
vals = jnp.asarray(rng.normal(size=(NREQ, 4)).astype(np.float32))

def body_sc(i, carry, qid, vals):
    out = jnp.zeros((16384, 4), jnp.float32).at[
        (qid + i.astype(jnp.int32)) % 16384
    ].add(vals)
    return carry + out[0, 0]

ms = timed(loopify(body_sc), qid, vals)
print(f"scatter-add 442k -> (16k,4):  {ms:8.2f} ms")
print("done")
