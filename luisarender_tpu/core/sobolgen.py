"""Sobol direction-number generation from first principles.

The reference ships 9,249 lines of precomputed Joe-Kuo direction numbers
(/root/reference/src/util/sobolmatrices.cpp). Those tables are themselves
*derived data*: dimension j of a Sobol sequence needs (a) a primitive
polynomial p_j over GF(2) and (b) odd initial direction numbers m_i < 2^i.
Both are computable:

- primitive polynomials are enumerated by degree: p (odd, degree d) is
  primitive iff the multiplicative order of x in GF(2)[x]/(p) is exactly
  2^d - 1 — checked with square-and-multiply modular exponentiation plus
  the prime divisors of 2^d - 1 (trial-division factored; degrees <= 14
  cover > 2300 dimensions);
- initial direction numbers use a deterministic seeded draw of odd
  m_i < 2^i. Any such choice yields a valid Sobol (t,s)-sequence in base 2
  (every 1D projection is a (0,1)-sequence; tests/test_samplers.py checks
  this for every generated dimension). Joe-Kuo's specific m_i optimize 2D
  projection quality; ours are unoptimized but correct, and the sampler
  layers per-dimension Owen scrambling on top, which randomizes projection
  artifacts anyway.

The (D, 32) uint32 matrix is generated once and disk-cached.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np


def _poly_mulmod(a: int, b: int, p: int, d: int) -> int:
    """(a * b) mod p over GF(2); p has degree d."""
    r = 0
    while b:
        if b & 1:
            r ^= a
        b >>= 1
        a <<= 1
        if a >> d & 1:
            a ^= p
    return r


def _poly_powmod(a: int, e: int, p: int, d: int) -> int:
    r = 1
    while e:
        if e & 1:
            r = _poly_mulmod(r, a, p, d)
        a = _poly_mulmod(a, a, p, d)
        e >>= 1
    return r


def _prime_factors(n: int) -> list:
    out = []
    f = 2
    while f * f <= n:
        if n % f == 0:
            out.append(f)
            while n % f == 0:
                n //= f
        f += 1
    if n > 1:
        out.append(n)
    return out


def _is_primitive(p: int, d: int) -> bool:
    """p: polynomial bits (degree d, bit d set). Primitive iff ord(x) = 2^d-1."""
    m = (1 << d) - 1
    if _poly_powmod(2, m, p, d) != 1:  # x^m must be 1
        return False
    for q in _prime_factors(m):
        if _poly_powmod(2, m // q, p, d) == 1:
            return False
    return True


def primitive_polynomials(count: int) -> list:
    """First `count` primitive polynomials over GF(2) ordered by degree.
    Returned as (degree, coefficient bits a_1..a_{d-1}) pairs — the Sobol
    recurrence form (constant and leading terms are implicitly 1)."""
    out = []
    d = 1
    while len(out) < count:
        # candidates: x^d + (middle bits) + 1 -> bits = 2^d | mid<<1 | 1
        for mid in range(1 << max(d - 1, 0)):
            p = (1 << d) | (mid << 1) | 1
            if d == 1:
                p = 0b11  # x + 1
                if mid > 0:
                    break
            if _is_primitive(p, d):
                out.append((d, mid))
                if len(out) >= count:
                    break
        d += 1
    return out


def sobol_matrices(n_dims: int = 1024, seed: int = 20180813) -> np.ndarray:
    """(n_dims, 32) uint32 direction vectors v_{j,i} (MSB-aligned).

    Dimension 0 is the van der Corput sequence (identity matrix)."""
    cache_dir = Path(
        os.environ.get(
            "LUISARENDER_TPU_CACHE", Path.home() / ".cache" / "luisarender_tpu"
        )
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    cache = cache_dir / f"sobol_matrices_{n_dims}_{seed}.npy"
    if cache.exists():
        m = np.load(cache)
        if m.shape == (n_dims, 32):
            return m

    rs = np.random.RandomState(seed)
    v = np.zeros((n_dims, 32), np.uint64)
    v[0] = 1 << (31 - np.arange(32))  # van der Corput
    polys = primitive_polynomials(n_dims - 1)
    for j, (d, a) in enumerate(polys, start=1):
        # initial direction numbers: odd m_i < 2^i (deterministic draw)
        m = np.zeros(d + 1, np.uint64)
        for i in range(1, d + 1):
            m[i] = 2 * rs.randint(0, 1 << (i - 1)) + 1 if i > 1 else 1
        vs = np.zeros(33, np.uint64)
        for i in range(1, min(d, 32) + 1):
            vs[i] = m[i] << (32 - i)
        for i in range(d + 1, 33):
            val = vs[i - d] ^ (vs[i - d] >> np.uint64(d))
            for k in range(1, d):
                if (a >> (d - 1 - k)) & 1:
                    val ^= vs[i - k]
            vs[i] = val
        v[j] = vs[1:33]
    out = v.astype(np.uint32)
    np.save(cache, out)
    return out
