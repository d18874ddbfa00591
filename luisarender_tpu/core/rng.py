"""Stateless, counter-based random number generation.

TPU-native equivalent of the reference's device RNG library
(/root/reference/src/util/rng.h:19-56 — xxhash32, pcg, pcg2d/3d/4d, LCG).
All functions operate on uint32 jnp arrays of any shape; no key threading —
per-path state is a single uint32 carried in the path SoA, exactly like the
reference's `independent` sampler (/root/reference/src/samplers/independent.cpp:57-82).
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32

PRIME32_2 = 2246822519
PRIME32_3 = 3266489917
PRIME32_4 = 668265263
PRIME32_5 = 374761393

# 1/2^32 in float32; multiplying a uint32 by this yields a float in [0, 1).
_INV_U32 = jnp.float32(2.3283064365386963e-10)
# Largest float32 strictly below 1.0 — clamp target so samples stay in [0, 1).
ONE_MINUS_EPSILON = jnp.float32(1.0 - 2.0 ** -24)


def _u32(x):
    return jnp.asarray(x).astype(_U32)


def _rotl(x, r):
    x = _u32(x)
    return (x << _U32(r)) | (x >> _U32(32 - r))


def xxhash32(*words):
    """xxhash32 over 1..4 uint32 words (matches util/rng.cpp behavior class)."""
    words = [_u32(w) for w in words]
    h = _U32(PRIME32_5) + _U32(4 * len(words))
    for w in words:
        h = h + w * _U32(PRIME32_3)
        h = _rotl(h, 17) * _U32(PRIME32_4)
    h = (h ^ (h >> _U32(15))) * _U32(PRIME32_2)
    h = (h ^ (h >> _U32(13))) * _U32(PRIME32_3)
    h = h ^ (h >> _U32(16))
    return h


def pcg(v):
    """PCG output function on a uint32 state (util/rng.h pcg)."""
    v = _u32(v)
    state = v * _U32(747796405) + _U32(2891336453)
    word = ((state >> ((state >> _U32(28)) + _U32(4))) ^ state) * _U32(277803737)
    return (word >> _U32(22)) ^ word


def pcg2d(v0, v1):
    """2D PCG hash; returns a pair of decorrelated uint32 streams."""
    v0, v1 = _u32(v0), _u32(v1)
    v0 = v0 * _U32(1664525) + _U32(1013904223)
    v1 = v1 * _U32(1664525) + _U32(1013904223)
    v0 = v0 + v1 * _U32(1664525)
    v1 = v1 + v0 * _U32(1664525)
    v0 = v0 ^ (v0 >> _U32(16))
    v1 = v1 ^ (v1 >> _U32(16))
    v0 = v0 + v1 * _U32(1664525)
    v1 = v1 + v0 * _U32(1664525)
    v0 = v0 ^ (v0 >> _U32(16))
    v1 = v1 ^ (v1 >> _U32(16))
    return v0, v1


def pcg3d(v0, v1, v2):
    v0, v1, v2 = _u32(v0), _u32(v1), _u32(v2)
    for _ in range(2):
        v0 = v0 * _U32(1664525) + _U32(1013904223)
        v1 = v1 * _U32(1664525) + _U32(1013904223)
        v2 = v2 * _U32(1664525) + _U32(1013904223)
        v0 = v0 + v1 * v2
        v1 = v1 + v2 * v0
        v2 = v2 + v0 * v1
        if _ == 0:
            v0 = v0 ^ (v0 >> _U32(16))
            v1 = v1 ^ (v1 >> _U32(16))
            v2 = v2 ^ (v2 >> _U32(16))
    return v0, v1, v2


def lcg_step(state):
    """One LCG step; returns (new_state, uniform float32 in [0,1)).

    Matches the reference independent sampler's generator
    (samplers/independent.cpp:62-71): state' = state*LCG_A + LCG_C.
    """
    state = _u32(state)
    new_state = state * _U32(0x0019660D) + _U32(0x3C6EF35F)
    u = jnp.minimum(new_state.astype(jnp.float32) * _INV_U32, ONE_MINUS_EPSILON)
    return new_state, u


def seed_pixels(pixel_x, pixel_y, sample_index, seed):
    """Per-(pixel, sample) uint32 RNG state, decorrelated by xxhash.

    Mirrors samplers/independent.cpp:57-60 (xxhash32(sample_index, pixel, seed)).
    """
    return xxhash32(sample_index, pixel_x, pixel_y, seed)


def uniform_u32_to_float(bits):
    return jnp.minimum(_u32(bits).astype(jnp.float32) * _INV_U32, ONE_MINUS_EPSILON)
