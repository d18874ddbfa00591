"""Low-discrepancy samplers: sobol, padded sobol, zsobol, pmj02bn.

TPU-native equivalents of /root/reference/src/samplers/{sobol,padded_sobol,
zsobol,pmj02bn}.cpp. The reference ships large Sobol direction-number /
PMJ02 tables (util/sobolmatrices.cpp 9249 LoC, util/pmj02tables.h); here:

- the universal first two Sobol dimensions (van der Corput bit reversal and
  the Pascal-matrix dimension, v_j = v_{j-1} ^ (v_{j-1} >> 1)) provide the
  (0,2)-sequence pair; higher dimensions are *padded*: each 2D pair gets an
  independently Owen-scrambled + index-shuffled copy (the PBRT-v4 padded
  design the reference's padded_sobol/zsobol follow — zsobol.cpp:32-82);
- Owen scrambling is the hash-based Laine-Karras nested uniform scramble;
- zsobol additionally derives the sample index from a base-4
  digit-permuted Morton code of (pixel, sample) so neighboring pixels get
  decorrelated but well-stratified index sets (zsobol.cpp:32-82);
- pmj02bn generates its progressive multi-jittered (0,2) tables at first
  use with the Christensen et al. construction (host numpy, disk-cached)
  instead of shipping them.

Sample indices are 32-bit here (the reference emulates 64-bit with uint2,
util/u64.h, to go past 2^30 states; 32 bits cover 2048^2 pixels x 1024 spp).
"""

from __future__ import annotations

import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..scene.node import SceneNodeTag
from ..scene.registry import register
from .base import Sampler

_U32 = jnp.uint32


def _reverse_bits32(x):
    x = x.astype(_U32)
    x = ((x << 16) | (x >> 16)).astype(_U32)
    x = (((x & _U32(0x00FF00FF)) << 8) | ((x & _U32(0xFF00FF00)) >> 8)).astype(_U32)
    x = (((x & _U32(0x0F0F0F0F)) << 4) | ((x & _U32(0xF0F0F0F0)) >> 4)).astype(_U32)
    x = (((x & _U32(0x33333333)) << 2) | ((x & _U32(0xCCCCCCCC)) >> 2)).astype(_U32)
    x = (((x & _U32(0x55555555)) << 1) | ((x & _U32(0xAAAAAAAA)) >> 1)).astype(_U32)
    return x


# Direction vectors for Sobol dimension 1 (Pascal matrix), computed once.
_SOBOL_DIM1 = np.zeros(32, np.uint32)
_v = np.uint32(1 << 31)
for _j in range(32):
    _SOBOL_DIM1[_j] = _v
    _v = np.uint32(_v ^ (_v >> np.uint32(1)))


def sobol_2d(index):
    """First two Sobol dimensions for uint32 indices; returns uint32 pair."""
    index = index.astype(_U32)
    d0 = _reverse_bits32(index)
    # dim 1: XOR of direction vectors at set bits
    dirs = jnp.asarray(_SOBOL_DIM1)
    d1 = jnp.zeros_like(index)
    for j in range(32):
        bit = (index >> _U32(j)) & _U32(1)
        d1 = d1 ^ (bit * dirs[j])
    return d0, d1


def owen_scramble(x, seed):
    """Laine-Karras hash-based nested uniform (Owen) scramble of uint32."""
    x = _reverse_bits32(x)
    x = (x + seed).astype(_U32)
    x = x ^ (x * _U32(0x6C50B47C))
    x = x ^ (x * _U32(0xB82F1E52))
    x = x ^ (x * _U32(0xC7AFE638))
    x = x ^ (x * _U32(0x8D22F6E6))
    return _reverse_bits32(x)


def _u32_to_float(x):
    return rng.uniform_u32_to_float(x)


class _LDSBase(Sampler):
    """Shared state layout: dict(pixel_seed, sample_index, dimension)."""

    def start(self, pixel_xy, sample_index):
        shape = pixel_xy.shape[:-1]
        return {
            "pixel": rng.xxhash32(pixel_xy[..., 0], pixel_xy[..., 1], self.seed),
            "pixel_x": pixel_xy[..., 0].astype(jnp.int32),
            "pixel_y": pixel_xy[..., 1].astype(jnp.int32),
            "sample": jnp.broadcast_to(
                jnp.asarray(sample_index, jnp.int32), shape
            ).astype(jnp.uint32)
            + jnp.zeros(shape, jnp.uint32),
            "dim": jnp.zeros(shape, jnp.uint32),
        }

    def _sample_u32(self, state, dim):
        raise NotImplementedError

    def generate_1d(self, state):
        u = _u32_to_float(self._sample_u32(state, state["dim"]))
        state = {**state, "dim": state["dim"] + 1}
        return state, u

    def generate_2d(self, state):
        u0 = _u32_to_float(self._sample_u32(state, state["dim"]))
        u1 = _u32_to_float(self._sample_u32(state, state["dim"] + 1))
        state = {**state, "dim": state["dim"] + 2}
        return state, jnp.stack([u0, u1], axis=-1)


@register(SceneNodeTag.SAMPLER, "paddedsobol", "PaddedSobol", "padded_sobol")
class PaddedSobolSampler(_LDSBase):
    """Per-dimension-pair Owen-scrambled Sobol (0,2) points with hashed index
    shuffling (samplers/padded_sobol.cpp; see module docstring for the
    high-dimension padding design)."""

    def _sample_u32(self, state, dim):
        pair = dim >> 1
        comp = dim & 1
        # per-(pixel, pair) index shuffle and per-component scramble seeds
        shuffle_seed = rng.xxhash32(state["pixel"], pair, self.seed)
        index = owen_scramble(state["sample"], shuffle_seed)
        d0, d1 = sobol_2d(index)
        v = jnp.where(comp == 0, d0, d1)
        scramble_seed = rng.xxhash32(state["pixel"], pair, comp, self.seed + 1)
        return owen_scramble(v, scramble_seed)


@register(SceneNodeTag.SAMPLER, "sobol", "Sobol")
class SobolMatrixSampler(_LDSBase):
    """True high-dimensional Sobol sampler (samplers/sobol.cpp). Direction
    numbers are GENERATED, not shipped: primitive polynomials over GF(2) are
    enumerated and the direction recurrence evaluated at scene-load time
    (core/sobolgen.py replaces util/sobolmatrices.cpp's 9k-line Joe-Kuo
    table). Per-(pixel, dimension) fast Owen scrambling randomizes the
    sequence (sobol.cpp:40-48); dimensions wrap at NSobolDimensions = 1024
    (sobol.cpp's NSobolDimensions) like the reference. Deviation: the
    reference derives one global sample index per pixel from van der Corput
    matrix pairs (sobol.cpp:67-96); here each pixel consumes the sequence at
    its own sample index under a per-pixel Owen scramble — same per-pixel
    stratification, decorrelated across pixels."""

    N_DIMS = 1024

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        from ..core.sobolgen import sobol_matrices

        self.matrices = jnp.asarray(sobol_matrices(self.N_DIMS))  # (D, 32) u32

    def _sample_u32(self, state, dim):
        dimw = (dim % _U32(self.N_DIMS)).astype(jnp.int32)
        rows = self.matrices[dimw]  # (..., 32) uint32
        index = state["sample"].astype(_U32)
        x = jnp.zeros_like(index)
        for j in range(32):
            bit = (index >> _U32(j)) & _U32(1)
            x = x ^ (bit * rows[..., j])
        seed = rng.xxhash32(state["pixel"], dim, self.seed)
        return owen_scramble(x, seed)


@register(SceneNodeTag.SAMPLER, "zsobol", "ZSobol")
class ZSobolSampler(_LDSBase):
    """Morton-scrambled Owen Sobol (zsobol.cpp:32-82 / PBRT-v4): the sample
    index comes from base-4 digit permutations of the Morton interleave of
    (pixel, sample), giving blue-noise-ish error distribution across pixels."""

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        # log2 bounds are resolved lazily per start() shape; permutation depth
        self.log2_spp = 16

    @staticmethod
    def _morton2(x, y):
        def spread(v):
            v = v.astype(_U32) & _U32(0xFFFF)
            v = (v | (v << 8)) & _U32(0x00FF00FF)
            v = (v | (v << 4)) & _U32(0x0F0F0F0F)
            v = (v | (v << 2)) & _U32(0x33333333)
            v = (v | (v << 1)) & _U32(0x55555555)
            return v

        return (spread(x) << _U32(1)) | spread(y)

    # base-4 digit permutations (the 24 permutations of 4 elements, indexed
    # by a hash per digit position — zsobol.cpp's permutation machinery)
    _PERMS = np.asarray(
        [p for p in __import__("itertools").permutations(range(4))], np.uint32
    )

    def _scrambled_index(self, state, pair):
        # 64-ish bit morton: pixel morton in high bits, sample in low bits
        morton = (self._morton2(
            state["pixel_x"].astype(_U32), state["pixel_y"].astype(_U32)
        ) << _U32(8)) | (state["sample"] & _U32(0xFF))
        perms = jnp.asarray(self._PERMS)
        n_digits = 16
        out = jnp.zeros_like(morton)
        for i in range(n_digits):
            shift = _U32(2 * (n_digits - 1 - i))
            digit = (morton >> shift) & _U32(3)
            p = rng.xxhash32(
                (morton >> (shift + _U32(2))).astype(_U32), pair, self.seed
            ) % 24
            digit = perms[p, digit]
            out = out | (digit << shift)
        return out

    def _sample_u32(self, state, dim):
        pair = dim >> 1
        comp = dim & 1
        index = self._scrambled_index(state, pair)
        d0, d1 = sobol_2d(index)
        v = jnp.where(comp == 0, d0, d1)
        seed = rng.xxhash32(pair, comp, self.seed + 1)
        return owen_scramble(v, seed)


def _np_rev32(x):
    x = x.astype(np.uint32)
    x = ((x << np.uint32(16)) | (x >> np.uint32(16))).astype(np.uint32)
    x = ((x & np.uint32(0x00FF00FF)) << np.uint32(8)) | (
        (x & np.uint32(0xFF00FF00)) >> np.uint32(8)
    )
    x = ((x & np.uint32(0x0F0F0F0F)) << np.uint32(4)) | (
        (x & np.uint32(0xF0F0F0F0)) >> np.uint32(4)
    )
    x = ((x & np.uint32(0x33333333)) << np.uint32(2)) | (
        (x & np.uint32(0xCCCCCCCC)) >> np.uint32(2)
    )
    x = ((x & np.uint32(0x55555555)) << np.uint32(1)) | (
        (x & np.uint32(0xAAAAAAAA)) >> np.uint32(1)
    )
    return x.astype(np.uint32)


def _generate_pmj02(n: int, seed: int, n_candidates: int = 12) -> np.ndarray:
    """Progressive multi-jittered (0,2) table with blue noise — the real
    pmj02bn construction (Christensen et al. 2018; pbrt-v4 ships the result
    as util/pmj02tables.h, we generate it).

    Realization: an Owen scramble is a pair of random binary trees (one flip
    bit per node); a scrambled Sobol (0,2) pair is a pmj02 sequence for ANY
    choice of flip bits. Building the trees *incrementally* — point i only
    ever visits tree nodes whose prefix is determined by its Sobol d-values —
    means every node first visited by point i is a free coin whose setting
    moves point i but no earlier point, and any setting preserves the (0,2)
    property. Blue noise drops out of best-candidate selection over those
    free bits: draw n_candidates assignments, keep the one maximizing the
    toroidal min-distance to all previous points."""
    idx = np.arange(n, dtype=np.uint32)
    d0 = _np_rev32(idx)
    d1 = np.zeros(n, np.uint32)
    for j in range(32):
        bit = (idx >> np.uint32(j)) & np.uint32(1)
        d1 ^= bit * _SOBOL_DIM1[j]

    rs = np.random.RandomState(seed)
    # Tree bookkeeping is only needed down to level k = log2(n): distinct
    # Sobol d-values of an n-point prefix differ within their top-k bits
    # (both generator matrices are nonsingular on k-bit inputs), so below
    # level k every node is visited by exactly one point — those bits are
    # private free coins needing no dict.
    k_lvl = max(int(np.ceil(np.log2(max(n, 2)))), 1)
    low_mask = np.uint64((1 << (32 - k_lvl)) - 1)
    trees = ({}, {})  # (level, prefix) -> flip bit
    pts = np.zeros((n, 2), np.float64)

    def base_and_mask(d, tree):
        """Scramble through fixed tree bits; free (new) bits are left 0 and
        returned as a mask. Candidates are base ^ (random & mask)."""
        d = int(d)
        x = 0
        mask = int(low_mask)
        new = []
        for lvl in range(k_lvl):
            key = (lvl, d >> (32 - lvl))
            flip = tree.get(key)
            pos = 31 - lvl
            if flip is None:
                new.append((key, pos))
                mask |= 1 << pos
                bit = (d >> pos) & 1
            else:
                bit = ((d >> pos) & 1) ^ flip
            x |= bit << pos
        x |= d & int(low_mask)  # low bits pass through; randomized via mask
        return np.uint64(x), np.uint64(mask), new

    for i in range(n):
        x0, mx, new0 = base_and_mask(d0[i], trees[0])
        y0, my, new1 = base_and_mask(d1[i], trees[1])
        nc = 1 if i == 0 else n_candidates
        rx = rs.randint(0, 2**32, size=nc).astype(np.uint64) & mx
        ry = rs.randint(0, 2**32, size=nc).astype(np.uint64) & my
        xs = (x0 ^ rx).astype(np.float64) / 2.0**32
        ys = (y0 ^ ry).astype(np.float64) / 2.0**32
        if i == 0:
            best = 0
        else:
            dx = np.abs(pts[:i, 0][None, :] - xs[:, None])
            dy = np.abs(pts[:i, 1][None, :] - ys[:, None])
            dx = np.minimum(dx, 1.0 - dx)
            dy = np.minimum(dy, 1.0 - dy)
            best = int(np.argmax((dx * dx + dy * dy).min(axis=1)))
        # record the chosen free bits (the XOR flips the ORIGINAL d bit, so
        # the tree flip bit is exactly the chosen random bit)
        for key, pos in new0:
            trees[0][key] = (int(rx[best]) >> pos) & 1
        for key, pos in new1:
            trees[1][key] = (int(ry[best]) >> pos) & 1
        pts[i] = (xs[best], ys[best])
    return pts.astype(np.float32)


@register(SceneNodeTag.SAMPLER, "pmj02bn", "PMJ02BN", "pmj02", "PMJ02")
class PMJ02Sampler(_LDSBase):
    """PMJ02BN table sampler (samplers/pmj02bn.cpp): per-pixel table
    selection and Cranley-Patterson rotations driven by a void-and-cluster
    blue-noise texture (so neighboring pixels get maximally-decorrelated
    error — the "bn" the reference inherits from pbrt-v4's shipped
    tables/textures; both are *generated* here and disk-cached)."""

    N_TABLES = 5
    TABLE_SIZE = 1024
    BN_SIZE = 64

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        cache = Path(
            os.environ.get(
                "LUISARENDER_TPU_CACHE", Path.home() / ".cache" / "luisarender_tpu"
            )
        )
        cache.mkdir(parents=True, exist_ok=True)
        path = cache / f"pmj02bn_{self.N_TABLES}x{self.TABLE_SIZE}.npy"
        if path.exists():
            tables = np.load(path)
        else:
            tables = np.stack(
                [
                    _generate_pmj02(self.TABLE_SIZE, 7919 + i)
                    for i in range(self.N_TABLES)
                ]
            )
            np.save(path, tables)
        self.tables = jnp.asarray(tables)  # (T, N, 2)
        from ..core.bluenoise import bluenoise_texture

        self.bn = jnp.asarray(
            np.stack([bluenoise_texture(self.BN_SIZE, s) for s in range(3)])
        )  # (3, BN, BN): table pick, rotation x, rotation y

    def start(self, pixel_xy, sample_index):
        state = super().start(pixel_xy, sample_index)
        return self._with_bn(state, pixel_xy[..., 0], pixel_xy[..., 1])

    def _with_bn(self, state, x, y):
        """Attach per-pixel blue-noise values (gathered once per sample pass;
        the lookup is loop-invariant in the per-spp loop, so XLA hoists it
        out of the hot bounce loop)."""
        xi = x.astype(jnp.int32) % self.BN_SIZE
        yi = y.astype(jnp.int32) % self.BN_SIZE
        state["bn"] = self.bn[:, yi, xi]  # (3, ...)
        return state

    def _sample_2d_table(self, state, pair):
        bn = state["bn"]
        # toroidally shift the blue-noise value per dimension pair: spatial
        # blue structure is preserved, pairs are decorrelated
        shift = rng.uniform_u32_to_float(
            rng.xxhash32(pair, jnp.uint32(0x9E3779B9), self.seed)
        )
        t = (((bn[0] + shift) % 1.0) * self.N_TABLES).astype(jnp.int32)
        idx = state["sample"] % self.TABLE_SIZE
        pt = self.tables[t, idx]
        rx = (bn[1] + rng.uniform_u32_to_float(
            rng.xxhash32(pair, jnp.uint32(1), self.seed + 1))) % 1.0
        ry = (bn[2] + rng.uniform_u32_to_float(
            rng.xxhash32(pair, jnp.uint32(2), self.seed + 2))) % 1.0
        return jnp.stack(
            [(pt[..., 0] + rx) % 1.0, (pt[..., 1] + ry) % 1.0], axis=-1
        )

    def _sample_u32(self, state, dim):
        pair = dim >> 1
        comp = dim & 1
        pt = self._sample_2d_table(state, pair)
        v = jnp.where(comp == 0, pt[..., 0], pt[..., 1])
        return (v * 4294967296.0).astype(jnp.uint32)


@register(SceneNodeTag.SAMPLER, "tileshared", "TileShared", "tile_shared")
class TileSharedSampler(PMJ02Sampler):
    """Tile-shared variant (samplers/tile_shared.cpp): pixels in a tile share
    the table pick, trading correlation for cache coherence."""

    TILE = 8

    def start(self, pixel_xy, sample_index):
        state = super().start(pixel_xy, sample_index)
        tile_x = pixel_xy[..., 0] // self.TILE
        tile_y = pixel_xy[..., 1] // self.TILE
        state["pixel"] = rng.xxhash32(tile_x, tile_y, self.seed)
        # blue-noise values are shared per tile too (the shared table pick
        # is the point of this sampler)
        return self._with_bn(state, tile_x, tile_y)
