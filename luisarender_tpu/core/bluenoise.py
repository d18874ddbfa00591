"""Blue-noise rank textures via void-and-cluster (Ulichney 1993).

TPU-native replacement for the reference's shipped blue-noise table
(/root/reference/src/util/bluenoise.cpp — a 128^2x8 constant array): the
texture is *generated* on the host at first use and disk-cached. Used by the
pmj02bn sampler for spatially blue-noise table selection and
Cranley-Patterson rotations (the "bn" in pmj02bn, samplers/pmj02bn.cpp).

The algorithm operates on a toroidal grid with a Gaussian energy kernel:
 1. seed a random minority pattern, swap-relax it so every "cluster"
    (tightest 1) and "void" (loosest 0) are balanced;
 2. rank phase I: repeatedly remove the tightest cluster pixel, recording
    ranks downward;
 3. rank phase II/III: re-grow from the prototype by always filling the
    largest void, recording ranks upward.
The resulting rank matrix visits pixels in blue-noise order; rank/n^2 is a
uniform [0,1) value per pixel with high-frequency-only spectrum.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

SIGMA = 1.5


def _energy_kernel(n: int) -> np.ndarray:
    """Toroidal Gaussian filter as a (n, n) kernel centered at (0, 0)."""
    ax = np.arange(n, dtype=np.float64)
    d = np.minimum(ax, n - ax)  # toroidal distance per axis
    d2 = d[:, None] ** 2 + d[None, :] ** 2
    return np.exp(-d2 / (2.0 * SIGMA * SIGMA))


class _Field:
    """Binary pattern + incrementally-maintained filtered energy."""

    def __init__(self, n: int):
        self.n = n
        self.kernel = _energy_kernel(n)
        self.energy = np.zeros((n, n), np.float64)
        self.pattern = np.zeros((n, n), bool)

    def set(self, y: int, x: int, value: bool):
        if self.pattern[y, x] == value:
            return
        self.pattern[y, x] = value
        sign = 1.0 if value else -1.0
        self.energy += sign * np.roll(
            np.roll(self.kernel, y, axis=0), x, axis=1
        )

    def tightest_cluster(self):
        e = np.where(self.pattern, self.energy, -np.inf)
        return np.unravel_index(np.argmax(e), e.shape)

    def largest_void(self):
        e = np.where(self.pattern, np.inf, self.energy)
        return np.unravel_index(np.argmin(e), e.shape)


def _prototype(n: int, rng: np.random.RandomState) -> _Field:
    f = _Field(n)
    count = max(n * n // 10, 1)
    flat = rng.choice(n * n, count, replace=False)
    for i in flat:
        f.set(i // n, i % n, True)
    # relax: move tightest cluster into largest void until stable
    for _ in range(n * n):
        cy, cx = f.tightest_cluster()
        f.set(cy, cx, False)
        vy, vx = f.largest_void()
        f.set(vy, vx, True)
        if (vy, vx) == (cy, cx):
            break
    return f


def generate_bluenoise_ranks(n: int = 64, seed: int = 0) -> np.ndarray:
    """(n, n) int32 rank matrix; rank order is blue-noise distributed."""
    rng = np.random.RandomState(seed)
    proto = _prototype(n, rng)
    ones = int(proto.pattern.sum())
    ranks = np.zeros((n, n), np.int32)

    # phase I: unrank the initial minority pixels (remove tightest first)
    f = _Field(n)
    f.pattern = proto.pattern.copy()
    f.energy = proto.energy.copy()
    for rank in range(ones - 1, -1, -1):
        y, x = f.tightest_cluster()
        f.set(y, x, False)
        ranks[y, x] = rank

    # phase II+III: grow from the prototype, filling the largest void
    f = _Field(n)
    f.pattern = proto.pattern.copy()
    f.energy = proto.energy.copy()
    for rank in range(ones, n * n):
        y, x = f.largest_void()
        f.set(y, x, True)
        ranks[y, x] = rank
    return ranks


def bluenoise_texture(n: int = 64, seed: int = 0) -> np.ndarray:
    """(n, n) float32 in [0, 1): blue-noise-ordered uniform values,
    disk-cached (generation is O(n^4) host work, ~seconds at 64)."""
    cache = Path(
        os.environ.get(
            "LUISARENDER_TPU_CACHE", Path.home() / ".cache" / "luisarender_tpu"
        )
    )
    cache.mkdir(parents=True, exist_ok=True)
    path = cache / f"bluenoise_{n}_{seed}.npy"
    if path.exists():
        return np.load(path)
    ranks = generate_bluenoise_ranks(n, seed)
    tex = ((ranks.astype(np.float64) + 0.5) / (n * n)).astype(np.float32)
    np.save(path, tex)
    return tex
