"""Sampler interface and the independent (PRNG) sampler.

TPU-native equivalent of /root/reference/src/base/sampler.h:42-48 and
samplers/independent.cpp:57-82. A sampler is scene-static; its per-path state
is a small pytree carried in the integrator's SoA (the analogue of the
reference's save_state/load_state which enables wavefront suspend/resume).
All methods are batched and functional: they return (new_state, u).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import rng
from ..scene.node import SceneNodeTag
from ..scene.registry import register
from ..scene.scene import SceneNode


class Sampler(SceneNode):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.seed = desc.int("seed", 19980810)

    def start(self, pixel_xy, sample_index):
        """pixel_xy: (..., 2) int32; sample_index: scalar or (...,) int32.

        Returns the per-path state pytree."""
        raise NotImplementedError

    def generate_1d(self, state):
        raise NotImplementedError

    def generate_2d(self, state):
        state, u0 = self.generate_1d(state)
        state, u1 = self.generate_1d(state)
        return state, jnp.stack([u0, u1], axis=-1)

    def generate_pixel_2d(self, state):
        """Filter-domain 2D sample (low-discrepancy samplers specialize)."""
        return self.generate_2d(state)


@register(SceneNodeTag.SAMPLER, "independent", "Independent")
class IndependentSampler(Sampler):
    def start(self, pixel_xy, sample_index):
        return rng.seed_pixels(
            pixel_xy[..., 0], pixel_xy[..., 1], sample_index, self.seed
        )

    def generate_1d(self, state):
        return rng.lcg_step(state)
