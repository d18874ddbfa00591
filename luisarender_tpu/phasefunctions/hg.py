"""Henyey-Greenstein phase function.

TPU-native equivalent of /root/reference/src/phasefunctions/
henyey_greenstein.cpp:21-52 and base/phase_function.h:38-41 (p / sample_p /
pdf). Batched over rays; g may vary per ray.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import frame as fr
from ..scene.node import SceneNodeTag
from ..scene.registry import register
from ..scene.scene import SceneNode

INV_4PI = 1.0 / (4.0 * np.pi)


def hg_p(cos_theta, g):
    """HG phase value (= pdf; perfectly importance sampled)."""
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return INV_4PI * (1.0 - g * g) / jnp.maximum(
        denom * jnp.sqrt(jnp.maximum(denom, 1e-8)), 1e-8
    )


def hg_sample(wo, u, g):
    """Sample wi around wo; returns (wi, pdf). wo points AWAY from the
    scattering event (toward the previous vertex), PBRT convention: the
    sampled angle is measured against -wo... following the reference,
    cos_theta is w.r.t. wo for evaluation symmetry."""
    g_safe = jnp.where(jnp.abs(g) < 1e-3, jnp.where(g < 0, -1e-3, 1e-3), g)
    sqr_term = (1.0 - g_safe * g_safe) / (1.0 + g_safe - 2.0 * g_safe * u[..., 0])
    cos_aniso = -(1.0 + g_safe * g_safe - sqr_term * sqr_term) / (2.0 * g_safe)
    cos_iso = 1.0 - 2.0 * u[..., 0]
    cos_theta = jnp.clip(
        jnp.where(jnp.abs(g) < 1e-3, cos_iso, cos_aniso), -1.0, 1.0
    )
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * np.pi * u[..., 1]
    frame = fr.make_frame(wo)
    wi_local = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
    wi = fr.to_world(frame, wi_local)
    return wi, hg_p(cos_theta, g)


class PhaseFunction(SceneNode):
    def compile(self, compiler) -> dict:
        raise NotImplementedError


@register(SceneNodeTag.PHASE_FUNCTION, "henyeygreenstein", "HenyeyGreenstein",
          "henyey_greenstein", "hg", "HG")
class HenyeyGreensteinPhase(PhaseFunction):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.g = desc.float("g", 0.0)

    def compile(self, compiler) -> dict:
        return {"g": np.float32(self.g)}
