"""Core batched geometric types: Ray, Hit, Interaction.

TPU-native equivalents of /root/reference/src/base/geometry.h:16-27 (Hit) and
base/interaction.h:21-118 (Interaction, spawn_ray with robust offsetting).
Everything is a NamedTuple pytree of SoA jnp arrays with shared leading batch
dims — the reference's AoS DSL structs become struct-of-arrays here so XLA
keeps every field in contiguous vector registers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import frame as fr

INVALID_INSTANCE = jnp.int32(-1)


class Ray(NamedTuple):
    origin: jnp.ndarray  # (..., 3)
    direction: jnp.ndarray  # (..., 3) normalized
    t_min: jnp.ndarray  # (...,)
    t_max: jnp.ndarray  # (...,)

    def at(self, t):
        return self.origin + t[..., None] * self.direction


def make_ray(origin, direction, t_min=0.0, t_max=jnp.inf):
    # t_min/t_max are tied to the origin array (not broadcast constants) so
    # that under shard_map every Ray field is device-varying — loop carries
    # built from rays then pass the varying-manual-axes check.
    zero = jnp.zeros_like(origin[..., 0])
    return Ray(
        origin=origin,
        direction=direction,
        t_min=zero + jnp.asarray(t_min, jnp.float32),
        t_max=zero + jnp.asarray(t_max, jnp.float32),
    )


class Hit(NamedTuple):
    """Closest-hit record (geometry.h Hit{inst, prim, bary})."""

    inst: jnp.ndarray  # (...,) int32, -1 = miss
    prim: jnp.ndarray  # (...,) int32 SORTED primitive slot (accel/traverse.py
    # Hit.prim convention: indexes tri_v0/e1/e2 + the packed shade table)
    bary: jnp.ndarray  # (..., 2)
    t: jnp.ndarray  # (...,)

    @property
    def miss(self):
        return self.inst < 0


def miss_hit(shape):
    return Hit(
        inst=jnp.full(shape, -1, jnp.int32),
        prim=jnp.zeros(shape, jnp.int32),
        bary=jnp.zeros(shape + (2,), jnp.float32),
        t=jnp.full(shape, jnp.inf, jnp.float32),
    )


class Interaction(NamedTuple):
    """Surface interaction with shading attributes (interaction.h:21-113)."""

    valid: jnp.ndarray  # (...,) bool
    inst: jnp.ndarray  # (...,) int32 instance id
    prim: jnp.ndarray  # (...,) int32
    p: jnp.ndarray  # (..., 3) world position
    ng: jnp.ndarray  # (..., 3) geometric normal (world)
    ns: jnp.ndarray  # (..., 3) shading normal (world)
    tangent: jnp.ndarray  # (..., 3) dpdu (world, not necessarily unit)
    uv: jnp.ndarray  # (..., 2)
    prim_area: jnp.ndarray  # (...,) triangle area (world)
    back_facing: jnp.ndarray  # (...,) bool: wo opposite of ng
    # uv-space texture footprint radius from ray-cone tracking (None = no
    # LOD information; textures then sample the base mip level)
    footprint: jnp.ndarray = None

    def shading_frame(self):
        return fr.frame_from_z_and_hint(self.ns, self.tangent)


# Robust ray-origin offsetting ("A Fast and Robust Method for Avoiding
# Self-Intersection", Ray Tracing Gems ch. 6 — same scheme the reference's
# interaction.h:114-118 offsetting uses).
_ORIGIN = 1.0 / 32.0
_FLOAT_SCALE = 1.0 / 65536.0
_INT_SCALE = 256.0


def offset_ray_origin(p, n):
    of_i = (_INT_SCALE * n).astype(jnp.int32)
    p_bits = jnp.asarray(p, jnp.float32).view(jnp.int32)
    p_i = jnp.where(p < 0.0, p_bits - of_i, p_bits + of_i).view(jnp.float32)
    return jnp.where(jnp.abs(p) < _ORIGIN, p + _FLOAT_SCALE * n, p_i)


def spawn_ray(it: Interaction, direction, t_max=jnp.inf):
    """Spawn a ray from a surface point with a robust offset along ±ng."""
    n = jnp.where(fr.dot(it.ng, direction)[..., None] >= 0.0, it.ng, -it.ng)
    origin = offset_ray_origin(it.p, n)
    return make_ray(origin, direction, t_min=0.0, t_max=t_max)


def spawn_ray_to(it: Interaction, target_p, target_ng):
    """Spawn a shadow ray towards a target point, offset at both ends
    (interaction.h spawn_ray_to)."""
    n_from = jnp.where(
        fr.dot(it.ng, target_p - it.p)[..., None] >= 0.0, it.ng, -it.ng
    )
    origin = offset_ray_origin(it.p, n_from)
    n_to = jnp.where(
        fr.dot(target_ng, origin - target_p)[..., None] >= 0.0, target_ng, -target_ng
    )
    end = offset_ray_origin(target_p, n_to)
    d = end - origin
    dist = fr.length(d)
    direction = d / jnp.maximum(dist, 1e-20)[..., None]
    # Shorten slightly so the light surface itself is not re-hit.
    return make_ray(origin, direction, t_min=0.0, t_max=dist * (1.0 - 1e-3))
