"""Priority-based nested-medium tracker with a fixed-capacity SoA stack.

TPU-native equivalent of /root/reference/src/util/medium_tracker.h:30-57
(priority stack of nested media, capacity 32). Batched: each ray carries K
slots of (packed medium ref, priority); the current medium is the live entry
with the highest priority (ties broken by slot order). All operations are
masked vector ops — no dynamic memory.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

CAPACITY = 8
EMPTY = jnp.int32(-1)


class MediumTracker(NamedTuple):
    ref: jnp.ndarray  # (..., K) int32 packed (tag << 16 | index), -1 empty
    priority: jnp.ndarray  # (..., K) float32


def make_tracker(shape, capacity=CAPACITY):
    return MediumTracker(
        ref=jnp.full(shape + (capacity,), -1, jnp.int32),
        priority=jnp.full(shape + (capacity,), -jnp.inf, jnp.float32),
    )


def pack_ref(tag, index):
    return (tag.astype(jnp.int32) << 16) | index.astype(jnp.int32)


def unpack_ref(ref):
    return ref >> 16, ref & 0xFFFF


def current(tracker: MediumTracker):
    """Returns (has_medium (...,), ref (...,)) of the highest-priority entry."""
    live = tracker.ref >= 0
    prio = jnp.where(live, tracker.priority, -jnp.inf)
    best = jnp.argmax(prio, axis=-1)
    has = jnp.any(live, axis=-1)
    ref = jnp.take_along_axis(tracker.ref, best[..., None], -1)[..., 0]
    return has, jnp.where(has, ref, EMPTY)


def enter(tracker: MediumTracker, mask, ref, priority):
    """Insert (ref, priority) into the first empty slot where mask is True."""
    empty = tracker.ref < 0
    first_empty = jnp.cumsum(empty.astype(jnp.int32), axis=-1) == 1
    slot = empty & first_empty & mask[..., None]
    return MediumTracker(
        ref=jnp.where(slot, ref[..., None], tracker.ref),
        priority=jnp.where(slot, priority[..., None], tracker.priority),
    )


def exit_(tracker: MediumTracker, mask, ref):
    """Remove the first entry matching ref where mask is True."""
    match = (tracker.ref == ref[..., None]) & mask[..., None]
    first = jnp.cumsum(match.astype(jnp.int32), axis=-1) == 1
    kill = match & first
    return MediumTracker(
        ref=jnp.where(kill, EMPTY, tracker.ref),
        priority=jnp.where(kill, -jnp.inf, tracker.priority),
    )
