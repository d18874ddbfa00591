"""Light interface and polymorphic dispatch.

TPU-native equivalent of /root/reference/src/base/light.h:26-79. A light node
compiles to parameter rows per type; the global light list (one entry per
emissive instance, geometry.cpp:149-153) plus flat per-light triangle alias
tables live in the compiled scene (see scene/compiler.py).

Conventions:
- `evaluate` returns radiance L toward p_from and the solid-angle pdf of
  sampling that point from p_from under the light's area strategy (for MIS);
- `sample` picks a point on the light entry and returns L, pdf (solid angle),
  the sampled position and its geometric normal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.fetch import gather_param_rows

from ..scene.scene import SceneNode


class Light(SceneNode):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)

    def compile(self, compiler) -> dict:
        raise NotImplementedError

    @property
    def is_null(self) -> bool:
        return False

    # --- device closure API ---
    @staticmethod
    def evaluate(params, ctx, it_light, p_from, swl):
        raise NotImplementedError

    @staticmethod
    def sample(params, ctx, entry, p_from, u, swl):
        raise NotImplementedError


def _gather_rows(params, index):
    return gather_param_rows(params, index)


def dispatch_evaluate(ctx, it_light, p_from, swl):
    """Polymorphic light evaluation at a hit point on an emissive instance."""
    inst = ctx.arrays["instances"]
    meta = gather_param_rows(
        {"tag": inst["light_tag"], "idx": inst["light_index"]}, it_light.inst
    )
    tag, index = meta["tag"], meta["idx"]
    shape = it_light.p.shape[:-1]
    result = {
        "L": jnp.zeros(shape + (swl.dimension,), jnp.float32),
        "pdf": jnp.zeros(shape, jnp.float32),
    }
    for t, light_cls in enumerate(ctx.plan.light_types):
        mask = it_light.valid & (tag == t)
        rows = _gather_rows(ctx.arrays["lights"][t], index)
        value = light_cls.evaluate(rows, ctx, it_light, p_from, swl)
        result = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                mask.reshape(mask.shape + (1,) * (new.ndim - mask.ndim)), new, old
            ),
            value,
            result,
        )
    return result


def dispatch_sample(ctx, entry_index, p_from, u, swl):
    """Polymorphic light point sampling for a selected light-list entry.

    entry_index: (...,) int32 into the light list.
    """
    entries = ctx.arrays["light_entries"]
    inst_id = entries["inst"][entry_index]
    inst = ctx.arrays["instances"]
    meta = gather_param_rows(
        {"tag": inst["light_tag"], "idx": inst["light_index"]}, inst_id
    )
    tag, index = meta["tag"], meta["idx"]
    shape = p_from.shape[:-1]
    result = {
        "L": jnp.zeros(shape + (swl.dimension,), jnp.float32),
        "pdf": jnp.zeros(shape, jnp.float32),
        "p": jnp.zeros(shape + (3,), jnp.float32),
        "ng": jnp.concatenate(
            [
                jnp.zeros(shape + (2,), jnp.float32),
                jnp.ones(shape + (1,), jnp.float32),
            ],
            axis=-1,
        ),
    }
    entry = {k: v[entry_index] for k, v in entries.items()}
    for t, light_cls in enumerate(ctx.plan.light_types):
        mask = tag == t
        rows = _gather_rows(ctx.arrays["lights"][t], index)
        value = light_cls.sample(rows, ctx, entry, p_from, u, swl)
        result = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                mask.reshape(mask.shape + (1,) * (new.ndim - mask.ndim)), new, old
            ),
            value,
            result,
        )
    return result
