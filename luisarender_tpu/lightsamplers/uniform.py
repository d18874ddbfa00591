"""Uniform light sampler with configurable env-vs-area-light split.

TPU-native equivalent of /root/reference/src/lightsamplers/uniform.cpp:50-162
and base/light_sampler.h:22-101: Selection{tag, prob} with the environment as
a pseudo-light (tag ~0u), uniform pick among area lights, and MIS-compatible
pdfs that include the selection probability.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..lights import base as light_base
from ..scene.node import SceneNodeTag
from ..scene.registry import register
from ..scene.scene import SceneNode


class LightSampler(SceneNode):
    pass


@register(SceneNodeTag.LIGHT_SAMPLER, "uniform", "Uniform")
class UniformLightSampler(LightSampler):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.env_prob = desc.float("environment_probability", 0.5)

    # --- device-side (ctx built by the integrator) ---
    def _selection_probs(self, ctx):
        n_lights = ctx.plan.num_lights
        has_env = ctx.plan.has_environment
        if has_env and n_lights > 0:
            p_env = min(max(self.env_prob, 0.0), 1.0)
        elif has_env:
            p_env = 1.0
        else:
            p_env = 0.0
        p_light = (1.0 - p_env) / max(n_lights, 1)
        return p_env, p_light

    def sample(self, ctx, it, u_sel, u_surface, swl, time=0.0):
        """NEE sample toward a light or the environment. Returns dict with
        L, pdf (solid angle, incl. selection), p (target), ng (target normal),
        is_env mask."""
        p_env, p_light = self._selection_probs(ctx)
        n_lights = ctx.plan.num_lights
        shape = it.p.shape[:-1]

        result = {
            "L": jnp.zeros(shape + (swl.dimension,), jnp.float32),
            "pdf": jnp.zeros(shape, jnp.float32),
            "p": it.p,
            "ng": it.ng,
            "wi": it.ng,
            "is_env": jnp.zeros(shape, bool),
        }
        if n_lights > 0:
            # map u in [p_env, 1) uniformly to light entries
            u_rel = jnp.clip(
                (u_sel - p_env) / max(1.0 - p_env, 1e-8), 0.0, 1.0 - 2.0 ** -24
            )
            entry = jnp.clip(
                (u_rel * n_lights).astype(jnp.int32), 0, n_lights - 1
            )
            s = light_base.dispatch_sample(ctx, entry, it.p, u_surface, swl)
            pick_light = u_sel >= p_env
            wi = s["p"] - it.p
            wi = wi / jnp.maximum(
                jnp.sqrt(jnp.sum(wi * wi, axis=-1, keepdims=True)), 1e-12
            )
            result["L"] = jnp.where(pick_light[..., None], s["L"], result["L"])
            # selection prob of a specific entry is p_light = (1-p_env)/n
            result["pdf"] = jnp.where(pick_light, s["pdf"] * p_light, result["pdf"])
            result["p"] = jnp.where(pick_light[..., None], s["p"], result["p"])
            result["ng"] = jnp.where(pick_light[..., None], s["ng"], result["ng"])
            result["wi"] = jnp.where(pick_light[..., None], wi, result["wi"])
        if ctx.plan.has_environment:
            env = ctx.environment.sample(ctx, it.p, u_surface, swl)
            pick_env = u_sel < p_env
            result["L"] = jnp.where(pick_env[..., None], env["L"], result["L"])
            result["pdf"] = jnp.where(pick_env, env["pdf"] * p_env, result["pdf"])
            far = it.p + env["wi"] * ctx.plan.env_distance
            result["p"] = jnp.where(pick_env[..., None], far, result["p"])
            result["ng"] = jnp.where(pick_env[..., None], -env["wi"], result["ng"])
            result["wi"] = jnp.where(pick_env[..., None], env["wi"], result["wi"])
            result["is_env"] = pick_env
        return result

    def evaluate_hit(self, ctx, it_light, p_from, swl, time=0.0):
        """Radiance + MIS pdf when a path ray hits an emissive instance."""
        p_env, p_light = self._selection_probs(ctx)
        ev = light_base.dispatch_evaluate(ctx, it_light, p_from, swl)
        return {"L": ev["L"], "pdf": ev["pdf"] * p_light}

    def evaluate_miss(self, ctx, direction, swl, time=0.0):
        """Environment radiance + MIS pdf for escaped rays."""
        p_env, _ = self._selection_probs(ctx)
        ev = ctx.environment.evaluate(ctx, direction, swl)
        return {"L": ev["L"], "pdf": ev["pdf"] * p_env}
