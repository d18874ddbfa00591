"""Medium interface and concrete media (homogeneous, vacuum, null).

TPU-native equivalent of /root/reference/src/base/medium.h:31-216 (event
codes absorb/scatter/null/hit_surface, closure with sigma_a/sigma_s/Le/eta/
phase function, priority-based nesting) and media/homogeneous.cpp:24-85
(closed-form transmittance + channel-stochastic distance sampling).

Media compile to per-type parameter rows like surfaces/lights; the
volumetric integrator dispatches by medium tag (compute-all-and-select —
scenes rarely carry more than a couple of medium types).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.fetch import gather_param_rows
import numpy as np

from ..scene.node import SceneNodeDesc, SceneNodeTag
from ..scene.registry import register
from ..scene.scene import SceneNode

# Medium event codes (medium.h:31-36).
EVENT_ABSORB = 0
EVENT_SCATTER = 1
EVENT_NULL = 2
EVENT_HIT_SURFACE = 3


class Medium(SceneNode):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.priority = desc.int("priority", 0)

    @property
    def is_null(self) -> bool:
        return False

    @property
    def is_vacuum(self) -> bool:
        return False

    def compile(self, compiler) -> dict:
        raise NotImplementedError

    # --- device closure API (batched, spectral) ---
    @staticmethod
    def transmittance(params, ctx, swl, distance, o=None, d=None, seed=None):
        """Tr over a segment of the given length: (..., C). Heterogeneous
        media additionally receive the ray (o, d) and a per-ray uint32 seed
        for their tracking loops."""
        raise NotImplementedError

    @staticmethod
    def sample_distance(
        params, ctx, swl, t_max, u_channel, u_dist, o=None, d=None, seed=None
    ):
        """Sample a scattering distance. Returns dict:
        t (...,), scattered (...,) bool, weight (..., C) — the throughput
        factor (Tr * sigma_s / pdf for scatter, Tr / pdf for surface pass)."""
        raise NotImplementedError


@register(SceneNodeTag.MEDIUM, "vacuum", "Vacuum")
class VacuumMedium(Medium):
    @property
    def is_vacuum(self):
        return True

    def compile(self, compiler) -> dict:
        return {"priority_": np.float32(self.priority)}

    @staticmethod
    def transmittance(params, ctx, swl, distance, o=None, d=None, seed=None):
        return jnp.ones(distance.shape + (swl.dimension,), jnp.float32)

    @staticmethod
    def sample_distance(
        params, ctx, swl, t_max, u_channel, u_dist, o=None, d=None, seed=None
    ):
        shape = t_max.shape
        return {
            "t": t_max,
            "scattered": jnp.zeros(shape, bool),
            "weight": jnp.ones(shape + (swl.dimension,), jnp.float32),
            "g": jnp.zeros(shape, jnp.float32),
        }


@register(SceneNodeTag.MEDIUM, "null", "Null")
class NullMedium(VacuumMedium):
    @property
    def is_null(self):
        return True


@register(SceneNodeTag.MEDIUM, "homogeneous", "Homogeneous")
class HomogeneousMedium(Medium):
    """media/homogeneous.cpp: closed-form Beer-Lambert transmittance +
    channel-stochastic exponential distance sampling."""

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.sigma_a = tuple(desc.float3("sigma_a", (0.0, 0.0, 0.0)))
        self.sigma_s = tuple(desc.float3("sigma_s", (0.0, 0.0, 0.0)))
        self.eta = desc.float("eta", 1.0)
        phase = desc.node("phase")
        if phase is None:
            phase = SceneNodeDesc(
                identifier="$default_phase",
                tag=SceneNodeTag.PHASE_FUNCTION,
                impl_type="henyeygreenstein",
            )
        self.phase = scene.load_phase_function(phase)

    def compile(self, compiler) -> dict:
        row = {
            "sigma_a": np.asarray(self.sigma_a, np.float32),
            "sigma_s": np.asarray(self.sigma_s, np.float32),
            "eta": np.float32(self.eta),
            "priority_": np.float32(self.priority),
        }
        row.update(self.phase.compile(compiler))
        return row

    @staticmethod
    def _sigmas(params, ctx, swl):
        sa = ctx.spectrum.decode_unbounded(params["sigma_a"], swl)
        ss = ctx.spectrum.decode_unbounded(params["sigma_s"], swl)
        return jnp.maximum(sa, 0.0), jnp.maximum(ss, 0.0)

    @staticmethod
    def transmittance(params, ctx, swl, distance, o=None, d=None, seed=None):
        sa, ss = HomogeneousMedium._sigmas(params, ctx, swl)
        sigma_t = sa + ss
        return jnp.exp(-sigma_t * distance[..., None])

    @staticmethod
    def sample_distance(
        params, ctx, swl, t_max, u_channel, u_dist, o=None, d=None, seed=None
    ):
        """Channel-stochastic: pick a spectral channel uniformly, sample an
        exponential distance with its sigma_t, MIS-average the pdfs over
        channels (homogeneous.cpp:44-85)."""
        sa, ss = HomogeneousMedium._sigmas(params, ctx, swl)
        sigma_t = sa + ss  # (..., C)
        c = sigma_t.shape[-1]
        ch = jnp.clip((u_channel * c).astype(jnp.int32), 0, c - 1)
        st_ch = jnp.take_along_axis(sigma_t, ch[..., None], -1)[..., 0]
        # zero-extinction channel -> never scatters
        t = jnp.where(
            st_ch > 1e-9,
            -jnp.log(jnp.maximum(1.0 - u_dist, 1e-38)) / jnp.maximum(st_ch, 1e-9),
            jnp.inf,
        )
        scattered = t < t_max
        t_clamped = jnp.minimum(t, t_max)
        tr = jnp.exp(-sigma_t * t_clamped[..., None])
        # pdf averaged over channel choice
        pdf_scatter = jnp.mean(sigma_t * tr, axis=-1)
        pdf_surface = jnp.mean(tr, axis=-1)
        w_scatter = tr * ss / jnp.maximum(pdf_scatter, 1e-20)[..., None]
        w_surface = tr / jnp.maximum(pdf_surface, 1e-20)[..., None]
        weight = jnp.where(scattered[..., None], w_scatter, w_surface)
        return {
            "t": t_clamped,
            "scattered": scattered,
            "weight": weight,
            "g": jnp.broadcast_to(params["g"], t_max.shape)
            if "g" in params
            else jnp.zeros_like(t_max),
        }


def _gather_rows(params, index):
    return gather_param_rows(params, index)


def dispatch(ctx, medium_tag, medium_index, method, *args, init):
    """Polymorphic medium dispatch by per-ray tag (compute-all + select)."""
    result = init
    for t, cls in enumerate(ctx.plan.medium_types):
        mask = medium_tag == t
        rows = _gather_rows(ctx.arrays["media"][t], medium_index)
        value = getattr(cls, method)(rows, ctx, *args)
        result = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                mask.reshape(mask.shape + (1,) * (new.ndim - mask.ndim)), new, old
            ),
            value,
            result,
        )
    return result
