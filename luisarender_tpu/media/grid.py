"""Heterogeneous (density-grid) medium with delta/ratio tracking.

TPU-native equivalent of the reference's PBRT-v4-style null-scattering
machinery (/root/reference/src/base/medium.h:140-206 `sampleT_maj` and the
delta-tracking loop of integrators/mega_vpt.cpp:186-212). The density field
is a trilinearly-interpolated 3D grid in world-space bounds; a global
majorant (max density x sigma_t) drives Woodcock delta tracking for distance
sampling and ratio tracking for shadow transmittance — both as fixed-bound
`lax.while_loop`s with hash-derived per-step randoms (no RNG state carried
through the medium interface).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..scene.node import SceneNodeTag
from ..scene.registry import register
from .base import Medium

MAX_TRACKING_STEPS = 256


def _density(params, ctx, p):
    """Trilinear grid density at world positions p (..., 3); 0 outside."""
    grids = ctx.arrays["density_grids"]  # (G, D, H, W)
    dims = ctx.arrays["density_grid_dims"]  # (G, 3) int32 (D, H, W)
    gid = params["grid_id"]
    bmin = params["bounds_min"]
    bmax = params["bounds_max"]
    ext = jnp.maximum(bmax - bmin, 1e-8)
    uvw = (p - bmin) / ext  # (..., 3) in [0,1] inside
    inside = jnp.all((uvw >= 0.0) & (uvw <= 1.0), axis=-1)
    d = dims[gid]  # (..., 3)
    # voxel coords (z-major: grid[g, z, y, x])
    fz = jnp.clip(uvw[..., 2], 0.0, 1.0) * (d[..., 0] - 1)
    fy = jnp.clip(uvw[..., 1], 0.0, 1.0) * (d[..., 1] - 1)
    fx = jnp.clip(uvw[..., 0], 0.0, 1.0) * (d[..., 2] - 1)
    z0 = jnp.floor(fz).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x0 = jnp.floor(fx).astype(jnp.int32)
    z1 = jnp.minimum(z0 + 1, d[..., 0] - 1)
    y1 = jnp.minimum(y0 + 1, d[..., 1] - 1)
    x1 = jnp.minimum(x0 + 1, d[..., 2] - 1)
    wz = (fz - z0)[...]
    wy = (fy - y0)[...]
    wx = (fx - x0)[...]

    def at(z, y, x):
        return grids[gid, z, y, x]

    c00 = at(z0, y0, x0) * (1 - wx) + at(z0, y0, x1) * wx
    c01 = at(z0, y1, x0) * (1 - wx) + at(z0, y1, x1) * wx
    c10 = at(z1, y0, x0) * (1 - wx) + at(z1, y0, x1) * wx
    c11 = at(z1, y1, x0) * (1 - wx) + at(z1, y1, x1) * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    val = c0 * (1 - wz) + c1 * wz
    return jnp.where(inside, val, 0.0)


@register(SceneNodeTag.MEDIUM, "grid", "Grid", "heterogeneous", "Heterogeneous")
class GridMedium(Medium):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.sigma_a = tuple(desc.float3("sigma_a", (0.0, 0.0, 0.0)))
        self.sigma_s = tuple(desc.float3("sigma_s", (1.0, 1.0, 1.0)))
        self.eta = desc.float("eta", 1.0)
        from ..scene.node import SceneNodeDesc

        phase = desc.node("phase")
        if phase is None:
            phase = SceneNodeDesc(
                identifier="$default_phase",
                tag=SceneNodeTag.PHASE_FUNCTION,
                impl_type="henyeygreenstein",
            )
        self.phase = scene.load_phase_function(phase)
        bounds_min = desc.float3("bounds_min", None)
        bounds_max = desc.float3("bounds_max", None)
        if bounds_min is None or bounds_max is None:
            raise ValueError("grid medium requires 'bounds_min'/'bounds_max'")
        self.bounds_min = np.asarray(bounds_min, np.float32)
        self.bounds_max = np.asarray(bounds_max, np.float32)
        density = desc.float_list("density", None)
        file = desc.path("file", None)
        dims = desc.float_list("dimensions", None)
        if density is not None:
            if dims is None or len(dims) != 3:
                raise ValueError(
                    "inline grid density requires 'dimensions' (x, y, z)"
                )
            nx, ny, nz = (int(v) for v in dims)
            self.grid = np.asarray(density, np.float32).reshape(nz, ny, nx)
        elif file is not None:
            self.grid = np.load(file).astype(np.float32)  # (D, H, W)
        else:
            raise ValueError("grid medium requires 'density' or 'file'")
        self.scale = desc.float("scale", 1.0)
        self.grid = np.maximum(self.grid * self.scale, 0.0)

    def compile(self, compiler) -> dict:
        grid_id = compiler.register_density_grid(self.grid)
        row = {
            "sigma_a": np.asarray(self.sigma_a, np.float32),
            "sigma_s": np.asarray(self.sigma_s, np.float32),
            "eta": np.float32(self.eta),
            "priority_": np.float32(self.priority),
            "bounds_min": self.bounds_min,
            "bounds_max": self.bounds_max,
            "grid_id": np.int32(grid_id),
            "majorant_density": np.float32(float(self.grid.max())),
        }
        row.update(self.phase.compile(compiler))
        return row

    # --- device closure ---
    @staticmethod
    def _sigmas(params, ctx, swl):
        sa = ctx.spectrum.decode_unbounded(params["sigma_a"], swl)
        ss = ctx.spectrum.decode_unbounded(params["sigma_s"], swl)
        return jnp.maximum(sa, 0.0), jnp.maximum(ss, 0.0)

    @staticmethod
    def transmittance(params, ctx, swl, distance, o=None, d=None, seed=None):
        """Ratio tracking along o + t*d for t in [0, distance]."""
        if o is None:  # interface fallback (homogeneous-style call)
            sa, ss = GridMedium._sigmas(params, ctx, swl)
            return jnp.exp(-(sa + ss) * distance[..., None])
        sa, ss = GridMedium._sigmas(params, ctx, swl)
        sigma_t = sa + ss  # (..., C)
        maj_sig = jnp.max(sigma_t, axis=-1) * jnp.maximum(
            params["majorant_density"], 1e-8
        )
        c = sigma_t.shape[-1]

        def cond(state):
            step, t, tr, alive = state
            return (step < MAX_TRACKING_STEPS) & jnp.any(alive)

        def body(state):
            step, t, tr, alive = state
            u = rng.uniform_u32_to_float(
                rng.xxhash32(seed, jnp.uint32(step), jnp.uint32(0x7A11))
            )
            dt = -jnp.log(jnp.maximum(1.0 - u, 1e-9)) / jnp.maximum(maj_sig, 1e-8)
            t_new = t + dt
            escaped = t_new >= distance
            p = o + t_new[..., None] * d
            dens = _density(params, ctx, p)
            ratio = 1.0 - dens[..., None] * sigma_t / jnp.maximum(
                maj_sig, 1e-8
            )[..., None]
            tr_new = tr * jnp.clip(ratio, 0.0, 1.0)
            tr = jnp.where((alive & ~escaped)[..., None], tr_new, tr)
            alive = alive & ~escaped
            return step + 1, jnp.where(alive, t_new, t), tr, alive

        zero = jnp.zeros_like(distance)
        init = (
            jnp.int32(0),
            zero,
            jnp.ones(distance.shape + (c,), jnp.float32),
            (maj_sig > 1e-9) & (distance > 0),
        )
        _, _, tr, _ = jax.lax.while_loop(cond, body, init)
        return tr

    @staticmethod
    def sample_distance(
        params, ctx, swl, t_max, u_channel, u_dist, o=None, d=None, seed=None
    ):
        """Woodcock delta tracking; scatter events weighted by local albedo
        (absorption handled by weight, not termination)."""
        sa, ss = GridMedium._sigmas(params, ctx, swl)
        sigma_t = sa + ss
        c = sigma_t.shape[-1]
        shape = t_max.shape
        if o is None:
            return {
                "t": t_max,
                "scattered": jnp.zeros(shape, bool),
                "weight": jnp.ones(shape + (c,), jnp.float32),
                "g": jnp.broadcast_to(params.get("g", jnp.zeros(())), shape),
            }
        maj_sig = jnp.max(sigma_t, axis=-1) * jnp.maximum(
            params["majorant_density"], 1e-8
        )
        # Spectral MIS over channels (the tracking-loop analogue of
        # homogeneous.cpp's channel-stochastic estimator): pick one sampling
        # channel ch per path; at each majorant event decide real/null with
        # that channel's probability p_ch = dens*sigma_t_ch/maj, and carry
        # BOTH the per-channel integrand product f_c and the per-channel path
        # pdf product pdf_c. Final weight_c = f_c / mean_c'(pdf_c') (balance
        # heuristic over the uniform channel choice). This stays bounded even
        # where p_ch -> 1 — unlike single-p null-scattering weights, whose
        # (maj-sig_c)/(maj(1-p)) null factors blow up as p -> 1.
        ch = jnp.clip((u_channel * c).astype(jnp.int32), 0, c - 1)

        def cond(state):
            step, t, f, pdf, alive, scattered = state
            return (step < MAX_TRACKING_STEPS) & jnp.any(alive)

        def body(state):
            step, t, f, pdf, alive, scattered = state
            u1 = rng.uniform_u32_to_float(
                rng.xxhash32(seed, jnp.uint32(step), jnp.uint32(0xD157))
            )
            u2 = rng.uniform_u32_to_float(
                rng.xxhash32(seed, jnp.uint32(step), jnp.uint32(0xC011))
            )
            dt = -jnp.log(jnp.maximum(1.0 - u1, 1e-9)) / jnp.maximum(
                maj_sig, 1e-8
            )
            t_new = t + dt
            escaped = t_new >= t_max
            p = o + t_new[..., None] * d
            dens = _density(params, ctx, p)
            p_c = dens[..., None] * sigma_t / jnp.maximum(maj_sig, 1e-8)[
                ..., None
            ]  # (..., C) per-channel real prob
            p_c = jnp.clip(p_c, 0.0, 1.0)
            p_sel = jnp.take_along_axis(p_c, ch[..., None], -1)[..., 0]
            real = (~escaped) & (u2 < p_sel)
            # integrand factors: null -> (maj - sig_t_c)/maj, real (scatter)
            # -> dens*sigma_s_c/maj; pdf factors: null -> 1-p_c, real -> p_c
            f_null = 1.0 - p_c
            f_real = dens[..., None] * ss / jnp.maximum(maj_sig, 1e-8)[
                ..., None
            ]
            step_f = jnp.where(real[..., None], f_real, f_null)
            step_pdf = jnp.where(real[..., None], p_c, 1.0 - p_c)
            upd = (alive & ~escaped)[..., None]
            f = jnp.where(upd, f * step_f, f)
            pdf = jnp.where(upd, pdf * step_pdf, pdf)
            scattered = scattered | (alive & real)
            t = jnp.where(alive, jnp.minimum(t_new, t_max), t)
            alive = alive & ~escaped & ~real
            return step + 1, t, f, pdf, alive, scattered

        zero = jnp.zeros_like(t_max)
        ones = jnp.ones(shape + (c,), jnp.float32)
        init = (
            jnp.int32(0),
            zero,
            ones,
            ones,
            (maj_sig > 1e-9) & (t_max > 0),
            jnp.zeros(shape, bool),
        )
        _, t, f, pdf, _, scattered = jax.lax.while_loop(cond, body, init)
        weight = f / jnp.maximum(jnp.mean(pdf, axis=-1), 1e-30)[..., None]
        return {
            "t": t,
            "scattered": scattered,
            "weight": weight,
            "g": jnp.broadcast_to(params.get("g", jnp.zeros(())), shape)
            if not hasattr(params.get("g", None), "shape")
            else jnp.broadcast_to(params["g"], shape),
        }
