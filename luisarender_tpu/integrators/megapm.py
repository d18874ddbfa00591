"""SPPM photon mapping.

TPU-native equivalent of /root/reference/src/integrators/megapm.cpp (846
LoC). The reference builds a linked-list hash grid with device atomics
(megapm.cpp:64-120); the TPU-native replacement is *sort-based and
deterministic*:

- photon pass: batched light emission (`sample_le`) + masked random walk;
  every (path, bounce) slot is a potential photon deposit (fixed SoA — no
  queues);
- grid build: quantize photon positions to cells, ARGSORT by cell id, and
  derive per-cell ranges by binary search — the XLA-native analogue of the
  atomic linked list;
- camera pass: walk to the first diffuse-ish hit (through specular via BSDF
  sampling), then gather over the 27 neighboring cells with a fixed per-cell
  photon budget; indirect = gathered / (pi r^2 N_emitted), direct lighting
  via NEE exactly like the path tracer;
- SPPM shared-radius shrink across iterations: r_{i+1}^2 = r_i^2 (i+alpha)/(i+1)
  (the `shared_radius` trick, megapm.cpp:43).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..accel import traverse
from ..core import frame as fr
from ..core import sampling
from ..core import types as ct
from ..core.spectrum import safe_div
from ..scene.geometry import surface_interaction
from ..scene.node import SceneNodeTag
from ..scene.registry import register
from ..surfaces import base as surf_base
from . import common
from .base import ProgressiveIntegrator


@register(SceneNodeTag.INTEGRATOR, "photon", "Photon", "megapm", "MegaPM", "sppm", "SPPM")
class PhotonMapping(ProgressiveIntegrator):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.max_depth = desc.int("depth", 10)
        self.photons_per_iter = desc.int("photons_per_iter", 65536)
        self.photon_depth = desc.int("photon_depth", 5)
        self.initial_radius_scale = desc.float("initial_radius", 0.01)
        self.alpha = desc.float("alpha", 0.7)
        self.grid_res = desc.int("grid_resolution", 64)
        self.cell_budget = desc.int("cell_budget", 32)

    # -------------------- photon pass --------------------
    def _emit_photons(self, compiled, arrays, iteration):
        """Returns photon SoA: p (M,3), power (M,C), wi (M,3), valid (M,)."""
        sampler = self.sampler
        spectrum = compiled.spectrum
        plan = compiled.plan
        n = self.photons_per_iter
        c = plan.spectral_dim
        ctx = compiled.context(arrays)
        geom = compiled.trace_geometry(arrays)

        ids = jnp.arange(n, dtype=jnp.int32)
        state = sampler.start(
            jnp.stack([ids % 8192, ids // 8192], axis=-1),
            iteration + (1 << 20),
        )
        if spectrum.is_fixed:
            swl = spectrum.sample_wavelengths(jnp.zeros((n, 1), jnp.float32))
        else:
            state, u_swl = sampler.generate_1d(state)
            swl = spectrum.sample_wavelengths(u_swl[..., None])

        # pick a light uniformly, then emit
        state, u_pick = sampler.generate_1d(state)
        n_lights = plan.num_lights
        entry_idx = jnp.clip((u_pick * n_lights).astype(jnp.int32), 0, n_lights - 1)
        entries = {k: v[entry_idx] for k, v in arrays["light_entries"].items()}
        inst = arrays["instances"]
        tag = inst["light_tag"][entries["inst"]]
        index = inst["light_index"][entries["inst"]]
        state, u_pos = sampler.generate_2d(state)
        state, u_dir = sampler.generate_2d(state)

        emission = None
        for t, light_cls in enumerate(plan.light_types):
            from ..core.fetch import gather_param_rows

            # ctx.arrays, not raw arrays: light rows gain their hoisted
            # constant-texture columns at context construction
            rows = gather_param_rows(ctx.arrays["lights"][t], index)
            e = light_cls.sample_le(rows, ctx, entries, u_pos, u_dir, swl)
            if emission is None:
                emission = e
            else:
                m = (tag == t)[..., None]
                emission = {
                    k: jnp.where(m if e[k].ndim > 1 else m[..., 0], e[k], emission[k])
                    for k in e
                }
        beta = emission["weight"] * float(n_lights)  # 1/p(light) = n_lights
        ray = ct.make_ray(
            ct.offset_ray_origin(emission["p"], emission["ng"]), emission["wi"]
        )

        depth_total = self.photon_depth
        ph_p = jnp.zeros((depth_total, n, 3), jnp.float32)
        ph_power = jnp.zeros((depth_total, n, c), jnp.float32)
        ph_wi = jnp.zeros((depth_total, n, 3), jnp.float32)
        ph_valid = jnp.zeros((depth_total, n), bool)

        active = jnp.ones((n,), bool)
        # fixed-depth photon walk, depositing at every surface hit
        carry = (ray, beta, active, state, ph_p, ph_power, ph_wi, ph_valid)
        for d in range(depth_total):
            ray, beta, active, state, ph_p, ph_power, ph_wi, ph_valid = carry
            hit = traverse.trace_closest(geom, ray)
            it = surface_interaction(arrays, hit, ray, needs_uv=plan.needs_uv)
            it = it._replace(valid=it.valid & active)
            has_surface = (
                arrays["instances"]["surface_tag"][it.inst] >= 0
            ) & it.valid
            wo = -ray.direction
            # deposit (photons arriving at any real surface; the camera-side
            # gather only happens on diffuse hits which is where it matters)
            ph_p = ph_p.at[d].set(it.p)
            ph_power = ph_power.at[d].set(beta)
            ph_wi = ph_wi.at[d].set(wo)
            ph_valid = ph_valid.at[d].set(has_surface & (d > 0))
            # continue the walk
            state, u_lobe = sampler.generate_1d(state)
            state, u_bsdf = sampler.generate_2d(state)
            state, u_rr = sampler.generate_1d(state)
            ctx2 = compiled.context(arrays)
            s = surf_base.dispatch(
                ctx2,
                it._replace(valid=has_surface),
                "sample",
                swl,
                wo,
                u_lobe,
                u_bsdf,
                init={
                    "f": jnp.zeros((n, c), jnp.float32),
                    "pdf": jnp.zeros((n,), jnp.float32),
                    "wi": jnp.broadcast_to(
                        jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3)
                    ),
                    "event": jnp.zeros((n,), jnp.int32),
                    "eta": jnp.ones((n,), jnp.float32),
                },
            )
            new_ray = ct.spawn_ray(it, s["wi"])
            ray = jax.tree_util.tree_map(
                lambda nr, orr: jnp.where(
                    active.reshape(active.shape + (1,) * (nr.ndim - 1)), nr, orr
                ),
                new_ray,
                ray,
            )
            beta_new = beta * safe_div(s["f"], s["pdf"][..., None])
            beta = jnp.where(active[..., None], beta_new, beta)
            # RR on photon power
            q = jnp.clip(jnp.max(beta, axis=-1) / jnp.maximum(
                jnp.max(ph_power[0], axis=-1), 1e-9), 0.05, 1.0)
            kill = u_rr >= q
            beta = beta * jnp.where(kill, 0.0, 1.0 / q)[..., None]
            active = active & has_surface & (s["pdf"] > 0) & ~kill
            carry = (ray, beta, active, state, ph_p, ph_power, ph_wi, ph_valid)

        _, _, _, _, ph_p, ph_power, ph_wi, ph_valid = carry
        m = depth_total * n
        return (
            ph_p.reshape(m, 3),
            ph_power.reshape(m, c),
            ph_wi.reshape(m, 3),
            ph_valid.reshape(m),
        )

    # -------------------- grid build (sort-based) --------------------
    def _build_grid(self, compiled, arrays, ph_p, ph_valid, radius):
        g = self.grid_res
        wmin = arrays["world_min"]
        wmax = arrays["world_max"]
        ext = jnp.maximum(wmax - wmin, 1e-6)
        cell = jnp.clip(((ph_p - wmin) / ext * g).astype(jnp.int32), 0, g - 1)
        cell_id = (cell[..., 0] * g + cell[..., 1]) * g + cell[..., 2]
        cell_id = jnp.where(ph_valid, cell_id, g * g * g)  # invalid -> last
        order = jnp.argsort(cell_id)
        sorted_cells = cell_id[order]
        # per-cell ranges via searchsorted over the sorted cell ids
        return order, sorted_cells

    # -------------------- camera pass --------------------
    def _camera_pass(
        self, compiled, arrays, camera, pixel_xy, sample_index,
        photons, grid, radius, n_emitted,
    ):
        sampler = self.sampler
        light_sampler = self.light_sampler
        spectrum = compiled.spectrum
        plan = compiled.plan
        ctx = compiled.context(arrays)
        geom = compiled.trace_geometry(arrays)
        n = pixel_xy.shape[0]
        c = plan.spectral_dim
        ph_p, ph_power, ph_wi, ph_valid = photons
        order, sorted_cells = grid
        g = self.grid_res

        state = sampler.start(pixel_xy, sample_index)
        state, u_filter = sampler.generate_pixel_2d(state)
        ray, _, cam_weight = camera.generate_rays(
            pixel_xy, u_filter, jnp.full((n, 2), 0.5, jnp.float32), 0.0
        )
        if spectrum.is_fixed:
            swl = spectrum.sample_wavelengths(jnp.zeros((n, 1), jnp.float32))
        else:
            state, u_swl = sampler.generate_1d(state)
            swl = spectrum.sample_wavelengths(u_swl[..., None])

        beta = jnp.broadcast_to(cam_weight[..., None], (n, c))
        L = jnp.zeros((n, c), jnp.float32)
        active = jnp.ones((n,), bool)
        pdf_bsdf = jnp.full((n,), 1e16, jnp.float32)
        eta_scale = jnp.ones((n,), jnp.float32)
        gathered = jnp.zeros((n,), bool)  # gathered already -> stop

        # fixed small loop: a few bounces to reach the first diffuse surface
        for d in range(min(self.max_depth, 4)):
            hit = traverse.trace_closest(geom, ray)
            it = surface_interaction(arrays, hit, ray, needs_uv=plan.needs_uv)
            it = it._replace(valid=it.valid & active)
            wo = -ray.direction
            if plan.num_lights > 0:
                has_light = arrays["instances"]["light_tag"][it.inst] >= 0
                le = light_sampler.evaluate_hit(ctx, it, ray.origin, swl, 0.0)
                mis_w = sampling.balance_heuristic(pdf_bsdf, le["pdf"])
                L = jnp.where(
                    (active & has_light)[..., None],
                    L + beta * le["L"] * mis_w[..., None],
                    L,
                )
            has_surface = (
                arrays["instances"]["surface_tag"][it.inst] >= 0
            ) & it.valid
            active = active & has_surface

            state, u_sel = sampler.generate_1d(state)
            state, u_light = sampler.generate_2d(state)
            state, u_lobe = sampler.generate_1d(state)
            state, u_bsdf = sampler.generate_2d(state)
            # direct lighting via NEE at every camera vertex
            (
                L, ray2, beta2, pdf2, eta2, shade_ok, _zero, _ev
            ) = common.shade_surface(
                compiled, arrays, light_sampler, it, wo, swl,
                L, ray, beta, pdf_bsdf, eta_scale, active,
                jnp.int32(0), (u_sel, u_light, u_lobe, u_bsdf),
            )
            # gather photons at diffuse-ish hits (roughness > .3 proxy)
            rough = surf_base.dispatch(
                ctx, it, "roughness", init=jnp.ones((n, 2), jnp.float32)
            )
            diffuse_here = active & (jnp.max(rough, -1) > 0.3) & ~gathered
            L = L + jnp.where(
                diffuse_here[..., None],
                self._gather(
                    compiled, arrays, it, wo, swl, beta,
                    photons, grid, radius, n_emitted,
                ),
                0.0,
            )
            gathered = gathered | diffuse_here
            active = active & shade_ok & ~gathered
            ray, beta, pdf_bsdf, eta_scale = ray2, beta2, pdf2, eta2

        return spectrum.srgb(L, swl), jnp.ones((n,), jnp.float32)

    def _gather(
        self, compiled, arrays, it, wo, swl, beta, photons, grid, radius, n_emitted
    ):
        """Density-estimate indirect radiance from the photon map at it.p.

        The gather BSDF is the diffuse albedo/pi (gather points are selected
        to be diffuse-dominant; the reference evaluates the full closure but
        the diffuse term dominates at gather points). The 27-neighborhood x
        per-cell-budget scan is ONE lax.fori_loop body, not an unrolled
        Python loop, to keep the compiled program small."""
        ph_p, ph_power, ph_wi, ph_valid = photons
        order, sorted_cells = grid
        g = self.grid_res
        n = it.p.shape[0]
        c = ph_power.shape[-1]
        ctx = compiled.context(arrays)
        wmin = arrays["world_min"]
        ext = jnp.maximum(arrays["world_max"] - wmin, 1e-6)
        base_cell = jnp.clip(((it.p - wmin) / ext * g).astype(jnp.int32), 0, g - 1)
        albedo = surf_base.dispatch(
            ctx, it, "albedo", swl, init=jnp.zeros((n, c), jnp.float32)
        )
        kd_over_pi = albedo * (1.0 / np.pi)

        r2 = radius * radius
        budget = self.cell_budget
        offsets = jnp.asarray(
            [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
             for dz in (-1, 0, 1)],
            jnp.int32,
        )

        def body(cell_i, total):
            # whole per-cell BUDGET in ONE slot matrix: XLA gathers have a
            # large PER-CALL cost, and the previous per-(cell, k) loop made
            # 27*budget*4 of them per bounce (~8 s/iteration at 128^2); one
            # (n, budget) gather per array per cell is 27*4 calls total
            cc = jnp.clip(base_cell + offsets[cell_i], 0, g - 1)
            cid = (cc[..., 0] * g + cc[..., 1]) * g + cc[..., 2]
            start = jnp.searchsorted(sorted_cells, cid)
            slots = jnp.clip(
                start[:, None] + jnp.arange(budget, dtype=jnp.int32),
                0, order.shape[0] - 1,
            )  # (n, budget)
            in_cell = sorted_cells[slots] == cid[:, None]
            pi = order[slots]
            d2 = jnp.sum((ph_p[pi] - it.p[:, None, :]) ** 2, axis=-1)
            # photon must arrive on the shading side
            front = jnp.sum(ph_wi[pi] * it.ns[:, None, :], axis=-1) > 0.0
            ok = (
                in_cell & ph_valid[pi] & (d2 < r2) & front
                & it.valid[:, None]
            )
            cell_sum = jnp.sum(
                jnp.where(ok[..., None], ph_power[pi], 0.0), axis=1
            )
            return total + beta * kd_over_pi * cell_sum

        total = jax.lax.fori_loop(
            0, 27, body, jnp.zeros((n, c), jnp.float32)
        )
        norm = 1.0 / (np.pi * r2 * n_emitted)
        return total * norm

    # -------------------- driver --------------------
    def _render_one_camera(self, compiled, camera):
        w, h = camera.film.resolution
        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.int32),
            jnp.arange(w, dtype=jnp.int32),
            indexing="ij",
        )
        pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
        film = camera.film
        spp = camera.spp
        arrays = compiled.arrays
        world_diag = float(
            np.linalg.norm(
                np.asarray(arrays["world_max"]) - np.asarray(arrays["world_min"])
            )
        )
        radius = world_diag * self.initial_radius_scale

        # cache the jitted iteration per (scene, camera): a fresh closure
        # per render() call would force a full recompile every call
        cache = getattr(self, "_iter_cache", None)
        if cache is None:
            cache = self._iter_cache = {}
        key = (id(compiled), id(camera))
        iteration = cache.get(key)
        if iteration is None:

            @partial(jax.jit, donate_argnums=(1,))
            def iteration(arrays, accum, i, radius):
                photons = self._emit_photons(compiled, arrays, i)
                grid = self._build_grid(
                    compiled, arrays, photons[0], photons[3], radius
                )
                n_emitted = jnp.float32(self.photons_per_iter)
                rgb, weight = self._camera_pass(
                    compiled, arrays, camera, pixel_xy, i,
                    photons, grid, radius, n_emitted,
                )
                return film.accumulate_image(
                    accum, rgb.reshape(h, w, 3), weight.reshape(h, w)
                )

            cache[key] = iteration

        accum = film.prepare()
        r = radius
        for i in range(spp):
            accum = iteration(arrays, accum, jnp.int32(i), jnp.float32(r))
            # SPPM shared-radius shrink (megapm.cpp:43)
            r = float(np.sqrt(r * r * (i + self.alpha) / (i + 1.0)))
        return film.develop(accum)
