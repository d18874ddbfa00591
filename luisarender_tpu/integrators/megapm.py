"""SPPM photon mapping.

TPU-native equivalent of /root/reference/src/integrators/megapm.cpp (846
LoC). The reference builds a linked-list hash grid with device atomics
(megapm.cpp:64-120); the TPU-native replacement is *sort-based and
deterministic*:

- photon pass: batched light emission (`sample_le`) + masked random walk;
  every (path, bounce) slot is a potential photon deposit (fixed SoA — no
  queues);
- grid build: quantize photon positions to cells, co-sort the photon SoA by
  cell id with ONE multi-operand `lax.sort` (no argsort-then-gather), cap
  each cell at `cell_budget` photons, and SCATTER the survivors into a dense
  (rows, budget*F) cell-row table plus a dense cell->row index — the
  XLA-native analogue of the atomic linked-list hash grid (megapm.cpp:64-120:
  the reference also bounds the grid by hashing; here the bound is
  `table_rows` occupied cells, overflow cells are dropped deterministically
  in cell-id order);
- camera pass: walk to the first diffuse-ish hit (through specular via BSDF
  sampling), LATCH that gather point, and run ONE fused gather after the
  walk: 27 neighbor cells -> cell rows via a dense index lookup, then a
  single (n*27)-row gather of whole 1.5 KB cell rows (row-gathers at whole-
  cell granularity are bandwidth-bound on TPU; the round-4 searchsorted-
  per-cell loop was 2.3 s/iteration, this is ~20 ms). indirect = gathered /
  (pi r^2 N_emitted), direct lighting via NEE exactly like the path tracer;
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
        # max occupied cells in the dense cell-row table (overflow cells are
        # dropped, like a hash-grid bound); 32k rows x 32 budget x 12 cols
        # f32 = 50 MB — photon SoAs are ~16 MB so this is the dominant
        # footprint, still far under HBM
        self.table_rows = desc.int("table_rows", 32768)

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
        beta0 = beta  # initial emitted power: the RR survival reference
        ray = ct.make_ray(
            ct.offset_ray_origin(emission["p"], emission["ng"]), emission["wi"]
        )

        depth_total = self.photon_depth
        # depth-0 deposits are excluded by construction (direct lighting is
        # NEE's job), so the SoA only carries depth_total-1 slots — every
        # downstream sort/scatter pays per photon ROW (45 ns/row on v5e)
        n_dep = max(depth_total - 1, 1)
        ph_p = jnp.zeros((n_dep, n, 3), jnp.float32)
        ph_power = jnp.zeros((n_dep, n, c), jnp.float32)
        ph_wi = jnp.zeros((n_dep, n, 3), jnp.float32)
        ph_valid = jnp.zeros((n_dep, n), bool)

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
            if d > 0:
                ph_p = ph_p.at[d - 1].set(it.p)
                ph_power = ph_power.at[d - 1].set(beta)
                ph_wi = ph_wi.at[d - 1].set(wo)
                ph_valid = ph_valid.at[d - 1].set(has_surface)
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
                jnp.max(beta0, axis=-1), 1e-9), 0.05, 1.0)
            kill = u_rr >= q
            beta = beta * jnp.where(kill, 0.0, 1.0 / q)[..., None]
            active = active & has_surface & (s["pdf"] > 0) & ~kill
            carry = (ray, beta, active, state, ph_p, ph_power, ph_wi, ph_valid)

        _, _, _, _, ph_p, ph_power, ph_wi, ph_valid = carry
        m = n_dep * n
        return (
            ph_p.reshape(m, 3),
            ph_power.reshape(m, c),
            ph_wi.reshape(m, 3),
            ph_valid.reshape(m),
        )

    # -------------------- grid build (sort + dense scatter) -----------
    def _build_grid(self, compiled, arrays, photons, radius):
        """Dense cell-row photon table.

        Sort-not-gather doctrine: ONE multi-operand `lax.sort` co-sorts the
        whole photon SoA by cell id (~1 ms at 327k — vs argsort + N row
        gathers), ranks are derived with a cummax over run boundaries (no
        searchsorted: measured 136 ns/lookup on TPU, it was the round-4
        hot spot), and the <=budget survivors per cell are scattered once
        into a dense (rows+1, budget*F) table whose rows are WHOLE CELLS.
        Scatters of a few hundred k rows are ~3 ms on v5e (measured,
        scratch/bench_photon_prims.py) — the expensive primitive is many
        small gathers, not one big scatter.

        Returns (cellrow, table): cellrow (g^3+1,) i32 maps cell id -> row
        (-1 = empty), table row r holds budget packed photons
        [px py pz wx wy wz power[c] flag] * budget; row `rows` is all-zero
        (flag 0) and serves as the empty-cell target.
        """
        ph_p, ph_power, ph_wi, ph_valid = photons
        g = self.grid_res
        g3 = g * g * g
        m = ph_p.shape[0]
        c = ph_power.shape[-1]
        budget = self.cell_budget
        rows = self.table_rows
        wmin = arrays["world_min"]
        wmax = arrays["world_max"]
        ext = jnp.maximum(wmax - wmin, 1e-6)
        cell = jnp.clip(((ph_p - wmin) / ext * g).astype(jnp.int32), 0, g - 1)
        cell_id = (cell[..., 0] * g + cell[..., 1]) * g + cell[..., 2]
        cell_id = jnp.where(ph_valid, cell_id, g3)  # invalid -> sentinel

        ops = (cell_id,
               ph_p[:, 0], ph_p[:, 1], ph_p[:, 2],
               ph_wi[:, 0], ph_wi[:, 1], ph_wi[:, 2],
               *(ph_power[:, k] for k in range(c)))
        sc, *pay = jax.lax.sort(ops, num_keys=1, is_stable=False)

        iota = jnp.arange(m, dtype=jnp.int32)
        boundary = jnp.concatenate(
            [jnp.ones((1,), bool), sc[1:] != sc[:-1]]
        )
        run_start = jax.lax.cummax(jnp.where(boundary, iota, 0))
        rank = iota - run_start
        keep = (rank < budget) & (sc < g3)
        # row index = number of distinct kept cells before this one
        newcell = boundary & (sc < g3)
        rowidx = jnp.cumsum(newcell.astype(jnp.int32)) - 1
        ok = keep & (rowidx < rows)

        # dense cell -> row map (writes masked to the sentinel slot g3,
        # which no in-range query cell id ever reads)
        cellrow = jnp.full((g3 + 1,), -1, jnp.int32)
        cellrow = cellrow.at[
            jnp.where(newcell & (rowidx < rows), sc, g3 + 1)
        ].set(rowidx, mode="drop")

        # (a merge-sort placement — two big multi-operand sorts instead of
        # the scatter — was tried here and is far SLOWER: multi-operand
        # sorts at 1.4M elements pay ~440 comparator passes over all
        # operands; the 327k-row scatter at ~45 ns/row wins)
        f = 7 + c  # px py pz wx wy wz power[c] flag
        payload = jnp.stack(pay + [jnp.ones((m,), jnp.float32)], axis=-1)
        slot = jnp.where(ok, rowidx * budget + rank, rows * budget + budget)
        table = jnp.zeros(((rows + 1) * budget, f), jnp.float32)
        table = table.at[slot].set(payload, mode="drop")
        # scatter photon-major (contiguous f-wide rows per photon), then ONE
        # dense transpose to FIELD-major cell rows [f][budget]: the gather
        # consumer then slices each field as a contiguous (.., budget)-lane
        # block with zero relayout (the photon-major layout cost ~35 ms of
        # strided slicing per camera pass)
        table = table.reshape(rows + 1, budget, f).transpose(0, 2, 1)
        return cellrow, table.reshape(rows + 1, f * budget)

    # -------------------- camera pass --------------------
    def _camera_pass(
        self, compiled, arrays, camera, pixel_xy, sample_index,
        grid, radius, n_emitted,
    ):
        sampler = self.sampler
        light_sampler = self.light_sampler
        spectrum = compiled.spectrum
        plan = compiled.plan
        ctx = compiled.context(arrays)
        geom = compiled.trace_geometry(arrays)
        n = pixel_xy.shape[0]
        c = plan.spectral_dim

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
        # latched gather point: position, shading normal, beta*albedo/pi
        gp_p = jnp.zeros((n, 3), jnp.float32)
        gp_ns = jnp.zeros((n, 3), jnp.float32)
        gp_coef = jnp.zeros((n, c), jnp.float32)

        # fixed small loop: a few bounces to reach the first diffuse
        # surface; the photon gather itself runs ONCE after the loop on the
        # latched point (the round-4 form gathered inside every bounce —
        # 4x the cost for identical output)
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
            # latch the gather point at diffuse-ish hits (roughness > .3)
            rough = surf_base.dispatch(
                ctx, it, "roughness", init=jnp.ones((n, 2), jnp.float32)
            )
            diffuse_here = active & (jnp.max(rough, -1) > 0.3) & ~gathered
            albedo = surf_base.dispatch(
                ctx, it, "albedo", swl, init=jnp.zeros((n, c), jnp.float32)
            )
            m3 = diffuse_here[..., None]
            gp_p = jnp.where(m3, it.p, gp_p)
            gp_ns = jnp.where(m3, it.ns, gp_ns)
            gp_coef = jnp.where(m3, beta * albedo * (1.0 / np.pi), gp_coef)
            gathered = gathered | diffuse_here
            active = active & shade_ok & ~gathered
            ray, beta, pdf_bsdf, eta_scale = ray2, beta2, pdf2, eta2

        L = L + self._gather(
            arrays, gp_p, gp_ns, gp_coef, gathered, grid, radius, n_emitted
        )
        return spectrum.srgb(L, swl), jnp.ones((n,), jnp.float32)

    def _gather(self, arrays, gp_p, gp_ns, gp_coef, gp_valid, grid, radius,
                n_emitted):
        """Density-estimate indirect radiance at the latched gather points.

        The gather BSDF is the diffuse albedo/pi (folded into gp_coef at
        latch time; gather points are selected to be diffuse-dominant — the
        reference evaluates the full closure but the diffuse term dominates
        at gather points). The fetch is ONE (n*27)-row gather of whole
        cell rows from the dense photon table: measured on v5e
        (scratch/bench_photon_prims.py), big-row gathers run at ~50 GB/s
        while the previous searchsorted-per-neighbor-cell loop cost
        136 ns/lookup x 27 cells x 4 unrolled bounces (~2.3 s/iteration
        at 128^2)."""
        cellrow, table = grid
        g = self.grid_res
        n = gp_p.shape[0]
        c = gp_coef.shape[-1]
        budget = self.cell_budget
        f = 7 + c
        rows = self.table_rows
        wmin = arrays["world_min"]
        ext = jnp.maximum(arrays["world_max"] - wmin, 1e-6)
        base_cell = jnp.clip(
            ((gp_p - wmin) / ext * g).astype(jnp.int32), 0, g - 1
        )
        r2 = radius * radius
        offsets = jnp.asarray(
            [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
             for dz in (-1, 0, 1)],
            jnp.int32,
        )

        cc = base_cell[:, None, :] + offsets[None]
        # neighbors outside the grid read the empty row (the round-4 code
        # clipped them, aliasing edge cells and double-counting photons at
        # the world-AABB faces)
        in_grid = jnp.all((cc >= 0) & (cc < g), axis=-1)
        cc = jnp.clip(cc, 0, g - 1)
        cid = (cc[..., 0] * g + cc[..., 1]) * g + cc[..., 2]  # (n, 27)
        row = cellrow[cid]  # (n, 27) dense 1-D lookup
        row = jnp.where((row < 0) | ~in_grid, rows, row)  # empty -> zero row
        cells = table[row.reshape(-1)]  # (n*27, f*budget) whole-cell rows
        # field-major rows: ph[:, k, :] is a contiguous (n*27, budget) slice
        ph = cells.reshape(n * 27, f, budget)
        qp = gp_p[:, None, :].repeat(27, 1).reshape(n * 27, 3)
        qn = gp_ns[:, None, :].repeat(27, 1).reshape(n * 27, 3)
        d2 = (
            (ph[:, 0] - qp[:, 0:1]) ** 2
            + (ph[:, 1] - qp[:, 1:2]) ** 2
            + (ph[:, 2] - qp[:, 2:3]) ** 2
        )
        front = (
            ph[:, 3] * qn[:, 0:1] + ph[:, 4] * qn[:, 1:2]
            + ph[:, 5] * qn[:, 2:3]
        ) > 0.0
        ok = (ph[:, 6 + c] > 0.0) & (d2 < r2) & front
        w = jnp.where(ok, 1.0, 0.0)
        total = jnp.stack(
            [jnp.sum(ph[:, 6 + k] * w, axis=-1) for k in range(c)], axis=-1
        ).reshape(n, 27, c).sum(axis=1)
        norm = 1.0 / (np.pi * r2 * n_emitted)
        return jnp.where(
            gp_valid[..., None], gp_coef * total * norm, 0.0
        )

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

        # cache the jitted multi-iteration launch per (scene, camera): a
        # fresh closure per render() call would force a full recompile
        cache = getattr(self, "_iter_cache", None)
        if cache is None:
            cache = self._iter_cache = {}
        key = (id(compiled), id(camera))
        run_block = cache.get(key)
        if run_block is None:

            @partial(jax.jit, static_argnums=(3,), donate_argnums=(1,))
            def run_block(arrays, accum, i0, count, radii):
                # BATCHED SPPM iterations: the shared-radius shrink
                # (megapm.cpp:43) is a closed-form function of the
                # iteration index, so `count` iterations run inside ONE
                # launch with the per-iteration radius read from a
                # precomputed table — no host round trip between
                # iterations (per-call dispatch was ~3 ms of the 35 ms
                # iteration budget)
                def one(k, accum):
                    i = i0 + k
                    radius = radii[i]
                    photons = self._emit_photons(compiled, arrays, i)
                    grid = self._build_grid(
                        compiled, arrays, photons, radius
                    )
                    n_emitted = jnp.float32(self.photons_per_iter)
                    rgb, weight = self._camera_pass(
                        compiled, arrays, camera, pixel_xy, i,
                        grid, radius, n_emitted,
                    )
                    return film.accumulate_image(
                        accum, rgb.reshape(h, w, 3), weight.reshape(h, w)
                    )

                return jax.lax.fori_loop(0, count, one, accum)

            cache[key] = run_block

        # SPPM shared-radius sequence r_i (megapm.cpp:43), precomputed
        radii = np.empty((spp,), np.float32)
        r = radius
        for i in range(spp):
            radii[i] = r
            r = float(np.sqrt(r * r * (i + self.alpha) / (i + 1.0)))
        radii_d = jnp.asarray(radii)

        accum = film.prepare()
        block = 4
        i = 0
        while i < spp:
            n_it = min(block, spp - i)
            accum = run_block(arrays, accum, jnp.int32(i), n_it, radii_d)
            i += n_it
        return film.develop(accum)
