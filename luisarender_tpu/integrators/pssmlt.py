"""Primary-sample-space Metropolis light transport (Kelemen-style).

TPU-native equivalent of /root/reference/src/integrators/pssmlt.cpp (727
LoC): device-side chains over the primary sample space, Kelemen small/large
mutations (exp-distributed small steps, sigma 5e-3, p_large 0.3 —
pssmlt.cpp:277-286), bootstrap normalization constant, and splatting of both
current and proposal states.

The reference's lazy per-dimension mutation replay (pssmlt.cpp:107-174)
exists to avoid touching unused dimensions on a GPU; on TPU the whole
primary-sample vector is a dense (chains, D) array and mutating it is one
vector op, so the laziness is unnecessary — the chain state is simply the
vector itself (SURVEY.md §2.C.1 pssmlt entry).

All randomness of the PATH flows from the chain's primary sample vector via
`PSSSampler` (pixel position included: dims 0-1), so the target density is
exactly luminance(Li(u)) as required for MLT correctness; RR decisions also
read from u, keeping the mapping deterministic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..scene.node import SceneNodeTag
from ..scene.registry import register
from .base import Integrator
from .mega_path import path_trace_batch


class PSSSampler:
    """Sampler facade that replays a dense primary-sample matrix u (N, D);
    dimensions beyond D fall back to decorrelated hashes of the chain id."""

    def __init__(self, dims: int):
        self.dims = dims
        self.current_u = None  # (N, D), bound per trace by the integrator
        self.fallback_seed = 0

    def start(self, pixel_xy, sample_index):
        n = pixel_xy.shape[0]
        return {
            "dim": jnp.zeros((n,), jnp.int32),
            "chain": jnp.arange(n, dtype=jnp.uint32),
            "salt": jnp.broadcast_to(
                jnp.asarray(sample_index, jnp.uint32), (n,)
            ),
        }

    def generate_1d(self, state):
        d = state["dim"]
        u_replay = jnp.take_along_axis(
            self.current_u, jnp.clip(d, 0, self.dims - 1)[..., None], axis=-1
        )[..., 0]
        u_hash = rng.uniform_u32_to_float(
            rng.xxhash32(state["chain"], d.astype(jnp.uint32), state["salt"])
        )
        u = jnp.where(d < self.dims, u_replay, u_hash)
        return {**state, "dim": d + 1}, u

    def generate_2d(self, state):
        state, a = self.generate_1d(state)
        state, b = self.generate_1d(state)
        return state, jnp.stack([a, b], axis=-1)

    def generate_pixel_2d(self, state):
        return self.generate_2d(state)


@register(SceneNodeTag.INTEGRATOR, "pssmlt", "PSSMLT", "mlt", "MLT")
class PSSMLT(Integrator):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.max_depth = desc.int("depth", 10)
        self.rr_depth = desc.int("rr_depth", 0)
        self.rr_threshold = desc.float("rr_threshold", 0.95)
        # reference defaults: 256k chains, 1M bootstrap, p_large .3, sigma
        # 5e-3 (pssmlt.cpp:275). The 16k-chain default is a MEASURED
        # deviation (PERF.md round 5): at the same mutation budget on v5e,
        # 16k chains run 1.43 Msamples/s vs 0.50 at the reference's 256k
        # (big pools amortize worse on one chip), and fewer/longer chains
        # also mix better per mutation.
        self.chains = desc.int("chains", 1 << 14)
        self.bootstrap = desc.int("bootstrap", 1 << 16)
        self.p_large = desc.float("p_large", 0.3)
        self.sigma = desc.float("sigma", 5e-3)

    def _dims(self):
        return 4 + 8 * self.max_depth

    def _trace(self, compiled, arrays, camera, sampler, u):
        """Li for primary-sample vectors u (N, D); pixel from dims 0-1."""
        w, h = camera.film.resolution
        px = jnp.clip((u[..., 0] * w).astype(jnp.int32), 0, w - 1)
        py = jnp.clip((u[..., 1] * h).astype(jnp.int32), 0, h - 1)
        pixel_xy = jnp.stack([px, py], axis=-1)
        sampler.current_u = u[..., 2:]
        rgb, _ = path_trace_batch(
            compiled,
            arrays,
            camera,
            sampler,
            self.light_sampler,
            pixel_xy,
            jnp.int32(0),
            max_depth=self.max_depth,
            rr_depth=self.rr_depth,
            rr_threshold=self.rr_threshold,
        )
        lum = 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
        lum = jnp.where(jnp.isfinite(lum), lum, 0.0)
        rgb = jnp.where(jnp.isfinite(rgb), rgb, 0.0)
        return rgb, lum, pixel_xy

    @staticmethod
    def _mutate(u, u_rand, pick_large, sigma):
        """Kelemen mutation: fresh uniform (large) or exp-profile
        perturbation (small, pssmlt.cpp:277-286) of every dimension."""
        # small step: s = sigma * exp(-log(sigma_max/sigma_min) * r) style;
        # use the classic symmetric exponential profile
        r = u_rand
        s1, s2 = 1.0 / 1024.0, 1.0 / 64.0
        dv = s2 * jnp.exp(-jnp.log(s2 / s1) * jnp.abs(2.0 * r - 1.0))
        small = jnp.where(r < 0.5, (u + dv) % 1.0, (u - dv) % 1.0)
        return jnp.where(pick_large[..., None], u_rand, small)

    def render(self, compiled, save: bool = False) -> dict:
        import logging
        import time as _time

        from ..utils import imageio

        log = logging.getLogger("luisarender_tpu")
        results = {}
        for camera in compiled.scene.cameras:
            t0 = _time.time()
            image = self._render_one_camera(compiled, camera)
            image = np.asarray(jax.device_get(image))
            log.info("pssmlt rendered %s in %.2fs", camera.file, _time.time() - t0)
            results[camera.file] = image
            if save:
                imageio.save_image(camera.file, image)
        return results

    def _render_one_camera(self, compiled, camera):
        w, h = camera.film.resolution
        n_pixels = w * h
        dims = self._dims()
        chains = self.chains
        arrays = compiled.arrays
        seed = 0x5EED
        # jitted fns cached per (scene, camera): fresh closures per call
        # would recompile the chains on every render()
        cache = getattr(self, "_fn_cache", None)
        if cache is None:
            cache = self._fn_cache = {}
        ckey = (id(compiled), id(camera))
        if ckey in cache:
            bootstrap_fn, trace0_fn, mutate_step = cache[ckey]
            return self._run_chains(
                compiled, camera, arrays, bootstrap_fn, trace0_fn,
                mutate_step,
            )
        sampler = PSSSampler(dims - 2)

        def uniform_block(key_salt, n, d):
            ids = jnp.arange(n, dtype=jnp.uint32)
            cols = []
            for j in range(d):
                cols.append(
                    rng.uniform_u32_to_float(
                        rng.xxhash32(ids, jnp.uint32(j), jnp.uint32(key_salt))
                    )
                )
            return jnp.stack(cols, axis=-1)

        # --- bootstrap: estimate b = E[lum] and seed the chains ---
        @jax.jit
        def bootstrap_fn(arrays):
            best_u = None
            total = jnp.float32(0.0)
            rounds = max(self.bootstrap // chains, 1)
            b_lums = []
            b_us = []
            for r in range(rounds):
                u = uniform_block(1000 + r, chains, dims)
                _, lum, _ = self._trace(compiled, arrays, camera, sampler, u)
                total = total + jnp.mean(lum)
                b_lums.append(lum)
                b_us.append(u)
            lums = jnp.stack(b_lums)  # (rounds, chains)
            us = jnp.stack(b_us)  # (rounds, chains, dims)
            # per-chain: resample a bootstrap state by luminance (pick max
            # as a cheap importance resample)
            pick = jnp.argmax(lums, axis=0)
            u0 = jnp.take_along_axis(
                us, pick[None, :, None], axis=0
            )[0]
            return total / rounds, u0

        trace0_fn = jax.jit(
            lambda a, u: self._trace(compiled, a, camera, sampler, u)
        )

        # --- chain iterations with splatting ---
        @partial(jax.jit, donate_argnums=(1,))
        def mutate_step(arrays, splat, state, salt):
            u, rgb, lum, pix = state
            u_rand = uniform_block_traced(salt)
            pick_large = (
                rng.uniform_u32_to_float(
                    rng.xxhash32(
                        jnp.arange(chains, dtype=jnp.uint32), salt, jnp.uint32(7)
                    )
                )
                < self.p_large
            )
            u_prop = self._mutate(u, u_rand, pick_large, self.sigma)
            rgb_p, lum_p, pix_p = self._trace(compiled, arrays, camera, sampler, u_prop)
            a = jnp.clip(lum_p / jnp.maximum(lum, 1e-12), 0.0, 1.0)
            u_accept = rng.uniform_u32_to_float(
                rng.xxhash32(jnp.arange(chains, dtype=jnp.uint32), salt, jnp.uint32(13))
            )
            accept = u_accept < a
            # splat both states (Kelemen): weight proposal by a, current by 1-a
            w_prop = a / jnp.maximum(lum_p, 1e-12)
            w_cur = (1.0 - a) / jnp.maximum(lum, 1e-12)
            w_prop = jnp.where(lum_p > 0, w_prop, 0.0)
            w_cur = jnp.where(lum > 0, w_cur, 0.0)
            splat = splat.at[pix_p[..., 1], pix_p[..., 0]].add(
                rgb_p * w_prop[..., None]
            )
            splat = splat.at[pix[..., 1], pix[..., 0]].add(rgb * w_cur[..., None])
            new_u = jnp.where(accept[..., None], u_prop, u)
            new_rgb = jnp.where(accept[..., None], rgb_p, rgb)
            new_lum = jnp.where(accept, lum_p, lum)
            new_pix = jnp.where(accept[..., None], pix_p, pix)
            return splat, (new_u, new_rgb, new_lum, new_pix)

        def uniform_block_traced(salt):
            ids = jnp.arange(chains, dtype=jnp.uint32)
            cols = [
                rng.uniform_u32_to_float(
                    rng.xxhash32(ids, jnp.uint32(j), salt)
                )
                for j in range(dims)
            ]
            return jnp.stack(cols, axis=-1)

        cache[ckey] = (bootstrap_fn, trace0_fn, mutate_step)
        return self._run_chains(
            compiled, camera, arrays, bootstrap_fn, trace0_fn, mutate_step
        )

    def _run_chains(self, compiled, camera, arrays, bootstrap_fn, trace0_fn,
                    mutate_step):
        w, h = camera.film.resolution
        n_pixels = w * h
        chains = self.chains
        b, u = bootstrap_fn(arrays)
        b = float(b)
        if b <= 0.0:
            return jnp.zeros((h, w, 3), jnp.float32)
        rgb0, lum0, pix0 = trace0_fn(arrays, u)
        total_mutations = max((camera.spp * n_pixels) // chains, 1)
        splat = jnp.zeros((h, w, 3), jnp.float32)
        state = (u, rgb0, lum0, pix0)
        for m in range(total_mutations):
            splat, state = mutate_step(
                arrays, splat, state, jnp.uint32(2_000_003 + m)
            )
        # normalization: E_pi[f/lum] * b * n_pixels / samples-per-pixel-avg
        norm = b * n_pixels / (chains * total_mutations)
        return splat * norm
