"""Film interface and the color film.

TPU-native equivalent of /root/reference/src/base/film.h:15-46 and
films/color.cpp:107-129. The accumulation buffer is an (H, W, 4) float32 array
(RGB sum + effective-sample-count sum) held functionally: `accumulate` returns
a new buffer (XLA turns the per-pixel add into an in-place fused update under
jit; scatter-add is used only when samples are not pixel-ordered, e.g. after
wavefront compaction). Mirrors the reference's atomic float4 accumulation with
relative clamping and NaN rejection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.node import SceneNodeTag
from ..scene.registry import register
from ..scene.scene import SceneNode


class Film(SceneNode):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.resolution = tuple(desc.int2("resolution", (1024, 1024)))

    def prepare(self):
        h, w = self.resolution[1], self.resolution[0]
        return jnp.zeros((h, w, 4), dtype=jnp.float32)

    def accumulate_image(self, accum, radiance, sample_weight):
        raise NotImplementedError

    def develop(self, accum):
        raise NotImplementedError


@register(SceneNodeTag.FILM, "color", "Color")
class ColorFilm(Film):
    """films/color.cpp: clamp + per-channel exposure scale + NaN policy."""

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.clamp = desc.float("clamp", 256.0)
        exposure = desc.float_list("exposure", [0.0])
        if len(exposure) == 1:
            exposure = exposure * 3
        self.exposure = np.asarray(exposure[:3], dtype=np.float32)
        self.warn_nan = desc.bool("warn_nan", False)

    def accumulate_image(self, accum, radiance, sample_weight):
        """radiance: (H, W, 3) linear sRGB for this pass; sample_weight (H, W).

        Pixel-ordered pass: every sample belongs to its own pixel, so this is
        a pure vector add — no scatter (the TPU analogue of the reference's
        per-pixel atomics, which are only needed because GPU warps race).
        """
        finite = jnp.all(jnp.isfinite(radiance), axis=-1, keepdims=True)
        effective_spp = accum[..., 3:4]
        bound = self.clamp * jnp.maximum(effective_spp, 1.0)
        clamped = jnp.clip(radiance, 0.0, bound)
        contrib = jnp.where(finite, clamped * sample_weight[..., None], 0.0)
        count = jnp.where(finite[..., 0], sample_weight, 0.0)
        return accum + jnp.concatenate([contrib, count[..., None]], axis=-1)

    def accumulate_linear(self, accum, start, radiance, sample_weight):
        """Dense add of a contiguous linear-pixel tile (wavefront pixel-pinned
        pools, integrators/wave_path.py): slot i maps to flat pixel start+i,
        so the splat is a static dynamic-update-slice — NO scatter. XLA's TPU
        scatter costs ~18ms for a 1M-lane pool (measured); this is ~0.1ms.

        start: static int; radiance (N, 3); sample_weight (N,).
        """
        h, w = accum.shape[0], accum.shape[1]
        finite = jnp.all(jnp.isfinite(radiance), axis=-1)
        clamped = jnp.clip(radiance, 0.0, self.clamp)
        contrib = jnp.where(
            finite[..., None], clamped * sample_weight[..., None], 0.0
        )
        count = jnp.where(finite, sample_weight, 0.0)
        vals = jnp.concatenate([contrib, count[..., None]], axis=-1)
        n = vals.shape[0]
        flat = accum.reshape(h * w, 4)
        tile = jax.lax.dynamic_slice_in_dim(flat, start, min(n, h * w - start))
        tile = tile + vals[: tile.shape[0]]
        flat = jax.lax.dynamic_update_slice_in_dim(flat, tile, start, axis=0)
        return flat.reshape(h, w, 4)

    def accumulate_scatter(self, accum, pixel_ids, radiance, sample_weight):
        """Scatter-add path for shuffled samples (wavefront compaction).

        pixel_ids: (N, 2) int32 (x, y); radiance (N, 3); sample_weight (N,).
        """
        finite = jnp.all(jnp.isfinite(radiance), axis=-1)
        clamped = jnp.clip(radiance, 0.0, self.clamp)
        contrib = jnp.where(finite[..., None], clamped * sample_weight[..., None], 0.0)
        count = jnp.where(finite, sample_weight, 0.0)
        vals = jnp.concatenate([contrib, count[..., None]], axis=-1)
        # masked lanes (weight 0) are routed OUT OF BOUNDS and dropped by the
        # scatter instead of clipped to pixel 0: a pool-sized wavefront batch
        # funneling every dead lane into one pixel serializes the TPU
        # scatter-add on the duplicate index (measured ~15ms/iteration; with
        # drop the whole splat is ~0.1ms)
        dead = count <= 0.0
        y = jnp.where(dead, -1, jnp.clip(pixel_ids[..., 1], 0, accum.shape[0] - 1))
        x = jnp.where(dead, -1, jnp.clip(pixel_ids[..., 0], 0, accum.shape[1] - 1))
        return accum.at[y, x].add(vals, mode="drop")

    def develop(self, accum):
        """-> (H, W, 3) linear sRGB average with exposure applied."""
        count = jnp.maximum(accum[..., 3:4], 1e-8)
        rgb = accum[..., :3] / count
        scale = jnp.exp2(jnp.asarray(self.exposure))
        return rgb * scale
