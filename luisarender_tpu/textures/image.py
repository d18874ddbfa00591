"""Image texture with atlas-packed storage.

TPU-native equivalent of /root/reference/src/textures/image.cpp:49-197.
There is no bindless texture hardware on TPU, so all image textures in a
scene are shelf-packed into ONE atlas array (H, W, 4) held in HBM; per-row
params carry the atlas rectangle + uv transform + wrap mode, and sampling is
manual bilinear with border clamping inside the rectangle (the gather-based
analogue of `bindless_tex2d.sample`). LDR files are sRGB-decoded to linear at
load (the reference decodes after filtering and calls it an approximation,
image.cpp:139-145; decoding before filtering is the more correct variant).
Full 2x box mip chains are packed alongside the base levels (the reference
declares but STUBS mip generation and LOD selection, image.cpp:166,187-197);
LOD comes from ray-cone footprints (Interaction.footprint, trilinear blend).
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.node import SceneNodeTag
from ..scene.registry import register
from ..utils import imageio
from .base import Texture


@jax.custom_vjp
def _atlas_gather(atlas, yi, xi):
    """One batched texel gather for all four bilinear corners.

    Batching the corners into ONE gather call matters on TPU (each XLA
    gather call on ~1M dynamic indices costs milliseconds, PERF.md).

    The BACKWARD is a swappable scatter-add: the default XLA scatter
    (~48 ms per 1M cotangents on v5e) or, with LR_ONEHOT_SCATTER=1, the
    MXU-shaped sorted-window one-hot matmul (ops/onehot_scatter.py) —
    faster isolated (37 ms) but slower inside the full adjoint (PERF.md
    round 5). A sort + sorted-segment-sum variant measured a WASH in
    round 4 (`indices_are_sorted` buys nothing on TPU)."""
    return atlas[yi, xi]


def _atlas_gather_fwd(atlas, yi, xi):
    return atlas[yi, xi], (yi, xi, atlas.shape)


def _atlas_gather_bwd(res, ct):
    yi, xi, shape = res
    h, w, c = shape
    bins = (yi * w + xi).reshape(-1)
    g = ct.reshape(-1, c)
    # DEFAULT = XLA scatter: the one-hot path wins isolated (37 vs 48 ms
    # per 1M cotangents) but LOSES in the full adjoint (t_b 2074 vs 1698 ms
    # on the 512k-tri textured bench) — its sort+gather prologue doesn't
    # fuse with the upstream VJP the way the plain scatter does. Kept as
    # LR_ONEHOT_SCATTER=1 with its own exactness tests.
    if _os.environ.get("LR_ONEHOT_SCATTER", "0") == "0":
        grad = (
            jnp.zeros((h * w, c), jnp.float32).at[bins].add(g)
            .reshape(h, w, c)
        )
    else:
        from ..ops.onehot_scatter import scatter_add_2d

        grad = scatter_add_2d(h, w, bins, g)
    return grad, None, None


_atlas_gather.defvjp(_atlas_gather_fwd, _atlas_gather_bwd)

WRAP_REPEAT = 0
WRAP_CLAMP = 1
WRAP_MIRROR = 2
_WRAP_MODES = {"repeat": WRAP_REPEAT, "clamp": WRAP_CLAMP, "mirror": WRAP_MIRROR}

_IMAGE_CACHE: dict = {}


@register(SceneNodeTag.TEXTURE, "image", "Image")
class ImageTexture(Texture):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        path = desc.path("file", None)
        if path is None:
            raise ValueError("image texture requires 'file'")
        encoding = desc.string("encoding", None)
        if path not in _IMAGE_CACHE:
            img = imageio.load_image(path)  # linear float32 (H, W, C)
            if img.ndim == 2:
                img = img[..., None]
            if img.shape[-1] < 4:
                pad = np.zeros(img.shape[:2] + (4 - img.shape[-1],), np.float32)
                if img.shape[-1] == 1:
                    img = np.concatenate([img, img, img, pad[..., :1] * 0 + 1], -1)
                else:
                    img = np.concatenate([img, pad], -1)
            img = img[..., :4]
            _IMAGE_CACHE[path] = np.ascontiguousarray(img, np.float32)
        self.image = _IMAGE_CACHE[path]
        if encoding == "gamma":
            gamma = desc.float("gamma", 2.2)
            self.image = np.concatenate(
                [np.power(np.maximum(self.image[..., :3], 0.0), gamma),
                 self.image[..., 3:]], -1)
        self.uv_scale = desc.float2("uv_scale", (1.0, 1.0))
        self.uv_offset = desc.float2("uv_offset", (0.0, 0.0))
        self.wrap = _WRAP_MODES.get(desc.string("wrap", "repeat").lower(), WRAP_REPEAT)
        self.mapping = scene.load_texture_mapping(desc.node("mapping"))
        self.scale = desc.float3("scale", (1.0, 1.0, 1.0))

    @property
    def channels(self):
        return 4

    def rasterize(self):
        """Used by spherical environments (environments/spherical.py)."""
        return self.image[..., :3] * np.asarray(self.scale, np.float32)

    def compile(self, compiler) -> int:
        image_id = compiler.register_atlas_image(self.image)
        from ..texturemappings.impls import TextureMapping

        m_params = (
            self.mapping.params()
            if self.mapping is not None
            else np.asarray([1, 1, 0, 0], np.float32)
        )
        m_type = self.mapping.type_id if self.mapping is not None else 0
        return compiler.register_texture_row(
            ImageTexture,
            {
                "image_id": np.int32(image_id),
                "uv_scale": np.asarray(self.uv_scale, np.float32),
                "uv_offset": np.asarray(self.uv_offset, np.float32),
                "wrap": np.int32(self.wrap),
                "scale": np.asarray(list(self.scale) + [1.0], np.float32),
                "mapping_type": np.int32(m_type),
                "mapping_params": m_params,
            },
        )

    @staticmethod
    def _bilinear(atlas, rect, u, v):
        """Bilinear inside the atlas rect with edge clamping (no bleed)."""
        w = rect[..., 2].astype(jnp.float32)
        h = rect[..., 3].astype(jnp.float32)
        x = u * w - 0.5
        y = v * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]

        def coords(xi, yi):
            xi = jnp.clip(xi, 0, rect[..., 2] - 1) + rect[..., 0]
            yi = jnp.clip(yi, 0, rect[..., 3] - 1) + rect[..., 1]
            return xi, yi

        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        # one batched gather call for all 4 corners (see _atlas_gather)
        xs, ys = zip(
            coords(x0i, y0i), coords(x0i + 1, y0i),
            coords(x0i, y0i + 1), coords(x0i + 1, y0i + 1),
        )
        vals = _atlas_gather(atlas, jnp.stack(ys), jnp.stack(xs))
        return (
            vals[0] * (1 - fx) * (1 - fy)
            + vals[1] * fx * (1 - fy)
            + vals[2] * (1 - fx) * fy
            + vals[3] * fx * fy
        )

    @staticmethod
    def evaluate_rows(ctx, index, it):
        rows = ctx.arrays["textures"]["image"]
        rects = ctx.arrays["texture_atlas_rects"]  # (n_levels, 4) x,y,w,h
        mips = ctx.arrays["texture_atlas_mips"]  # (n_images, 2) offset,count
        atlas = ctx.arrays["texture_atlas"]  # (H, W, 4)
        from ..core.fetch import gather_param_rows

        r = gather_param_rows(rows, index)
        from ..texturemappings.impls import apply_mapping

        uv = apply_mapping(r["mapping_type"], r["mapping_params"], it)
        uv = uv * r["uv_scale"] + r["uv_offset"]
        u, v = uv[..., 0], uv[..., 1]

        def wrap_coord(x, mode):
            rep = x % 1.0
            clp = jnp.clip(x, 0.0, 1.0)
            mir = 1.0 - jnp.abs((x % 2.0) - 1.0)
            return jnp.where(mode == WRAP_REPEAT, rep,
                             jnp.where(mode == WRAP_CLAMP, clp, mir))

        u = wrap_coord(u, r["wrap"])
        v = wrap_coord(v, r["wrap"])

        mip = mips[r["image_id"]]
        base = mip[..., 0]
        n_levels = mip[..., 1]
        base_rect = rects[base]
        if it.footprint is None:
            return (
                ImageTexture._bilinear(atlas, base_rect, u, v) * r["scale"]
            )
        # trilinear mip LOD from the ray-cone uv footprint (the reference
        # stubs LOD selection, image.cpp:166; ray cones are the standard
        # real-time-RT replacement for ray differentials)
        foot_u = it.footprint * jnp.abs(r["uv_scale"][..., 0])
        foot_v = it.footprint * jnp.abs(r["uv_scale"][..., 1])
        texels = jnp.maximum(
            foot_u * base_rect[..., 2].astype(jnp.float32),
            foot_v * base_rect[..., 3].astype(jnp.float32),
        )
        lod = jnp.log2(jnp.maximum(texels, 1e-8))
        lod = jnp.clip(lod, 0.0, n_levels.astype(jnp.float32) - 1.0)
        l0 = jnp.floor(lod).astype(jnp.int32)
        l1 = jnp.minimum(l0 + 1, n_levels - 1)
        fl = (lod - l0.astype(jnp.float32))[..., None]
        v0 = ImageTexture._bilinear(atlas, rects[base + l0], u, v)
        v1 = ImageTexture._bilinear(atlas, rects[base + l1], u, v)
        # gradients flow through the FINER sampled mip only (v1's VJP is
        # cut): atlas-gradient scatters are the measured adjoint wall (~48
        # ms per 1M cotangents x one call per bilinear, PERF.md round 5)
        # and the second mip level doubles them for a blend-weight nuance.
        # The reference's differentiable texture path has no mips AT ALL
        # (image.cpp:166 stubs LOD), so finer-mip-only is strictly closer
        # to reference semantics than full trilinear gradients would be.
        # LR_TEX_GRAD_FULLMIP=1 restores full trilinear gradients.
        if _os.environ.get("LR_TEX_GRAD_FULLMIP", "0") == "0":
            v1 = jax.lax.stop_gradient(v1)
        return (v0 * (1.0 - fl) + v1 * fl) * r["scale"]
