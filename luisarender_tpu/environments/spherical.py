"""Spherical (lat-long) HDR environment map with alias-table importance
sampling.

TPU-native equivalent of /root/reference/src/environments/spherical.cpp:
- the radiance texture is rasterized to a grid at compile time (the reference
  generates a 2048x1024 *scale map* on device, :144-180; here the full
  radiance grid is the device asset and doubles as the evaluation source);
- per-texel weights = gaussian-blurred luminance x sin(theta) with optional
  MIS compensation (subtract mean, clamp at 0, :188-193);
- marginal + conditional alias tables (:194-222) via core.sampling's 2D
  build; directional pdf = p_texel * w * h / (2 pi^2 sin(theta)) (:75-79);
- constant-color maps short-circuit to uniform-sphere sampling (:116-121);
- equal-angle lat-long parameterization (:42-57).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import frame as fr
from ..core import sampling
from ..scene.node import SceneNodeTag
from ..scene.registry import register
from .base import Environment

PI = float(np.pi)


def direction_to_uv(w):
    """Equal-angle lat-long: u = phi/2pi, v = theta/pi (spherical.cpp:42-57).
    theta from +y (up); phi around y starting at +x toward +z."""
    theta = jnp.arccos(jnp.clip(w[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(w[..., 2], w[..., 0])
    u = (phi / (2.0 * PI)) % 1.0
    v = theta / PI
    return jnp.stack([u, v], axis=-1)


def uv_to_direction(uv):
    phi = uv[..., 0] * 2.0 * PI
    theta = uv[..., 1] * PI
    sin_t = jnp.sin(theta)
    return jnp.stack(
        [sin_t * jnp.cos(phi), jnp.cos(theta), sin_t * jnp.sin(phi)], axis=-1
    )


def _bilinear(img, uv):
    """img: (H, W, C); uv: (..., 2) in [0,1); wrap in u, clamp in v."""
    h, w = img.shape[0], img.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0.astype(jnp.float32))[..., None]
    fy = (y - y0.astype(jnp.float32))[..., None]
    x0w = jnp.mod(x0, w)
    x1w = jnp.mod(x0 + 1, w)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)
    v00 = img[y0c, x0w]
    v01 = img[y0c, x1w]
    v10 = img[y1c, x0w]
    v11 = img[y1c, x1w]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


@register(SceneNodeTag.ENVIRONMENT, "spherical", "Spherical")
class SphericalEnvironment(Environment):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        emission = desc.node("emission")
        if emission is None:
            raise ValueError("spherical environment requires 'emission' texture")
        self.emission = scene.load_texture(emission)
        self.mis_compensation = desc.float("mis_compensation", 0.0)
        self._arrays = None

    def compile(self, compiler):
        img = self._rasterize()
        h, w = img.shape[:2]
        lum = 0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
        self.constant = bool(lum.max() - lum.min() < 1e-6 * max(lum.max(), 1e-12))
        # gaussian-ish 3x3 blur of the weight map (spherical.cpp:155-180)
        k = np.asarray([0.25, 0.5, 0.25])
        blurred = lum
        blurred = (
            np.roll(blurred, -1, 0) * k[0] + blurred * k[1] + np.roll(blurred, 1, 0) * k[2]
        )
        blurred = (
            np.roll(blurred, -1, 1) * k[0] + blurred * k[1] + np.roll(blurred, 1, 1) * k[2]
        )
        theta = (np.arange(h) + 0.5) / h * PI
        weights = blurred * np.sin(theta)[:, None]
        if self.mis_compensation > 0.0:
            mean = weights.mean()
            weights = np.maximum(weights - self.mis_compensation * mean, 0.0)
        if weights.sum() <= 0.0:
            weights = np.ones_like(weights)
        table = sampling.build_alias_table_2d(weights)
        self._arrays = {
            "image": jnp.asarray(img),
            "mean": jnp.asarray(img.mean(axis=(0, 1))),
            "marg_prob": table.marginal.prob,
            "marg_alias": table.marginal.alias,
            "marg_pdf": table.marginal.pdf,
            "cond_prob": table.cond_prob,
            "cond_alias": table.cond_alias,
            "cond_pdf": table.cond_pdf,
            "rotation": jnp.asarray(self.rotation()),
        }

    def _rasterize(self) -> np.ndarray:
        """Radiance grid from the emission texture (exact for image textures,
        sampled for procedural ones)."""
        static = self.emission.evaluate_static()
        if static is not None:
            img = np.broadcast_to(
                np.asarray(static[:3], np.float32), (64, 128, 3)
            ).copy()
            return img * self.scale
        raster = getattr(self.emission, "rasterize", None)
        if raster is None:
            raise ValueError(
                f"environment emission texture '{self.emission.desc.identifier}' "
                "cannot be rasterized"
            )
        return np.asarray(raster(), np.float32)[..., :3] * self.scale

    def device_arrays(self):
        return self._arrays

    # --- device-side ---
    def _decode(self, ctx, rgb, swl):
        return ctx.spectrum.decode_illuminant(rgb, swl)

    def _pdf_dir(self, env, uv, pdf_texel):
        h, w = env["image"].shape[0], env["image"].shape[1]
        sin_t = jnp.sin(jnp.clip(uv[..., 1], 1e-4, 1.0 - 1e-4) * PI)
        return pdf_texel * (h * w) / (2.0 * PI * PI * jnp.maximum(sin_t, 1e-6))

    def evaluate(self, ctx, wi_world, swl):
        env = ctx.arrays["environment"]
        rot = env["rotation"]
        # world -> env local: multiply by rotation^T (unrolled, stays off MXU)
        wi = jnp.stack(
            [
                rot[0, 0] * wi_world[..., 0] + rot[1, 0] * wi_world[..., 1] + rot[2, 0] * wi_world[..., 2],
                rot[0, 1] * wi_world[..., 0] + rot[1, 1] * wi_world[..., 1] + rot[2, 1] * wi_world[..., 2],
                rot[0, 2] * wi_world[..., 0] + rot[1, 2] * wi_world[..., 1] + rot[2, 2] * wi_world[..., 2],
            ],
            axis=-1,
        )
        uv = direction_to_uv(wi)
        if self.constant:
            # constant map: skip the 4-tap bilinear gather (each ~ms-scale
            # at 1M rays on TPU); pdf is the uniform-sphere value
            rgb = jnp.broadcast_to(env["mean"], uv.shape[:-1] + (3,))
            pdf = jnp.full(uv.shape[:-1], sampling.UNIFORM_SPHERE_PDF)
        else:
            rgb = _bilinear(env["image"], uv)
            h, w = env["image"].shape[0], env["image"].shape[1]
            xi = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
            yi = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
            pdf_texel = env["marg_pdf"][yi] * env["cond_pdf"][yi, xi]
            pdf = self._pdf_dir(env, uv, pdf_texel)
        return {"L": self._decode(ctx, rgb, swl), "pdf": pdf}

    def sample(self, ctx, p, u, swl):
        env = ctx.arrays["environment"]
        if self.constant:
            wi_local = sampling.sample_uniform_sphere(u)
            uv = direction_to_uv(wi_local)
            pdf = jnp.full(u.shape[:-1], sampling.UNIFORM_SPHERE_PDF)
        else:
            h, w = env["image"].shape[0], env["image"].shape[1]
            # marginal over rows, conditional over columns (flat alias draw)
            y, pdf_y, uy = sampling.alias_sample(
                sampling.AliasTable(
                    prob=env["marg_prob"], alias=env["marg_alias"], pdf=env["marg_pdf"]
                ),
                u[..., 1],
            )
            ux = u[..., 0] * w
            xi = jnp.clip(ux.astype(jnp.int32), 0, w - 1)
            up = ux - xi.astype(jnp.float32)
            prob_i = env["cond_prob"][y, xi]
            take = up >= prob_i
            x = jnp.where(take, env["cond_alias"][y, xi], xi)
            ux_rem = jnp.where(
                take,
                (up - prob_i) / jnp.maximum(1.0 - prob_i, 1e-8),
                up / jnp.maximum(prob_i, 1e-8),
            )
            pdf_texel = pdf_y * env["cond_pdf"][y, x]
            uv = jnp.stack(
                [
                    (x.astype(jnp.float32) + jnp.clip(ux_rem, 0.0, 1.0)) / w,
                    (y.astype(jnp.float32) + jnp.clip(uy, 0.0, 1.0)) / h,
                ],
                axis=-1,
            )
            wi_local = uv_to_direction(uv)
            pdf = self._pdf_dir(env, uv, pdf_texel)
        rot = env["rotation"]
        wi_world = jnp.stack(
            [
                rot[0, 0] * wi_local[..., 0] + rot[0, 1] * wi_local[..., 1] + rot[0, 2] * wi_local[..., 2],
                rot[1, 0] * wi_local[..., 0] + rot[1, 1] * wi_local[..., 1] + rot[1, 2] * wi_local[..., 2],
                rot[2, 0] * wi_local[..., 0] + rot[2, 1] * wi_local[..., 1] + rot[2, 2] * wi_local[..., 2],
            ],
            axis=-1,
        )
        if self.constant:
            rgb = jnp.broadcast_to(env["mean"], uv.shape[:-1] + (3,))
        else:
            rgb = _bilinear(env["image"], uv)
        return {"wi": wi_world, "L": self._decode(ctx, rgb, swl), "pdf": pdf}
