"""Reconstruction filters with importance-sampled LUT + alias table.

TPU-native equivalent of /root/reference/src/base/filter.h:17-48 /
filter.cpp:24-66: a 64-entry LUT of the 1D kernel over [-r, r] is built on the
host from `evaluate(x)`, an alias table importance-samples it, and a 2D
offset is the product of two 1D draws with weight f(x)f(y)/pdf. Because each
camera sample then lands in exactly ONE pixel, film accumulation needs no
scatter in pixel-ordered passes — a key TPU win.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.sampling import AliasTable, alias_sample, build_alias_table
from ..scene.scene import SceneNode

FILTER_LUT_SIZE = 64


class Filter(SceneNode):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.radius = desc.float("radius", self.default_radius())
        xs = (np.arange(FILTER_LUT_SIZE) + 0.5) / FILTER_LUT_SIZE
        xs = (xs * 2.0 - 1.0) * self.radius
        f = np.asarray([self.evaluate(float(x)) for x in xs], dtype=np.float64)
        # trapezoid-style normalization over the support
        integral = f.sum() * (2.0 * self.radius / FILTER_LUT_SIZE)
        f = f / max(abs(integral), 1e-12)
        self.lut = jnp.asarray(f, dtype=jnp.float32)
        self.table: AliasTable = build_alias_table(np.abs(f))

    def default_radius(self) -> float:
        return 1.0

    def evaluate(self, x: float) -> float:
        raise NotImplementedError

    def sample_1d(self, u):
        """u: (...,) -> (offset in [-r, r], weight, u_remapped)."""
        n = FILTER_LUT_SIZE
        i, pdf_i, u_rem = alias_sample(self.table, u)
        offset = ((i.astype(jnp.float32) + u_rem) / n * 2.0 - 1.0) * self.radius
        pdf_density = pdf_i * n / (2.0 * self.radius)
        weight = self.lut[i] / jnp.maximum(pdf_density, 1e-12)
        return offset, weight, u_rem

    def sample(self, u):
        """u: (..., 2) -> (offset (..., 2), weight (...,))."""
        ox, wx, _ = self.sample_1d(u[..., 0])
        oy, wy, _ = self.sample_1d(u[..., 1])
        return jnp.stack([ox, oy], axis=-1), wx * wy
