"""Display film: tonemapped progressive preview output.

TPU-native equivalent of /root/reference/src/films/display.cpp:16-95 — a
decorator film around `color` with tone mapping (none/uncharted2/aces) and
exposure. The reference opens a swapchain window; in this headless
environment the preview is a PNG written after every accumulation pass
(target_fps/vsync become a minimum wall-clock interval between writes).
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

from ..core import colorspace
from ..scene.node import SceneNodeTag
from ..scene.registry import register
from ..utils import imageio
from .base import ColorFilm


@register(SceneNodeTag.FILM, "display", "Display")
class DisplayFilm(ColorFilm):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        tonemap = desc.string("tone_mapping", "none").lower()
        if tonemap not in colorspace.TONEMAP_OPERATORS:
            raise ValueError(
                f"unknown tone mapping '{tonemap}'; "
                f"choose {sorted(colorspace.TONEMAP_OPERATORS)}"
            )
        self.tonemap = tonemap
        self.preview_file = desc.string("preview_file", "preview.png")
        target_fps = desc.float("target_fps", 1.0)
        self.min_interval = 1.0 / max(target_fps, 1e-3)
        self.hdr = desc.bool("hdr", False)
        self._last_preview = 0.0

    def maybe_preview(self, accum):
        """Called between passes by the host progressive loop (accumulation
        itself runs under jit and cannot do IO)."""
        now = time.time()
        if now - self._last_preview >= self.min_interval:
            self._last_preview = now
            self.write_preview(accum)

    def write_preview(self, accum):
        img = np.asarray(self.develop(accum))
        mapped = np.asarray(
            colorspace.TONEMAP_OPERATORS[self.tonemap](jnp.asarray(img))
        )
        if self.hdr:
            imageio.save_exr(self.preview_file, mapped)
        else:
            imageio.save_png(
                self.preview_file,
                np.asarray(colorspace.srgb_encode(jnp.asarray(mapped))),
            )
