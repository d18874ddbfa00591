"""Display film: tonemapped progressive preview output.

TPU-native equivalent of /root/reference/src/films/display.cpp:16-95 — a
decorator film around `color` with tone mapping (none/uncharted2/aces) and
exposure. The reference opens a swapchain window; here the
preview is (a) a PNG written after accumulation passes and (b), with
`serve: true`, a live HTTP viewer (films/live_server.py) any browser can
watch during the render — the headless-pod equivalent of the reference's
swapchain present (target_fps/vsync become a minimum wall-clock interval
between frames).
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
        self._spp_seen = 0
        self._server = None
        if desc.bool("serve", False):
            from .live_server import LiveServer

            self._server = LiveServer(port=desc.int("port", 8090))
            print(
                f"[display] live viewer: http://localhost:{self._server.port}/",
                flush=True,
            )

    def maybe_preview(self, accum):
        """Called between passes by the host progressive loop (accumulation
        itself runs under jit and cannot do IO)."""
        self._spp_seen += 1
        now = time.time()
        if now - self._last_preview >= self.min_interval:
            self._last_preview = now
            self.write_preview(accum)

    def write_preview(self, accum):
        img = np.asarray(self.develop(accum))
        mapped = np.asarray(
            colorspace.TONEMAP_OPERATORS[self.tonemap](jnp.asarray(img))
        )
        if self._server is not None:
            self._server.push(
                imageio.png_bytes(
                    np.asarray(colorspace.srgb_encode(jnp.asarray(mapped)))
                ),
                spp=self._spp_seen,
            )
        if self.hdr:
            imageio.save_exr(self.preview_file, mapped)
        else:
            imageio.save_png(
                self.preview_file,
                np.asarray(colorspace.srgb_encode(jnp.asarray(mapped))),
            )
