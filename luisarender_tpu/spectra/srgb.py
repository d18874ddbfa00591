"""sRGB (fixed tristimulus) spectrum node.

TPU-native equivalent of /root/reference/src/spectra/srgb.cpp:25-33.
"""

from __future__ import annotations

from ..core.spectrum import SRGBSpectrum
from ..scene.node import SceneNodeTag
from ..scene.registry import register
from ..scene.scene import SceneNode


class Spectrum(SceneNode):
    """Host node wrapping a core SpectrumModel (base/spectrum.h)."""

    def model(self):
        raise NotImplementedError


@register(SceneNodeTag.SPECTRUM, "srgb", "sRGB", "rgb", "RGB")
class SRGBSpectrumNode(Spectrum):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self._model = SRGBSpectrum()

    def model(self):
        return self._model
