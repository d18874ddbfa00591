"""Null (pass-through) surface — used for medium boundaries.

TPU-native equivalent of /root/reference/src/surfaces/null.cpp: no lobes, no
properties; the scene compiler marks instances with a null surface as
surface-less (surface_tag -1), and the volumetric integrators treat the
boundary as a THROUGH event (medium enter/exit only).
"""

from __future__ import annotations

from ..scene.node import SceneNodeTag
from ..scene.registry import register
from .base import Surface


@register(SceneNodeTag.SURFACE, "null", "Null")
class NullSurface(Surface):
    properties = 0

    def __init__(self, scene, desc):
        super().__init__(scene, desc)

    @property
    def is_null(self) -> bool:
        return True

    def compile(self, compiler) -> dict:
        return self.compile_common(compiler)
