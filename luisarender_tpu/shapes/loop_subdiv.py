"""Loop-subdivision shape.

TPU-native equivalent of /root/reference/src/shapes/loop_subdiv.cpp: Loop
subdivision of a base mesh (OBJ file or inline) at scene-compile time via
utils/loop_subdiv.py."""

from __future__ import annotations

import numpy as np

from ..scene.node import SceneNodeTag
from ..scene.registry import register
from ..utils.loop_subdiv import loop_subdivide
from ..utils.objloader import load_obj
from .base import MeshData, Shape, compute_vertex_normals


@register(SceneNodeTag.SHAPE, "loopsubdiv", "LoopSubdiv", "loop_subdiv")
class LoopSubdivShape(Shape):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.level = min(max(desc.int("level", 1), 0), 6)
        path = desc.path("file", None)
        if path is not None:
            p, t, _, _ = load_obj(path)
        else:
            positions = desc.float_list("positions", None)
            indices = desc.float_list("indices", None)
            if positions is None or indices is None:
                raise ValueError(
                    "loop_subdiv requires 'file' or 'positions'/'indices'"
                )
            p = np.asarray(positions, np.float32).reshape(-1, 3)
            t = np.asarray(indices, np.int64).astype(np.int32).reshape(-1, 3)
        p, t = loop_subdivide(p, t, self.level)
        n = compute_vertex_normals(p, t)
        self._mesh = MeshData(positions=p, triangles=t, normals=n, uvs=None)

    @property
    def is_mesh(self):
        return True

    def mesh(self):
        return self._mesh
