"""Shape interface: meshes and shape DAG nodes.

TPU-native equivalent of /root/reference/src/base/shape.h:23-115 — a shape is
either a concrete mesh (MeshView span pair) or a DAG node with children()
(group/instance); common per-shape properties (surface, light, medium,
transform, visibility, two_sided, shadow terminator / intersection offset
factors) mirror shape.h:34-39,66-115 and are baked into the instance table by
the scene compiler.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ..scene.scene import SceneNode


class MeshData(NamedTuple):
    positions: np.ndarray  # (V, 3) float32, object space
    triangles: np.ndarray  # (T, 3) int32
    normals: Optional[np.ndarray]  # (V, 3) float32 or None
    uvs: Optional[np.ndarray]  # (V, 2) float32 or None


class Shape(SceneNode):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.surface = scene.load_surface(desc.node("surface"))
        self.light = scene.load_light(desc.node("light"))
        self.medium = scene.load_medium(desc.node("medium"))
        self.transform = scene.load_transform(desc.node("transform"))
        self.visible = desc.bool("visible", True)
        self.two_sided = desc.bool("two_sided", None)
        self.shadow_terminator = desc.float("shadow_terminator", -1.0)
        self.intersection_offset = desc.float("intersection_offset", -1.0)

    @property
    def is_mesh(self) -> bool:
        return False

    def mesh(self) -> MeshData:
        raise NotImplementedError

    def children(self) -> list:
        return []


def compute_vertex_normals(positions: np.ndarray, triangles: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals for meshes without authored normals."""
    fn = np.cross(
        positions[triangles[:, 1]] - positions[triangles[:, 0]],
        positions[triangles[:, 2]] - positions[triangles[:, 0]],
    )
    vn = np.zeros_like(positions)
    for k in range(3):
        np.add.at(vn, triangles[:, k], fn)
    norm = np.linalg.norm(vn, axis=-1, keepdims=True)
    return (vn / np.maximum(norm, 1e-12)).astype(np.float32)
