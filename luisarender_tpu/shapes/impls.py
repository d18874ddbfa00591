"""Concrete shapes: inline mesh, OBJ mesh, procedural sphere, group, instance.

TPU-native equivalents of /root/reference/src/shapes/{inline_mesh,mesh,sphere,
group,instance}.cpp. Mesh import is a small native-Python OBJ loader (the
reference uses Assimp with an LRU cache, shapes/mesh.cpp:29-142); sphere is a
subdivided icosahedron (shapes/sphere.cpp); group/instance are DAG nodes
(shapes/group.cpp:11-25).
"""

from __future__ import annotations

import numpy as np

from ..scene.node import SceneNodeTag
from ..scene.registry import register
from ..utils.objloader import load_obj
from .base import MeshData, Shape, compute_vertex_normals

_MESH_CACHE: dict = {}


@register(SceneNodeTag.SHAPE, "inlinemesh", "InlineMesh", "inline_mesh")
class InlineMesh(Shape):
    """Vertices/indices given directly in the scene description
    (shapes/inline_mesh.cpp)."""

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        positions = desc.float_list("positions", None)
        indices = desc.float_list("indices", None)
        if positions is None or indices is None:
            raise ValueError("inline mesh requires 'positions' and 'indices'")
        p = np.asarray(positions, dtype=np.float32).reshape(-1, 3)
        t = np.asarray(indices, dtype=np.int64).astype(np.int32).reshape(-1, 3)
        normals = desc.float_list("normals", None)
        n = (
            np.asarray(normals, dtype=np.float32).reshape(-1, 3)
            if normals is not None
            else None
        )
        uvs = desc.float_list("uvs", None)
        uv = (
            np.asarray(uvs, dtype=np.float32).reshape(-1, 2)
            if uvs is not None
            else None
        )
        self._mesh = MeshData(positions=p, triangles=t, normals=n, uvs=uv)

    @property
    def is_mesh(self):
        return True

    def mesh(self):
        return self._mesh


@register(SceneNodeTag.SHAPE, "mesh", "Mesh")
class ObjMesh(Shape):
    """File mesh with content cache (shapes/mesh.cpp LRU-cached Assimp load).

    Formats: OBJ (utils/objloader.py) and PLY ascii/binary
    (utils/plyloader.py) — PLY covers the Bitterli/PBRT scene repositories
    without a conversion step. `subdivision: N` applies N levels of Loop
    subdivision (the triangle-native analogue of the reference's
    aiProcess-based Catmull-Clark subdivision option, mesh.cpp:61-77;
    authored normals/uvs are discarded and normals recomputed, as the
    reference's subdivider does)."""

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        path = desc.path("file", None)
        if path is None:
            raise ValueError("mesh shape requires 'file'")
        self.flip_uv = desc.bool("flip_uv", False)
        self.subdivision = max(desc.int("subdivision", 0), 0)
        key = (path, self.flip_uv, self.subdivision)
        if key not in _MESH_CACHE:
            if str(path).lower().endswith(".ply"):
                from ..utils.plyloader import load_ply

                p, t, n, uv = load_ply(path)
            else:
                p, t, n, uv = load_obj(path)
            if uv is not None and self.flip_uv:
                uv = np.stack([uv[:, 0], 1.0 - uv[:, 1]], axis=-1)
            if self.subdivision > 0:
                from ..utils.loop_subdiv import loop_subdivide

                p, t = loop_subdivide(p, t, self.subdivision)
                n, uv = None, None
            _MESH_CACHE[key] = MeshData(
                positions=p, triangles=t, normals=n, uvs=uv
            )
        self._mesh = _MESH_CACHE[key]

    @property
    def is_mesh(self):
        return True

    def mesh(self):
        return self._mesh


def icosphere(subdivision: int):
    """Subdivided icosahedron on the unit sphere (shapes/sphere.cpp)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int64,
    )
    for _ in range(subdivision):
        edge_mid: dict = {}
        verts_list = list(verts)
        new_faces = []

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                m = verts_list[a] + verts_list[b]
                m = m / np.linalg.norm(m)
                edge_mid[key] = len(verts_list)
                verts_list.append(m)
            return edge_mid[key]

        for f in faces:
            a, b, c = int(f[0]), int(f[1]), int(f[2])
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(verts_list)
        faces = np.asarray(new_faces, dtype=np.int64)
    return verts.astype(np.float32), faces.astype(np.int32)


@register(SceneNodeTag.SHAPE, "sphere", "Sphere")
class SphereShape(Shape):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.subdivision = min(max(desc.int("subdivision", 4), 0), 8)
        # Analytic (quadric) intersection is the DEFAULT on this renderer:
        # the reference tessellates spheres only because RT cores want
        # triangles (shapes/sphere.cpp); a TPU has no RT hardware, and the
        # exact quadric test is pure vector math — faster AND exact (no
        # faceting). `analytic: false` opts back into the subdivided
        # icosphere mesh (identical uv parameterization either way). The
        # compiler silently falls back to the mesh when the instance is
        # emissive, carries a medium, or has a non-similarity transform
        # (scene/compiler.py _analytic_sphere).
        self.analytic = desc.bool("analytic", True)
        key = ("__sphere__", self.subdivision)
        if key not in _MESH_CACHE:
            p, t = icosphere(self.subdivision)
            n = p.copy()  # unit sphere: normal == position
            theta = np.arccos(np.clip(p[:, 2], -1, 1))
            phi = np.arctan2(p[:, 1], p[:, 0])
            uv = np.stack(
                [(phi / (2 * np.pi)) % 1.0, theta / np.pi], axis=-1
            ).astype(np.float32)
            _MESH_CACHE[key] = MeshData(positions=p, triangles=t, normals=n, uvs=uv)
        self._mesh = _MESH_CACHE[key]

    @property
    def is_mesh(self):
        return True

    def mesh(self):
        return self._mesh


@register(SceneNodeTag.SHAPE, "group", "Group")
class GroupShape(Shape):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self._children = [scene.load_shape(s) for s in desc.node_list("shapes")]

    def children(self):
        return self._children


@register(SceneNodeTag.SHAPE, "instance", "Instance")
class InstanceShape(Shape):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        ref = desc.node("shape")
        if ref is None:
            raise ValueError("instance shape requires 'shape'")
        self._children = [scene.load_shape(ref)]

    def children(self):
        return self._children
