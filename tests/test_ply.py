"""PLY loader (ascii/binary) + mesh `subdivision` option (VERDICT r3 item 8)."""

import struct

import numpy as np
import pytest

from luisarender_tpu.utils.plyloader import load_ply

QUAD_P = np.asarray(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
)
QUAD_N = np.asarray([[0, 0, 1]] * 4, np.float32)
QUAD_UV = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)


def _write_ascii(path):
    lines = [
        "ply", "format ascii 1.0", "comment made by tests",
        "element vertex 4",
        "property float x", "property float y", "property float z",
        "property float nx", "property float ny", "property float nz",
        "property float u", "property float v",
        "element face 1",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    for i in range(4):
        lines.append(
            " ".join(
                str(float(x))
                for x in (*QUAD_P[i], *QUAD_N[i], *QUAD_UV[i])
            )
        )
    lines.append("4 0 1 2 3")  # quad -> fan triangulated
    path.write_bytes(("\n".join(lines) + "\n").encode())


def _write_binary(path, endian="<"):
    fmt_name = (
        "binary_little_endian" if endian == "<" else "binary_big_endian"
    )
    header = "\n".join([
        "ply", f"format {fmt_name} 1.0",
        "element vertex 4",
        "property float x", "property float y", "property float z",
        "element face 2",
        "property list uchar int vertex_indices",
        "end_header", "",
    ]).encode()
    body = b""
    for i in range(4):
        body += struct.pack(endian + "3f", *QUAD_P[i])
    for tri in ((0, 1, 2), (0, 2, 3)):
        body += struct.pack(endian + "B3i", 3, *tri)
    path.write_bytes(header + body)


def test_ascii_ply(tmp_path):
    f = tmp_path / "quad.ply"
    _write_ascii(f)
    p, t, n, uv = load_ply(str(f))
    assert np.allclose(p, QUAD_P)
    assert np.array_equal(t, [[0, 1, 2], [0, 2, 3]])
    assert np.allclose(n, QUAD_N)
    assert np.allclose(uv, QUAD_UV)


@pytest.mark.parametrize("endian", ["<", ">"])
def test_binary_ply(tmp_path, endian):
    f = tmp_path / "quad.ply"
    _write_binary(f, endian)
    p, t, n, uv = load_ply(str(f))
    assert np.allclose(p, QUAD_P)
    assert np.array_equal(t, [[0, 1, 2], [0, 2, 3]])
    assert n is None and uv is None


def test_mesh_node_loads_ply_and_subdivides(tmp_path):
    """A PLY mesh node round-trips through the compiler; `subdivision: N`
    multiplies the triangle count by 4^N (Loop subdivision)."""
    import luisarender_tpu as lr
    from luisarender_tpu import testing

    f = tmp_path / "quad.ply"
    _write_binary(f)

    def scene_with(subdiv):
        d = testing.cornell_box(resolution=(8, 8), spp=1)
        d["render"]["shapes"].append({
            "impl": "mesh",
            "prop": {
                "file": str(f),
                "subdivision": subdiv,
                "surface": {
                    "impl": "matte",
                    "prop": {
                        "Kd": {
                            "impl": "constant",
                            "prop": {"v": [0.5, 0.5, 0.5]},
                        }
                    },
                },
            },
        })
        return lr.compile_scene(lr.Scene.from_dict(d))

    base = scene_with(0).plan.num_tris
    sub = scene_with(2).plan.num_tris
    assert sub - base == 2 * (16 - 1)  # 2 tris -> 32, minus the 2 originals

    img = lr.render(scene_with(0).scene)
    assert np.isfinite(next(iter(img.values()))).all()
