"""glTF importer (tools/gltf2scene.py): GLB parsing, accessor decode,
material mapping, end-to-end render of a converted scene."""

import json
import struct

import numpy as np

import luisarender_tpu as lr
from luisarender_tpu.tools.gltf2scene import convert


def _make_glb(path):
    """Minimal GLB: one quad mesh (pos+normal+uv, u16 indices), an emissive
    red material, and a perspective camera looking at it."""
    pos = np.asarray(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    nrm = np.asarray([[0, 0, 1]] * 4, np.float32)
    uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.asarray([0, 1, 2, 0, 2, 3], np.uint16)
    bin_data = (
        pos.tobytes() + nrm.tobytes() + uv.tobytes() + idx.tobytes() + b"\x00\x00"
    )
    views = [
        {"buffer": 0, "byteOffset": 0, "byteLength": pos.nbytes},
        {"buffer": 0, "byteOffset": pos.nbytes, "byteLength": nrm.nbytes},
        {"buffer": 0, "byteOffset": pos.nbytes + nrm.nbytes, "byteLength": uv.nbytes},
        {
            "buffer": 0,
            "byteOffset": pos.nbytes + nrm.nbytes + uv.nbytes,
            "byteLength": idx.nbytes,
        },
    ]
    accessors = [
        {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3",
         "min": [-1, -1, 0], "max": [1, 1, 0]},
        {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
        {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
        {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
    ]
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0, "translation": [0.0, 0.0, 0.0]},
            {
                "camera": 0,
                # camera at z=3 looking down -z (identity rotation)
                "translation": [0.0, 0.0, 3.0],
            },
        ],
        "cameras": [
            {"type": "perspective", "perspective": {"yfov": 0.9, "znear": 0.01}}
        ],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                        "indices": 3,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [
            {
                "pbrMetallicRoughness": {
                    "baseColorFactor": [0.2, 0.2, 0.2, 1.0],
                    "metallicFactor": 0.0,
                    "roughnessFactor": 0.8,
                },
                "emissiveFactor": [1.0, 0.1, 0.1],
            }
        ],
        "buffers": [{"byteLength": len(bin_data)}],
        "bufferViews": views,
        "accessors": accessors,
    }
    js = json.dumps(doc).encode()
    js += b" " * ((-len(js)) % 4)
    header = struct.pack("<4sII", b"glTF", 2, 12 + 8 + len(js) + 8 + len(bin_data))
    glb = (
        header
        + struct.pack("<I4s", len(js), b"JSON")
        + js
        + struct.pack("<I4s", len(bin_data), b"BIN\x00")
        + bin_data
    )
    path.write_bytes(glb)


class TestGltfImport:
    def test_convert_and_render(self, tmp_path):
        glb = tmp_path / "quad.glb"
        _make_glb(glb)
        out = tmp_path / "scene.json"
        scene_dict = convert(str(glb), str(out), spp=4)
        assert out.exists()
        assert len(scene_dict["render"]["shapes"]) == 1
        shape = scene_dict["render"]["shapes"][0]
        assert shape["prop"]["surface"]["impl"] == "disney"
        assert shape["prop"]["light"]["impl"] == "diffuse"
        assert (tmp_path / shape["prop"]["file"]).exists()
        # camera imported from the glTF node
        cam = scene_dict["render"]["cameras"][0]
        assert abs(cam["prop"]["fov"] - np.rad2deg(0.9)) < 1e-3
        assert cam["prop"]["transform"]["prop"]["origin"] == [0.0, 0.0, 3.0]

        # shrink for a fast end-to-end render: emissive quad must appear red
        cam["prop"]["film"]["prop"]["resolution"] = [32, 32]
        cam["prop"]["spp"] = 4
        out.write_text(json.dumps(scene_dict))
        images = lr.render_file(str(out), save=False)
        img = list(images.values())[0]
        center = np.asarray(img)[12:20, 12:20]
        assert center[..., 0].mean() > 0.5  # red emission
        assert center[..., 0].mean() > 3 * center[..., 1].mean()

    def test_strided_accessor(self, tmp_path):
        """Interleaved vertex buffers decode correctly through byteStride."""
        from luisarender_tpu.tools.gltf2scene import GltfFile

        # interleave pos(12B) + uv(8B) per vertex, stride 20
        pos = np.asarray([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.float32)
        uv = np.asarray([[9, 10], [11, 12], [13, 14]], np.float32)
        inter = np.concatenate([pos, uv], axis=1).astype(np.float32).tobytes()
        doc = {
            "asset": {"version": "2.0"},
            "buffers": [{"byteLength": len(inter)}],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": len(inter), "byteStride": 20}
            ],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
                {"bufferView": 0, "byteOffset": 12, "componentType": 5126, "count": 3, "type": "VEC2"},
            ],
        }
        p = tmp_path / "strided.gltf"
        p.write_text(json.dumps(doc))
        # external-buffer-free file: patch buffer to a data uri
        import base64

        doc["buffers"][0]["uri"] = "data:application/octet-stream;base64," + base64.b64encode(inter).decode()
        p.write_text(json.dumps(doc))
        g = GltfFile(p)
        np.testing.assert_array_equal(g.accessor(0), pos)
        np.testing.assert_array_equal(g.accessor(1), uv)
