"""Round-trip tests for the round-4 converter tools: akr2obj, obj_analyse,
seq2video, lux2scene, glslpt2scene (VERDICT round-3 item 10)."""

import json
import os
import struct

import numpy as np

from luisarender_tpu.tools import (
    akr2obj,
    glslpt2scene,
    lux2scene,
    obj_analyse,
    seq2video,
)


def _make_akr_mesh(path):
    v = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    vn = np.asarray([[0, 0, 1]] * 3, np.float32)
    vt = np.asarray([[0, 0], [1, 0], [0, 1]], np.float32)
    tri = np.asarray([[0, 1, 2]], np.uint32)
    buf = struct.pack("<Q", 4) + b"quad"
    for arr in (v, vn, vt, tri, tri, tri):
        n = arr.shape[0]
        buf += struct.pack("<Q", n) + arr.astype(
            np.float32 if arr.dtype == np.float32 else np.uint32
        ).tobytes()
    with open(path, "wb") as f:
        f.write(buf)


def test_akr2obj_roundtrip(tmp_path):
    mesh = str(tmp_path / "m.mesh")
    _make_akr_mesh(mesh)
    out = akr2obj.akr_to_obj(mesh)
    text = open(out).read()
    assert "v 0.0 0.0 0.0" in text
    assert "f 1/1/1 2/2/2 3/3/3" in text
    # loadable by our OBJ loader
    from luisarender_tpu.utils.objloader import load_obj

    p, t, n, uv = load_obj(out)
    assert p.shape == (3, 3) and t.shape == (1, 3)


def test_obj_analyse_dedup(tmp_path):
    p = tmp_path / "a.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 0\n"
        "f 1 2 3\nf 4 2 3\n"  # second face uses a duplicated vertex
    )
    uv, uf, vt, ft = obj_analyse.analyse_obj(str(p))
    assert (uv, vt) == (3, 4)
    assert (uf, ft) == (1, 2)  # the two faces dedupe by coordinates


def test_seq2video_avi(tmp_path):
    from luisarender_tpu.utils import imageio

    for i in range(3):
        img = np.full((16, 24, 3), i * 0.3, np.float32)
        imageio.save_exr(str(tmp_path / f"f{i}.exr"), img)
    seq2video.main([str(tmp_path), "12"])
    avi = tmp_path / "output.avi"
    data = avi.read_bytes()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    assert data.count(b"00db") >= 6  # 3 frames + 3 index entries
    assert (tmp_path / "f0.png").exists()


def test_lux2scene_loads(tmp_path):
    scn = tmp_path / "box.scn"
    scn.write_text(
        'scene.camera.lookat.orig = 0.0 1.0 5.0\n'
        'scene.camera.lookat.target = 0.0 1.0 0.0\n'
        'scene.camera.up = 0.0 1.0 0.0\n'
        'scene.camera.fieldofview = 49.0\n'
        'scene.textures.white.type = "constfloat3"\n'
        'scene.textures.white.value = 0.8 0.8 0.8\n'
        'scene.textures.emit.type = "constfloat3"\n'
        'scene.textures.emit.value = 10 10 10\n'
        'scene.materials.wall.type = "matte"\n'
        'scene.materials.wall.kd = "white"\n'
        'scene.materials.wall.emission.power = 0\n'
        'scene.materials.lamp.type = "matte"\n'
        'scene.materials.lamp.kd = "white"\n'
        'scene.materials.lamp.emission = "emit"\n'
        'scene.objects.floor.ply = "floor.ply"\n'
        'scene.objects.floor.material = "wall"\n'
        'scene.objects.lampshape.ply = "lamp.ply"\n'
        'scene.objects.lampshape.material = "lamp"\n'
    )
    out = lux2scene.convert(str(scn))
    doc = json.load(open(out))
    assert doc["render"]["cameras"][0]["impl"] == "pinhole"
    assert doc["wall"]["impl"] == "matte"
    assert doc["lamp_EMISSION"]["type"] == "Light"
    assert doc["floor"]["prop"]["surface"] == "@wall"
    assert doc["lampshape"]["prop"]["light"] == "@lamp_EMISSION"
    assert "@floor" in doc["render"]["shapes"]


def test_glslpt2scene_loads(tmp_path):
    sc = tmp_path / "demo.scene"
    sc.write_text(
        "renderer\n{\n resolution 640 360\n envmapfile none\n}\n"
        "material red\n{\n color 0.9 0.1 0.1\n roughness 0.25\n}\n"
        "light\n{\n type quad\n position -1 5 -1\n v1 1 5 -1\n v2 -1 5 1\n"
        " emission 20 20 20\n}\n"
        "mesh\n{\n file bunny.obj\n material red\n"
        " position 0 0 0\n scale 2 2 2\n}\n"
        "camera\n{\n position 0 1 4\n lookat 0 1 0\n fov 60\n}\n"
    )
    out = glslpt2scene.convert(str(sc))
    doc = json.load(open(out))
    r = doc["render"]
    assert r["cameras"][0]["impl"] == "pinhole"
    # hfov 60 at 16:9 -> vfov = 2*atan(tan(30deg)*9/16) ~ 35.98; resolution
    # upscaled to 1920x1080
    assert abs(r["cameras"][0]["prop"]["fov"] - 35.98) < 0.1
    assert r["cameras"][0]["prop"]["film"]["prop"]["resolution"] == [1920, 1080]
    assert doc["Surface:red"]["impl"] == "disney"
    # glslpt roughness is squared: ours = sqrt
    assert abs(
        doc["Surface:red"]["prop"]["roughness"]["prop"]["v"] - 0.5
    ) < 1e-6
    kinds = [s["impl"] for s in r["shapes"]]
    assert "inlinemesh" in kinds and "instance" in kinds
    # the scene graph parses (mesh file missing is a load-time concern)
    from luisarender_tpu.scene.parser import parse_scene_dict

    parse_scene_dict(doc, base_dir=str(tmp_path))
