"""Tungsten scene converter (tools/tungsten2scene.py): schema mapping, .wo3
binary mesh reading, and an end-to-end render of a converted scene."""

import json
import math
import struct

import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu.tools import tungsten2scene as t2s


def _write_wo3(path, positions, normals, uvs, tris):
    nv = positions.shape[0]
    verts = np.concatenate([positions, normals, uvs], axis=1).astype(np.float32)
    quads = np.concatenate(
        [tris.astype(np.int32), np.zeros((tris.shape[0], 1), np.int32)], axis=1
    )
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", nv))
        f.write(verts.tobytes())
        f.write(struct.pack("<Q", tris.shape[0]))
        f.write(quads.tobytes())


@pytest.fixture
def tungsten_scene(tmp_path):
    # a two-triangle .wo3 floor
    pos = np.array([[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]], np.float32)
    nrm = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    tris = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    _write_wo3(tmp_path / "floor.wo3", pos, nrm, uv, tris)

    scene = {
        "renderer": {"spp": 4},
        "integrator": {"type": "path_tracer", "max_bounces": 3},
        "camera": {
            "transform": {
                "position": [0, 1.0, -4.0],
                "look_at": [0, 0.5, 0],
                "up": [0, 1, 0],
            },
            "resolution": [32, 24],
            "fov": 60,
        },
        "bsdfs": [
            {"name": "white", "type": "lambert", "albedo": 0.7},
            {
                "name": "glassy",
                "type": "rough_dielectric",
                "ior": 1.5,
                "roughness": 0.2,
                "albedo": [0.9, 0.9, 0.9],
            },
            {
                "name": "metal",
                "type": "rough_conductor",
                "material": "Au",
                "roughness": 0.3,
                "albedo": 1.0,
            },
            {
                "name": "checks",
                "type": "lambert",
                "albedo": {
                    "type": "checker",
                    "on_color": 0.8,
                    "off_color": [0.1, 0.2, 0.3],
                    "res_u": 10,
                    "res_v": 10,
                },
            },
        ],
        "primitives": [
            {"type": "mesh", "file": "floor.wo3", "bsdf": "checks"},
            {
                "type": "quad",
                "transform": {
                    "position": [0, 2.0, 0],
                    "scale": [2, 1, 2],
                    "rotation": [180, 0, 0],
                },
                "bsdf": {"type": "null"},
                "emission": [6.0, 6.0, 6.0],
            },
            {
                "type": "sphere",
                "transform": {"position": [-0.7, 0.5, 0], "scale": 1.0},
                "bsdf": "metal",
            },
            {
                "type": "cube",
                "transform": {
                    "position": [0.8, 0.35, 0],
                    "scale": [0.7, 0.7, 0.7],
                    "rotation": [0, 30, 0],
                },
                "bsdf": "white",
            },
            {"type": "infinite_sphere", "emission": [0.1, 0.12, 0.15]},
        ],
    }
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(scene))
    return p, tmp_path


def test_wo3_roundtrip(tmp_path):
    pos = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (5, 1))
    uv = np.zeros((5, 2), np.float32)
    tris = np.array([[0, 1, 2], [2, 3, 4]], np.int32)
    _write_wo3(tmp_path / "m.wo3", pos, nrm, uv, tris)
    p, t = t2s.read_wo3(tmp_path / "m.wo3")
    assert np.allclose(p, pos) and np.array_equal(t, tris)
    t2s.wo3_to_obj(tmp_path / "m.wo3", tmp_path / "m.obj")
    text = (tmp_path / "m.obj").read_text()
    assert text.count("\nf ") + text.startswith("f ") == 2 or "f " in text


def test_convert_and_render(tungsten_scene, tmp_path):
    src, d = tungsten_scene
    out = d / "converted.json"
    doc = t2s.convert(str(src), str(out))
    render = doc["render"]
    assert len(render["shapes"]) == 4
    assert render["environment"]["impl"] == "spherical"
    assert render["integrator"]["prop"]["depth"] == 4
    cam = render["cameras"][0]["prop"]
    assert cam["film"]["prop"]["resolution"] == [32, 24]
    # horizontal 60deg at 4:3 -> vertical fov
    assert math.isclose(cam["fov"], 46.83, abs_tol=0.1)

    images = lr.render_file(str(out))
    img = next(iter(images.values()))
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01  # light + env visible


def test_material_mapping():
    m = t2s.convert_material({"type": "mirror", "albedo": [1, 0.8, 0.6]})
    assert m["impl"] == "mirror"
    m = t2s.convert_material({"type": "plastic", "ior": 1.4, "albedo": 0.5})
    assert m["impl"] == "plastic"
    assert m["prop"]["eta"]["prop"]["v"] == [1.4]
    m = t2s.convert_material({"type": "conductor", "material": "Ag"})
    assert m["impl"] == "metal" and m["prop"]["eta"] == "Ag"
    m = t2s.convert_material({"type": "oren_nayar", "sigma": 0.35})
    assert m["impl"] == "matte"
    assert math.isclose(
        m["prop"]["sigma"]["prop"]["v"][0], math.degrees(0.35), rel_tol=1e-6
    )


def test_tonemap_tool(tmp_path):
    from luisarender_tpu.tools import tonemap as tm
    from luisarender_tpu.utils import imageio

    img = np.abs(np.random.default_rng(0).normal(size=(8, 8, 3))).astype(
        np.float32
    ) * 3.0
    src = tmp_path / "in.exr"
    imageio.save_exr(str(src), img)
    out = tmp_path / "out.png"
    tm.main([str(src), str(out), "--tonemap", "aces", "--exposure", "-1"])
    assert out.exists()
    mapped = tm.tonemap_image(img, "uncharted2", 0.0)
    assert mapped.shape == img.shape and np.isfinite(mapped).all()
    assert mapped.max() <= 1.5  # tone mapped into displayable range
