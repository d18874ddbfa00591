"""Pinned-image regression tests (VERDICT round-1 item 6).

The reference validates renders against out-of-repo scene galleries
(README.md:48-52 LuisaRenderScenes); here the goldens live in-repo:
small fixed-seed CPU renders of representative scenes are committed as EXRs
(tests/golden/) and every run must reproduce them within tight tolerance.
CPU and TPU render bit-identically in this codebase (the small-vector paths
avoid MXU matmuls), so CPU goldens pin the TPU path too.

Regenerate after an INTENTIONAL image change:
    GOLDEN_REGEN=1 python -m pytest tests/test_golden.py -q
then review the new EXRs visually before committing them.
"""

import os
from pathlib import Path

import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.utils import imageio

GOLDEN_DIR = Path(__file__).parent / "golden"
REGEN = bool(os.environ.get("GOLDEN_REGEN"))


def _check(name, img):
    img = np.asarray(img, np.float32)
    path = GOLDEN_DIR / f"{name}.exr"
    if REGEN or not path.exists():
        GOLDEN_DIR.mkdir(exist_ok=True)
        imageio.save_exr(str(path), img)
        pytest.skip(f"golden {name} (re)generated — review and commit it")
    ref = imageio.load_exr(str(path))
    assert ref.shape == img.shape, (ref.shape, img.shape)
    # bitwise-stable on one platform; the tolerance only absorbs cross-
    # version float scheduling drift. A dispatch/converter regression that
    # shifts the image fails loudly.
    mad = float(np.abs(img - ref).mean())
    mx = float(np.abs(img - ref).max())
    assert mad < 2e-5 and mx < 2e-3, (name, mad, mx)


def test_golden_cornell_megapath():
    scene = lr.Scene.from_dict(
        testing.cornell_box(resolution=(64, 64), spp=8, depth=5)
    )
    img = lr.render(scene)["cornell.exr"]
    _check("cornell_64_8spp", img)


def test_golden_cornell_spectral_hero():
    import json

    path = Path(__file__).parent.parent / "scenes" / "cornell_spectral.json"
    d = json.load(open(path))
    cam = d["render"]["cameras"][0]["prop"]
    cam["film"]["prop"]["resolution"] = [48, 48]
    cam["spp"] = 8
    img = lr.render(lr.Scene.from_dict(d))["cornell_spectral.exr"]
    _check("cornell_spectral_48_8spp", img)


def test_golden_materials_mixed():
    import json

    path = Path(__file__).parent.parent / "scenes" / "materials.json"
    d = json.load(open(path))
    cam = d["render"]["cameras"][0]["prop"]
    cam["film"]["prop"]["resolution"] = [48, 48]
    cam["spp"] = 8
    d["render"]["integrator"]["prop"]["depth"] = 5
    img = lr.render(lr.Scene.from_dict(d))["materials.exr"]
    _check("materials_48_8spp", img)


def test_golden_tungsten_converted(tmp_path):
    """End-to-end through the Tungsten converter: schema + .wo3 meshes +
    material mapping all pinned by one image."""
    import json
    import struct

    from luisarender_tpu.tools import tungsten2scene as t2s

    pos = np.array(
        [[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]], np.float32
    )
    nrm = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    tris = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    nv = pos.shape[0]
    verts = np.concatenate([pos, nrm, uv], axis=1).astype(np.float32)
    quads = np.concatenate(
        [tris.astype(np.int32), np.zeros((tris.shape[0], 1), np.int32)],
        axis=1,
    )
    with open(tmp_path / "floor.wo3", "wb") as f:
        f.write(struct.pack("<Q", nv))
        f.write(verts.tobytes())
        f.write(struct.pack("<Q", tris.shape[0]))
        f.write(quads.tobytes())

    tscene = {
        "renderer": {"spp": 8},
        "integrator": {"type": "path_tracer", "max_bounces": 4},
        "camera": {
            "transform": {
                "position": [0, 1.5, -4.0],
                "look_at": [0, 0.3, 0],
                "up": [0, 1, 0],
            },
            "resolution": [48, 32],
            "fov": 60,
        },
        "bsdfs": [
            {"name": "white", "type": "lambert", "albedo": 0.7},
            {
                "name": "metal",
                "type": "rough_conductor",
                "material": "Cu",
                "roughness": 0.3,
            },
        ],
        "primitives": [
            {"type": "mesh", "file": "floor.wo3", "bsdf": "white"},
            {
                "type": "sphere",
                "transform": {
                    "position": [0, 0.5, 0],
                    "scale": 0.5,
                },
                "bsdf": "metal",
            },
            {
                "type": "quad",
                "transform": {
                    "position": [0, 3.0, 0],
                    "scale": [2.0, 1.0, 2.0],
                },
                "emission": [6.0, 6.0, 6.0],
                "bsdf": "white",
            },
        ],
    }
    json.dump(tscene, open(tmp_path / "scene.json", "w"))
    out = t2s.convert(
        str(tmp_path / "scene.json"), str(tmp_path / "out.json")
    )
    img = lr.render(lr.Scene.from_dict(out))
    img = next(iter(img.values()))
    _check("tungsten_converted_48x32_8spp", img)
