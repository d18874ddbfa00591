"""Texture system tests: atlas packing, image sampling, procedural textures."""

import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu.utils import imageio


def _plane_scene(tmp_path, kd_texture, res=32, spp=8):
    """Orthographic-ish view of a textured quad filling the frame, lit by a
    uniform environment (so texture color reads out directly)."""
    return {
        "render": {
            "cameras": [
                {
                    "impl": "pinhole",
                    "prop": {
                        "fov": 53.2,
                        "spp": spp,
                        "file": "tex.exr",
                        "film": {"impl": "color", "prop": {"resolution": [res, res]}},
                        "transform": {
                            "impl": "view",
                            "prop": {"origin": [0, 0, 1.0], "front": [0, 0, -1]},
                        },
                    },
                }
            ],
            "integrator": {"impl": "megapath", "prop": {"depth": 2}},
            "environment": {
                "impl": "spherical",
                "prop": {
                    "emission": {"impl": "constant", "prop": {"v": [1.0, 1.0, 1.0]}}
                },
            },
            "shapes": [
                {
                    "impl": "inlinemesh",
                    "prop": {
                        "positions": [-1, -1, 0, 1, -1, 0, 1, 1, 0, -1, 1, 0],
                        "indices": [0, 1, 2, 0, 2, 3],
                        "uvs": [0, 0, 1, 0, 1, 1, 0, 1],
                        "surface": {"impl": "matte", "prop": {"Kd": kd_texture}},
                    },
                }
            ],
        }
    }


class TestImageTexture:
    def test_image_colors_visible(self, tmp_path):
        # 2x2 image: distinct quadrant colors
        img = np.zeros((2, 2, 3), np.float32)
        img[0, 0] = [1, 0, 0]
        img[0, 1] = [0, 1, 0]
        img[1, 0] = [0, 0, 1]
        img[1, 1] = [1, 1, 0]
        p = tmp_path / "t.exr"
        imageio.save_exr(p, img)
        tex = {"impl": "image", "prop": {"file": str(p)}}
        scene = lr.Scene.from_dict(_plane_scene(tmp_path, tex, res=48, spp=16))
        out = lr.render(scene)["tex.exr"]
        # quadrants (v=0 at bottom of uv -> top/bottom depend on camera flip)
        q_colors = [
            out[8:16, 8:16].mean(axis=(0, 1)),
            out[8:16, 32:40].mean(axis=(0, 1)),
            out[32:40, 8:16].mean(axis=(0, 1)),
            out[32:40, 32:40].mean(axis=(0, 1)),
        ]
        # all four quadrant colors present somewhere (dominant channel test)
        dominants = {int(np.argmax(c)) for c in q_colors if c.sum() > 0.05}
        assert len(dominants) >= 2

    def test_atlas_multiple_images(self, tmp_path):
        imgs = []
        for i, c in enumerate([[1, 0, 0], [0, 1, 0]]):
            a = np.broadcast_to(np.asarray(c, np.float32), (4, 4, 3)).copy()
            p = tmp_path / f"i{i}.exr"
            imageio.save_exr(p, a)
            imgs.append(str(p))
        d = _plane_scene(tmp_path, {"impl": "image", "prop": {"file": imgs[0]}})
        # second texture on a second quad off-screen shares the atlas
        d["render"]["shapes"].append(
            {
                "impl": "inlinemesh",
                "prop": {
                    "positions": [10, -1, 0, 12, -1, 0, 12, 1, 0, 10, 1, 0],
                    "indices": [0, 1, 2, 0, 2, 3],
                    "uvs": [0, 0, 1, 0, 1, 1, 0, 1],
                    "surface": {
                        "impl": "matte",
                        "prop": {"Kd": {"impl": "image", "prop": {"file": imgs[1]}}},
                    },
                },
            }
        )
        scene = lr.Scene.from_dict(d)
        compiled = lr.compile_scene(scene)
        assert compiled.arrays["texture_atlas_rects"].shape[0] == 2
        out = scene.integrator.render(compiled)["tex.exr"]
        center = out[16, 16]
        assert center[0] > 0.5 and center[1] < 0.2  # red texture visible


class TestProceduralTextures:
    def test_checkerboard(self, tmp_path):
        tex = {
            "impl": "checkerboard",
            "prop": {
                "on": {"impl": "constant", "prop": {"v": [1.0, 1.0, 1.0]}},
                "off": {"impl": "constant", "prop": {"v": [0.0, 0.0, 0.0]}},
                "uv_scale": [4.0, 4.0],
            },
        }
        scene = lr.Scene.from_dict(_plane_scene(tmp_path, tex, res=64, spp=8))
        out = lr.render(scene)["tex.exr"]
        lum = out.mean(-1)
        center = lum[16:48, 16:48]
        # roughly half bright, half dark
        bright = (center > center.mean()).mean()
        assert 0.3 < bright < 0.7

    def test_swizzle(self, tmp_path):
        base = {"impl": "constant", "prop": {"v": [0.9, 0.1, 0.5]}}
        tex = {"impl": "swizzle", "prop": {"base": base, "swizzle": "zyx"}}
        scene = lr.Scene.from_dict(_plane_scene(tmp_path, tex, res=16, spp=16))
        out = lr.render(scene)["tex.exr"]
        c = out[8, 8]
        assert c[0] < c[2]  # red/blue swapped

    def test_scale(self, tmp_path):
        base = {"impl": "constant", "prop": {"v": [0.5, 0.5, 0.5]}}
        tex = {"impl": "scale", "prop": {"base": base, "scale": [2.0, 1.0, 0.2, 1.0]}}
        scene = lr.Scene.from_dict(_plane_scene(tmp_path, tex, res=16, spp=16))
        out = lr.render(scene)["tex.exr"]
        c = out[8, 8]
        assert c[0] > 0.8 and c[2] < 0.2
