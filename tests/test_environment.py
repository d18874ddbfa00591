"""Environment light tests, incl. the classic white-furnace end-to-end check."""

import numpy as np
import pytest

import luisarender_tpu as lr


def _scene(env, surface=None, depth=16, res=24, spp=32, sphere_sub=3):
    surface = surface or {
        "impl": "matte",
        "prop": {"Kd": {"impl": "constant", "prop": {"v": [1.0, 1.0, 1.0]}}},
    }
    return {
        "render": {
            "cameras": [
                {
                    "impl": "pinhole",
                    "prop": {
                        "fov": 30.0,
                        "spp": spp,
                        "file": "env.exr",
                        "film": {"impl": "color", "prop": {"resolution": [res, res]}},
                        "transform": {
                            "impl": "view",
                            "prop": {"origin": [0, 0, 4], "front": [0, 0, -1]},
                        },
                    },
                }
            ],
            "integrator": {"impl": "megapath", "prop": {"depth": depth}},
            "environment": env,
            "shapes": [
                {
                    "impl": "sphere",
                    "prop": {"subdivision": sphere_sub, "surface": surface},
                }
            ],
        }
    }


class TestConstantEnvironment:
    def test_white_furnace(self):
        """Unit-albedo sphere in a unit uniform environment must vanish into
        the background: every pixel reads 1.0 (validates env sampling, NEE
        pdfs and MIS weights together)."""
        env = {
            "impl": "spherical",
            "prop": {"emission": {"impl": "constant", "prop": {"v": [1.0, 1.0, 1.0]}}},
        }
        img = lr.render(lr.Scene.from_dict(_scene(env)))["env.exr"]
        assert np.isfinite(img).all()
        np.testing.assert_allclose(img.mean(axis=(0, 1)), 1.0, atol=0.02)
        # every pixel individually close (low variance due to MIS)
        assert np.abs(img - 1.0).max() < 0.25, np.abs(img - 1.0).max()

    def test_tinted_env(self):
        env = {
            "impl": "spherical",
            "prop": {
                "emission": {"impl": "constant", "prop": {"v": [2.0, 1.0, 0.5]}}
            },
        }
        img = lr.render(lr.Scene.from_dict(_scene(env, depth=4, spp=16)))["env.exr"]
        # background pixels read the env directly
        corner = img[0, 0]
        np.testing.assert_allclose(corner, [2.0, 1.0, 0.5], rtol=1e-3)


class TestDirectionalEnvironment:
    def test_one_sided_lighting(self):
        env = {
            "impl": "directional",
            "prop": {
                "emission": {"impl": "constant", "prop": {"v": [1.0, 1.0, 1.0]}},
                "direction": [1.0, 0.0, 0.0],
                "angle": 20.0,
            },
        }
        img = lr.render(lr.Scene.from_dict(_scene(env, depth=3, spp=64)))["env.exr"]
        h, w, _ = img.shape
        # sphere occupies the center; light comes from +x (right of image)
        left = img[h // 2, w // 4].sum()
        right = img[h // 2, 3 * w // 4 - 1].sum()
        center_right = img[h // 2, w // 2 + 3].sum()
        center_left = img[h // 2, w // 2 - 3].sum()
        assert center_right > center_left * 1.5 or right > left
