"""Motion blur: shutter buckets + lerp (keyframed) transforms."""

import numpy as np
import pytest

import luisarender_tpu as lr


def _scene(shutter=True):
    """A small bright quad that moves horizontally across the frame."""
    move = {
        "impl": "lerp",
        "prop": {
            "transforms": [
                {"impl": "srt", "prop": {"translate": [-0.6, 0.0, 0.0]}},
                {"impl": "srt", "prop": {"translate": [0.6, 0.0, 0.0]}},
            ],
            "time_points": [0.0, 1.0],
        },
    }
    cam_prop = {
        "fov": 45.0,
        "spp": 16,
        "file": "mb.exr",
        "film": {"impl": "color", "prop": {"resolution": [48, 16]}},
        "transform": {
            "impl": "view",
            "prop": {"origin": [0, 0, 2.5], "front": [0, 0, -1]},
        },
    }
    if shutter:
        cam_prop["shutter_span"] = [0.0, 1.0]
        cam_prop["shutter_samples"] = 6
    return {
        "render": {
            "cameras": [{"impl": "pinhole", "prop": cam_prop}],
            "integrator": {"impl": "megapath", "prop": {"depth": 2}},
            "shapes": [
                {
                    "impl": "inlinemesh",
                    "prop": {
                        "positions": [
                            -0.15, -0.5, 0, 0.15, -0.5, 0, 0.15, 0.5, 0,
                            -0.15, 0.5, 0,
                        ],
                        "indices": [0, 1, 2, 0, 2, 3],
                        "surface": {"impl": "matte", "prop": {}},
                        "light": {
                            "impl": "diffuse",
                            "prop": {
                                "emission": {
                                    "impl": "constant",
                                    "prop": {"v": [5.0, 5.0, 5.0]},
                                }
                            },
                        },
                        "transform": move,
                    },
                }
            ],
        }
    }


class TestMotionBlur:
    def test_blur_widens_footprint(self):
        static = lr.render(lr.Scene.from_dict(_scene(shutter=False)))["mb.exr"]
        blurred = lr.render(lr.Scene.from_dict(_scene(shutter=True)))["mb.exr"]
        assert np.isfinite(blurred).all()

        def lit_columns(img):
            return (img.sum(axis=(0, 2)) > 0.01).sum()

        # the moving quad smears across many more columns with the shutter open
        assert lit_columns(blurred) > lit_columns(static) * 2
        # energy per bucket averages to roughly the same total
        assert blurred.sum() == pytest.approx(static.sum(), rel=0.35)
