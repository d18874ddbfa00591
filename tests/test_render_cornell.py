"""End-to-end megakernel path-trace test on the Cornell box (PR1 config from
BASELINE.json: 64^2 @ 16 spp, diffuse-only, one area light)."""

import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu import testing


@pytest.fixture(scope="module")
def cornell_image():
    scene = lr.Scene.from_dict(testing.cornell_box(resolution=(64, 64), spp=16, depth=5))
    images = lr.render(scene)
    return images["cornell.exr"]


class TestCornellBox:
    def test_shape_and_finite(self, cornell_image):
        assert cornell_image.shape == (64, 64, 3)
        assert np.isfinite(cornell_image).all()
        assert (cornell_image >= 0).all()

    def test_not_black_not_blown_out(self, cornell_image):
        mean = cornell_image.mean()
        assert 0.02 < mean < 5.0, f"mean radiance {mean}"
        # interior should be mostly lit
        lit_fraction = (cornell_image.sum(-1) > 1e-4).mean()
        assert lit_fraction > 0.8

    def test_light_is_brightest(self, cornell_image):
        # the light is at the top middle of the image
        img = cornell_image.sum(-1)
        top_center = img[2:10, 24:40].max()
        assert top_center >= img.max() * 0.99

    def test_wall_colors(self, cornell_image):
        # left of image = red wall (x=556 side), right = green wall
        left = cornell_image[24:40, 2:8].mean(axis=(0, 1))
        right = cornell_image[24:40, 56:62].mean(axis=(0, 1))
        assert left[0] > left[1] * 1.5, f"left wall not red: {left}"
        assert right[1] > right[0] * 1.5, f"right wall not green: {right}"

    def test_deterministic(self):
        scene = lr.Scene.from_dict(
            testing.cornell_box(resolution=(32, 32), spp=4, depth=3)
        )
        a = lr.render(scene)["cornell.exr"]
        scene2 = lr.Scene.from_dict(
            testing.cornell_box(resolution=(32, 32), spp=4, depth=3)
        )
        b = lr.render(scene2)["cornell.exr"]
        np.testing.assert_array_equal(a, b)


class TestDirectAnalytic:
    def test_emitter_seen_directly(self):
        """A camera staring at a large emissive quad must read exactly the
        emission radiance (camera hit, MIS weight ~1 with pdf_bsdf=1e16)."""
        scene_dict = {
            "render": {
                "cameras": [
                    {
                        "impl": "pinhole",
                        "prop": {
                            "fov": 40.0,
                            "spp": 4,
                            "file": "emitter.exr",
                            "film": {"impl": "color", "prop": {"resolution": [16, 16]}},
                            "transform": {
                                "impl": "view",
                                "prop": {
                                    "origin": [0.0, 0.0, 2.0],
                                    "front": [0.0, 0.0, -1.0],
                                },
                            },
                        },
                    }
                ],
                "integrator": {"impl": "megapath", "prop": {"depth": 2}},
                "shapes": [
                    {
                        "impl": "inlinemesh",
                        "prop": {
                            "positions": [
                                -10.0, -10.0, 0.0, 10.0, -10.0, 0.0,
                                10.0, 10.0, 0.0, -10.0, 10.0, 0.0,
                            ],
                            "indices": [0, 1, 2, 0, 2, 3],
                            "surface": {"impl": "matte", "prop": {}},
                            "light": {
                                "impl": "diffuse",
                                "prop": {
                                    "emission": {
                                        "impl": "constant",
                                        "prop": {"v": [2.0, 3.0, 4.0]},
                                    }
                                },
                            },
                        },
                    }
                ],
            }
        }
        import luisarender_tpu as lr

        img = lr.render(lr.Scene.from_dict(scene_dict))["emitter.exr"]
        center = img[6:10, 6:10].mean(axis=(0, 1))
        np.testing.assert_allclose(center, [2.0, 3.0, 4.0], rtol=1e-3)
