"""Thin-lens and orthographic camera tests."""

import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu import testing


def _with_camera(impl, extra_props, spp=16, res=32):
    d = testing.cornell_box(resolution=(res, res), spp=spp, depth=2)
    cam = d["render"]["cameras"][0]
    cam["impl"] = impl
    cam["prop"].pop("fov", None)
    cam["prop"].update(extra_props)
    return d


class TestThinLens:
    def test_depth_of_field(self):
        """Small aperture (large f-number) is sharper than a wide one.

        Thin lens works in physical units (focal length mm, meter-scale
        scene, thin_lens.cpp:70-100), so the scene here is meter-sized."""

        def render(fnum):
            d = {
                "render": {
                    "cameras": [
                        {
                            "impl": "thinlens",
                            "prop": {
                                "aperture": fnum,
                                "focal_length": 50.0,
                                "focus_distance": 1.5,
                                "spp": 32,
                                "file": "dof.exr",
                                "film": {
                                    "impl": "color",
                                    "prop": {"resolution": [64, 64]},
                                },
                                "transform": {
                                    "impl": "view",
                                    "prop": {
                                        "origin": [0, 0, 0],
                                        "front": [0, 0, -1],
                                    },
                                },
                            },
                        }
                    ],
                    "integrator": {"impl": "megapath", "prop": {"depth": 2}},
                    "environment": {
                        "impl": "spherical",
                        "prop": {
                            "emission": {
                                "impl": "constant",
                                "prop": {"v": [1.0, 1.0, 1.0]},
                            }
                        },
                    },
                    "shapes": [
                        {
                            "impl": "inlinemesh",
                            "prop": {
                                # out-of-focus checker quad at z=-4 (focus at 2)
                                "positions": [
                                    -3, -3, -6.0, 3, -3, -6.0,
                                    3, 3, -6.0, -3, 3, -6.0,
                                ],
                                "indices": [0, 1, 2, 0, 2, 3],
                                "uvs": [0, 0, 1, 0, 1, 1, 0, 1],
                                "surface": {
                                    "impl": "matte",
                                    "prop": {
                                        "Kd": {
                                            "impl": "checkerboard",
                                            "prop": {"uv_scale": [32.0, 32.0]},
                                        }
                                    },
                                },
                            },
                        }
                    ],
                }
            }
            return lr.render(lr.Scene.from_dict(d))["dof.exr"]

        sharp = render(16.0)
        blurry = render(0.35)
        assert np.isfinite(sharp).all() and np.isfinite(blurry).all()

        # edge energy (gradient magnitude) is higher in the sharp image
        def edge_energy(img):
            g = img.mean(-1)
            return float(
                np.abs(np.diff(g, axis=0)).mean() + np.abs(np.diff(g, axis=1)).mean()
            )

        assert edge_energy(sharp) > edge_energy(blurry) * 1.2

    def test_focus_position(self):
        d = _with_camera(
            "thinlens",
            {
                "aperture": 8.0,
                "focal_length": 50.0,
                "focus_position": [278.0, 273.0, 279.0],
            },
            spp=4,
            res=16,
        )
        img = lr.render(lr.Scene.from_dict(d))["cornell.exr"]
        assert np.isfinite(img).all()
        assert img.mean() > 0.01


class TestOrtho:
    def test_renders_parallel(self):
        d = _with_camera("ortho", {"zoom": -8.2}, spp=8, res=24)
        img = lr.render(lr.Scene.from_dict(d))["cornell.exr"]
        assert np.isfinite(img).all()
        assert img.mean() > 0.005


class TestClipPlane:
    """camera.h:121-159 ClipPlaneCameraWrapper: `clip` = (near, far) at
    camera-space depth, converted per-ray to parametric t."""

    def test_far_clip_blacks_out_scene(self):
        # Cornell camera sits ~9 units from the box: far clip at depth 1
        # cuts away every surface.
        d = _with_camera("pinhole", {"fov": 27.8, "clip": [0.0, 1.0]},
                         spp=4, res=16)
        img = lr.render(lr.Scene.from_dict(d))["cornell.exr"]
        assert np.isfinite(img).all()
        assert img.max() < 1e-5

    def test_wide_clip_matches_unclipped(self):
        base = _with_camera("pinhole", {"fov": 27.8}, spp=4, res=16)
        clipped = _with_camera(
            "pinhole", {"fov": 27.8, "clip": [0.001, 1e6]}, spp=4, res=16
        )
        a = lr.render(lr.Scene.from_dict(base))["cornell.exr"]
        b = lr.render(lr.Scene.from_dict(clipped))["cornell.exr"]
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_near_clip_culls_front_geometry(self):
        # near clip beyond the back wall (~14 units): everything culled
        d = _with_camera("pinhole", {"fov": 27.8, "clip": [5000.0, 1e9]},
                         spp=4, res=16)
        img = lr.render(lr.Scene.from_dict(d))["cornell.exr"]
        assert img.max() < 1e-5
