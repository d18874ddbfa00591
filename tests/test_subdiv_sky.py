"""Loop subdivision and Nishita sky tests."""

import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu.utils.loop_subdiv import loop_subdivide
from luisarender_tpu.utils.sky_precompute import precompute_sky


class TestLoopSubdiv:
    def test_tetra_smooths_toward_sphere(self):
        p = np.asarray(
            [[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], np.float32
        )
        t = np.asarray([[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]], np.int32)
        p2, t2 = loop_subdivide(p, t, 3)
        assert t2.shape[0] == 4 * 4**3
        r = np.linalg.norm(p2, axis=1)
        # subdivision smooths: radius spread shrinks vs the base tetra corners
        assert r.std() / r.mean() < 0.2
        # watertight: every edge shared by exactly two triangles
        edges = {}
        for tri in t2:
            for i in range(3):
                e = tuple(sorted((int(tri[i]), int(tri[(i + 1) % 3]))))
                edges[e] = edges.get(e, 0) + 1
        assert set(edges.values()) == {2}

    def test_shape_plugin(self):
        d = {
            "render": {
                "cameras": [
                    {
                        "impl": "pinhole",
                        "prop": {
                            "spp": 1,
                            "film": {"impl": "color", "prop": {"resolution": [8, 8]}},
                            "transform": {
                                "impl": "view",
                                "prop": {"origin": [0, 0, 4], "front": [0, 0, -1]},
                            },
                        },
                    }
                ],
                "integrator": {"impl": "normal", "prop": {}},
                "shapes": [
                    {
                        "impl": "loopsubdiv",
                        "prop": {
                            "level": 2,
                            "positions": [1, 1, 1, 1, -1, -1, -1, 1, -1, -1, -1, 1],
                            "indices": [0, 1, 2, 0, 3, 1, 0, 2, 3, 1, 3, 2],
                            "surface": {"impl": "matte", "prop": {}},
                        },
                    }
                ],
            }
        }
        scene = lr.Scene.from_dict(d)
        compiled = lr.compile_scene(scene)
        assert compiled.plan.num_tris == 4 * 16


class TestNishitaSky:
    def test_sky_properties(self):
        img = precompute_sky(resolution=(32, 64), sun_direction=(0.0, 0.5, 0.85))
        assert img.shape == (32, 64, 3)
        assert np.isfinite(img).all() and (img >= 0).all()
        sky_rows = img[:14]  # well above horizon
        # sky is blue-dominant away from the sun
        mean = sky_rows.mean(axis=(0, 1))
        assert mean[2] > mean[0], mean
        # horizon rows are brighter than zenith (longer path)
        zenith = img[:4].mean()
        horizon = img[12:16].mean()
        assert horizon > zenith

    def test_sky_environment_renders(self):
        d = {
            "render": {
                "cameras": [
                    {
                        "impl": "pinhole",
                        "prop": {
                            "spp": 2,
                            "film": {"impl": "color", "prop": {"resolution": [16, 16]}},
                            "transform": {
                                "impl": "view",
                                "prop": {"origin": [0, 1, 0], "front": [0, 0.2, -1]},
                            },
                        },
                    }
                ],
                "integrator": {"impl": "megapath", "prop": {"depth": 2}},
                "environment": {
                    "impl": "spherical",
                    "prop": {"emission": {"impl": "nishitasky", "prop": {}}},
                },
                "shapes": [
                    {
                        "impl": "inlinemesh",
                        "prop": {
                            "positions": [-50, 0, -50, 50, 0, -50, 50, 0, 50, -50, 0, 50],
                            "indices": [0, 1, 2, 0, 2, 3],
                            "surface": {"impl": "matte", "prop": {}},
                        },
                    }
                ],
            }
        }
        img = lr.render(lr.Scene.from_dict(d))["render.exr"]
        assert np.isfinite(img).all()
        assert img.mean() > 1e-4
