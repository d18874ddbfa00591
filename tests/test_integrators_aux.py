"""Tests for the auxiliary integrators: normal, direct, aov, group."""

import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu import testing


def _cornell(integrator, res=24, spp=4, **props):
    d = testing.cornell_box(resolution=(res, res), spp=spp, depth=3)
    d["render"]["integrator"] = {"impl": integrator, "prop": props}
    return lr.Scene.from_dict(d)


class TestNormal:
    def test_normals_remapped(self):
        img = lr.render(_cornell("normal"))["cornell.exr"]
        assert np.isfinite(img).all()
        # remapped normals live in [0, 1]; background is 0
        assert img.max() <= 1.0 + 1e-5
        # back wall faces camera: normal ~ (0,0,-1) -> rgb ~ (.5,.5,0)
        center = img[12, 12]
        assert abs(center[0] - 0.5) < 0.1 and abs(center[1] - 0.5) < 0.1
        assert center[2] < 0.2


class TestDirect:
    @pytest.mark.parametrize("mode", ["light", "surface", "both"])
    def test_modes_agree(self, mode):
        img = lr.render(_cornell("direct", spp=64, importance_sampling=mode))[
            "cornell.exr"
        ]
        assert np.isfinite(img).all()
        assert img.mean() > 0.01
        if not hasattr(TestDirect, "_ref"):
            TestDirect._ref = {}
        TestDirect._ref[mode] = img.mean()

    def test_estimators_consistent(self):
        # all three estimators target the same integral
        vals = getattr(TestDirect, "_ref", {})
        if len(vals) == 3:
            v = list(vals.values())
            assert max(v) / max(min(v), 1e-9) < 1.25, vals

    def test_less_than_global(self):
        direct = lr.render(_cornell("direct", spp=32))["cornell.exr"]
        full = lr.render(_cornell("megapath", spp=32, depth=5))["cornell.exr"]
        # direct-only must not exceed full GI (up to noise)
        assert direct.mean() <= full.mean() * 1.05


class TestAOV:
    def test_mask(self):
        img = lr.render(_cornell("aov", variant="mask"))["cornell.exr"]
        # binary except at silhouette/border pixels where filter jitter mixes
        # hit and miss samples (the Cornell box is open at the front)
        binary_frac = np.isin(np.round(img, 3), [0.0, 1.0]).mean()
        assert binary_frac > 0.8
        assert img.mean() > 0.9  # box fills the view

    def test_depth(self):
        img = lr.render(_cornell("aov", variant="depth"))["cornell.exr"]
        inside = img[img > 0]
        assert inside.min() > 100 and inside.max() < 3000

    def test_albedo(self):
        img = lr.render(_cornell("aov", variant="albedo"))["cornell.exr"]
        # left column red-ish, right green-ish (wall albedos)
        left = img[12, 2]
        right = img[12, 21]
        assert left[0] > left[1]
        assert right[1] > right[0]


class TestGroup:
    def test_runs_children(self):
        d = testing.cornell_box(resolution=(16, 16), spp=2, depth=2)
        d["render"]["integrator"] = {
            "impl": "group",
            "prop": {
                "integrators": [
                    {"impl": "normal", "prop": {}},
                    {"impl": "megapath", "prop": {"depth": 2}},
                ]
            },
        }
        out = lr.render(lr.Scene.from_dict(d))
        assert len(out) >= 1
