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


class TestAOVMultiBuffer:
    """Reference multi-buffer mode: components + dump strategies
    (aov.cpp:383-430)."""

    def test_power2_dump_counts_and_buffers(self):
        scene = _cornell(
            "aov", spp=4, noisy_count=4,
            components=["sample", "diffuse", "specular", "normal", "depth",
                        "mask", "ndc"],
            dump="power2",
        )
        results = lr.render(scene)
        # dumps at samples 1, 2, 4 for each of the 7 components
        assert len(results) == 21
        assert "cornell_sample_00004.exr" in results
        assert "cornell_mask_00001.exr" in results
        img = results["cornell_sample_00004.exr"]
        assert img.shape == (24, 24, 3) and np.isfinite(img).all()
        assert img.mean() > 0.01
        # diffuse + specular = sample (same paths, split accumulators)
        d = results["cornell_diffuse_00004.exr"]
        s = results["cornell_specular_00004.exr"]
        assert np.allclose(d + s, img, rtol=1e-4, atol=1e-5)
        # cornell is all-matte: everything is diffuse
        assert np.abs(s).max() < 1e-5
        depth = results["cornell_depth_00004.exr"]
        assert depth.shape == (24, 24, 1)
        assert depth[12, 12, 0] > 0.1  # back wall is away from the camera
        mask = results["cornell_mask_00004.exr"]
        assert mask.max() <= 1.0 + 1e-6 and mask[12, 12, 0] > 0.99

    def test_final_dump_naming(self, tmp_path):
        scene = _cornell(
            "aov", spp=2, noisy_count=2, components=["albedo", "roughness"],
            dump="final",
        )
        results = lr.render(scene)
        assert set(results) == {"cornell_albedo.exr", "cornell_roughness.exr"}
        assert results["cornell_roughness.exr"].shape == (24, 24, 2)
        a = results["cornell_albedo.exr"]
        # matte cornell: red/green walls show in first-bounce albedo
        assert a.max() > 0.3

    def test_save_writes_exrs(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        scene = _cornell(
            "aov", spp=1, noisy_count=1, components=["normal"], dump="final"
        )
        results = scene.integrator.render(
            lr.compile_scene(scene), save=True
        )
        from luisarender_tpu.utils.imageio import load_image

        (path,) = results
        on_disk = load_image(str(tmp_path / path))
        assert np.allclose(on_disk, results[path], atol=1e-6)
