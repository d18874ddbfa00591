"""Photon mapping (SPPM) tests: energy agreement with path tracing."""

import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu import testing


class TestPhotonMapping:
    def test_matches_path_tracer(self):
        """SPPM converges to the same image as the path tracer (both unbiased
        in the limit; compare means at moderate sample counts)."""
        d_pt = testing.cornell_box(resolution=(24, 24), spp=64, depth=5)
        ref = lr.render(lr.Scene.from_dict(d_pt))["cornell.exr"]

        d_pm = testing.cornell_box(
            resolution=(24, 24), spp=8, depth=5, integrator="photon"
        )
        d_pm["render"]["integrator"]["prop"].update(
            {"photons_per_iter": 32768, "initial_radius": 0.03}
        )
        img = lr.render(lr.Scene.from_dict(d_pm))["cornell.exr"]
        assert np.isfinite(img).all()
        assert img.mean() > 0.02
        # overall energy within 25% (biased kernel estimate + small counts)
        ratio = img.mean() / ref.mean()
        assert 0.7 < ratio < 1.35, ratio

    def test_radius_shrinks(self):
        from luisarender_tpu.integrators.megapm import PhotonMapping
        from luisarender_tpu.scene.node import SceneNodeDesc, SceneNodeTag

        r = 1.0
        alpha = 0.7
        radii = [r]
        for i in range(5):
            r = float(np.sqrt(r * r * (i + alpha) / (i + 1.0)))
            radii.append(r)
        assert all(radii[i + 1] < radii[i] for i in range(5))
