"""PSSMLT tests: converges to the path-traced image (unbiased MLT)."""

import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu import testing


class TestPSSMLT:
    def test_matches_path_tracer(self):
        d_pt = testing.cornell_box(resolution=(16, 16), spp=128, depth=4)
        ref = lr.render(lr.Scene.from_dict(d_pt))["cornell.exr"]

        d_mlt = testing.cornell_box(
            resolution=(16, 16), spp=64, depth=4, integrator="pssmlt"
        )
        d_mlt["render"]["integrator"]["prop"].update(
            {"chains": 1024, "bootstrap": 4096}
        )
        img = lr.render(lr.Scene.from_dict(d_mlt))["cornell.exr"]
        assert np.isfinite(img).all()
        assert img.mean() > 0.02
        # MLT is unbiased: total energy matches within MC tolerance
        ratio = img.mean() / ref.mean()
        assert 0.75 < ratio < 1.3, ratio
        # bright regions (light) appear in the same place
        assert abs(
            float(np.unravel_index(img.sum(-1).argmax(), (16, 16))[0])
            - float(np.unravel_index(ref.sum(-1).argmax(), (16, 16))[0])
        ) <= 2
