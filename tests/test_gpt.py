"""Gradient-domain path tracing tests (integrators/gpt.py vs gpt.cpp).

Checks: central mode reproduces plain PT; the gradient-domain primal is
unbiased; gradient buffers estimate the image finite differences; the L2
screened-Poisson reconstruction stays consistent with the primal.
"""

import numpy as np

import luisarender_tpu as lr
from luisarender_tpu import testing


def _gpt_scene(spp, depth=4, props=None, res=16):
    d = testing.cornell_box(resolution=(res, res), spp=spp, depth=depth)
    d["render"]["integrator"] = {
        "impl": "gpt",
        "prop": {"depth": depth, **(props or {})},
    }
    return d


def _pt_scene(spp, depth=4, res=16):
    return testing.cornell_box(resolution=(res, res), spp=spp, depth=depth)


class TestGPT:
    def test_central_radiance_matches_pt(self):
        """central_radiance mode disables the gradient machinery and must
        reproduce the plain path tracer estimator (gpt.cpp:587,769)."""
        gpt = lr.render(
            lr.Scene.from_dict(
                _gpt_scene(64, props={"central_radiance": True})
            )
        )["cornell.exr"]
        ref = lr.render(lr.Scene.from_dict(_pt_scene(64)))["cornell.exr"]
        assert abs(gpt.mean() / ref.mean() - 1.0) < 0.05

    def test_primal_is_unbiased(self):
        """The MIS-reweighted primal (central 8x emission + 2x radiance,
        neighbor splats 2x) converges to the PT image (gpt.cpp:1155-1177)."""
        gpt = lr.render(
            lr.Scene.from_dict(_gpt_scene(96, props={"reconstruct": False}))
        )["cornell.exr"]
        ref = lr.render(lr.Scene.from_dict(_pt_scene(384)))["cornell.exr"]
        assert abs(gpt.mean() / ref.mean() - 1.0) < 0.06

    def test_gradients_estimate_finite_differences(self):
        out = lr.render(
            lr.Scene.from_dict(_gpt_scene(96, props={"reconstruct": False}))
        )
        ref = lr.render(lr.Scene.from_dict(_pt_scene(384)))["cornell.exr"]
        gx = out["cornell_gradient_x.exr"]
        fd = np.zeros_like(ref)
        fd[:, :-1] = ref[:, 1:] - ref[:, :-1]
        corr = np.corrcoef(gx[:, :-1].ravel(), fd[:, :-1].ravel())[0, 1]
        assert corr > 0.75
        # magnitudes comparable (not e.g. double-counted)
        assert 0.5 < np.abs(gx).mean() / max(np.abs(fd).mean(), 1e-6) < 2.0

    def test_reconstruction_consistent_and_finite(self):
        out = lr.render(lr.Scene.from_dict(_gpt_scene(32)))
        rec = out["cornell.exr"]
        assert np.isfinite(rec).all()
        ref = lr.render(lr.Scene.from_dict(_pt_scene(384)))["cornell.exr"]
        assert abs(rec.mean() / ref.mean() - 1.0) < 0.15

    def test_aux_buffers_emitted(self):
        out = lr.render(lr.Scene.from_dict(_gpt_scene(8)))
        for key in (
            "cornell_gradient_x.exr",
            "cornell_gradient_y.exr",
            "cornell_effective.exr",
        ):
            assert key in out and np.isfinite(out[key]).all()


def _glass_scene(spp, depth=6, integrator="megapath", props=None, res=16):
    """Cornell box with a glass sphere covering much of the view — exercises
    the transmissive half-vector shift (gpt.cpp:301-337)."""
    d = testing.cornell_box(resolution=(res, res), spp=spp, depth=depth)
    d["render"]["shapes"].append(
        {
            "impl": "sphere",
            "prop": {
                "subdivision": 3,
                "surface": {
                    "impl": "glass",
                    "prop": {
                        "eta": {"impl": "constant", "prop": {"v": [1.5]}}
                    },
                },
                "transform": {
                    "impl": "srt",
                    "prop": {
                        "scale": [120, 120, 120],
                        "translate": [278, 200, 279],
                    },
                },
            },
        }
    )
    if integrator == "gpt":
        d["render"]["integrator"] = {
            "impl": "gpt",
            "prop": {"depth": depth, **(props or {})},
        }
    return d


class TestGPTTransmissive:
    def test_primal_unbiased_through_glass(self):
        """Transmissive shifts must not bias the MIS-reweighted primal
        (gpt.cpp:301-337 + 605-645: shifted pdfs only reweight)."""
        gpt = lr.render(
            lr.Scene.from_dict(
                _glass_scene(96, integrator="gpt", props={"reconstruct": False})
            )
        )["cornell.exr"]
        ref = lr.render(lr.Scene.from_dict(_glass_scene(256)))["cornell.exr"]
        assert np.isfinite(gpt).all()
        assert abs(gpt.mean() / ref.mean() - 1.0) < 0.08

    def test_gradients_track_fd_through_glass(self):
        """VERDICT item 5 'done' bar: gradient buffers through a glass object
        agree with finite differences of the converged primal."""
        out = lr.render(
            lr.Scene.from_dict(
                _glass_scene(128, integrator="gpt", props={"reconstruct": False})
            )
        )
        ref = lr.render(lr.Scene.from_dict(_glass_scene(384)))["cornell.exr"]
        gx = out["cornell_gradient_x.exr"]
        fd = np.zeros_like(ref)
        fd[:, :-1] = ref[:, 1:] - ref[:, :-1]
        corr = np.corrcoef(gx[:, :-1].ravel(), fd[:, :-1].ravel())[0, 1]
        assert corr > 0.5
        assert 0.3 < np.abs(gx).mean() / max(np.abs(fd).mean(), 1e-6) < 3.0
