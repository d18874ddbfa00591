"""Disney BSDF validation: energy bounds, sample/eval consistency across
parameter regimes, metallic/dielectric behavior."""

import numpy as np
import pytest
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from test_surfaces import (  # noqa: E402
    WO,
    _norm,
    sampled_reflectance,
    uniform_reflectance,
)


def disney(**props):
    prop = {}
    for k, v in props.items():
        if k == "color":
            prop["color"] = {"impl": "constant", "prop": {"v": list(v)}}
        elif k == "thin":
            prop["thin"] = v
        else:
            prop[k] = {"impl": "constant", "prop": {"v": [v]}}
    return {"impl": "disney", "prop": prop}


class TestDisney:
    def test_diffuse_regime(self):
        """metallic 0, high roughness: behaves like tinted diffuse."""
        d = disney(color=(0.6, 0.3, 0.2), roughness=0.9)
        r, _ = sampled_reflectance(d, _norm(WO))
        assert np.all(r <= 1.03), r
        assert r[0] > r[1] > r[2], r

    def test_metallic_regime(self):
        """metallic 1: no diffuse; reflectance tinted by color."""
        d = disney(color=(0.9, 0.6, 0.2), metallic=1.0, roughness=0.3)
        r, _ = sampled_reflectance(d, _norm(WO), n=1 << 16)
        assert np.all(r <= 1.03), r
        assert r[0] > r[2], r
        # a metal reflects less than its color (single-scatter energy loss)
        assert r[0] < 0.95

    def test_sample_eval_consistent(self):
        cases = [
            disney(color=(0.7, 0.5, 0.3), roughness=0.5),
            disney(color=(0.8, 0.8, 0.8), metallic=0.8, roughness=0.4),
            disney(color=(0.5, 0.5, 0.9), roughness=0.3, clearcoat=1.0),
            disney(color=(0.6, 0.6, 0.6), roughness=0.4, sheen=1.0, sheen_tint=0.5),
        ]
        for d in cases:
            r_s, _ = sampled_reflectance(d, _norm(WO), n=1 << 16)
            r_u = uniform_reflectance(d, _norm(WO), n=1 << 16)
            np.testing.assert_allclose(r_s, r_u, rtol=0.12, atol=0.01)

    def test_energy_bounded_all_regimes(self):
        rs = np.random.RandomState(5)
        for _ in range(4):
            d = disney(
                color=tuple(rs.rand(3).tolist()),
                metallic=float(rs.rand()),
                roughness=float(rs.rand() * 0.8 + 0.2),
                clearcoat=float(rs.rand()),
                sheen=float(rs.rand()),
            )
            r, _ = sampled_reflectance(d, _norm(WO))
            assert np.all(r <= 1.25), (d, r)  # clearcoat+sheen add a little

    def test_spec_trans_transmits(self):
        d = disney(
            color=(1.0, 1.0, 1.0),
            roughness=0.1,
            specular_trans=1.0,
            eta=1.5,
        )
        import jax.numpy as jnp

        from test_surfaces import gather_params, make_ctx, make_it, uniforms

        ctx, cls, compiled = make_ctx(d)
        n = 4096
        it = make_it(n)
        params = gather_params(ctx, 0, n)
        swl = compiled.spectrum.sample_wavelengths(jnp.zeros((n, 1)))
        wo = jnp.broadcast_to(jnp.asarray(_norm(WO), jnp.float32), (n, 3))
        u0, u1, u2 = uniforms(n, 3, 9)
        s = cls.sample(params, ctx, it, swl, wo, u0, jnp.stack([u1, u2], -1))
        below = np.asarray(s["wi"])[:, 2] < 0
        assert below.mean() > 0.5, below.mean()  # mostly transmits

    def test_thin_diffuse_transmission(self):
        d = disney(
            color=(0.8, 0.8, 0.8),
            roughness=0.5,
            diffuse_trans=1.0,
            thin=True,
        )
        import jax.numpy as jnp

        from test_surfaces import gather_params, make_ctx, make_it, uniforms

        ctx, cls, compiled = make_ctx(d)
        n = 4096
        it = make_it(n)
        params = gather_params(ctx, 0, n)
        swl = compiled.spectrum.sample_wavelengths(jnp.zeros((n, 1)))
        wo = jnp.broadcast_to(jnp.asarray(_norm(WO), jnp.float32), (n, 3))
        u0, u1, u2 = uniforms(n, 3, 11)
        s = cls.sample(params, ctx, it, swl, wo, u0, jnp.stack([u1, u2], -1))
        wi = np.asarray(s["wi"])
        pdf = np.asarray(s["pdf"])
        below = (wi[:, 2] < 0) & (pdf > 0)
        assert below.mean() > 0.1  # some diffuse transmission happens

    def test_render_disney_cornell(self):
        """End-to-end: disney spheres render without NaN."""
        import luisarender_tpu as lr
        from luisarender_tpu import testing

        d = testing.cornell_box(resolution=(24, 24), spp=4, depth=4)
        d["render"]["shapes"].append(
            {
                "impl": "sphere",
                "prop": {
                    "subdivision": 2,
                    "surface": disney(
                        color=(0.8, 0.4, 0.2), metallic=0.7, roughness=0.3
                    ),
                    "transform": {
                        "impl": "srt",
                        "prop": {"scale": [90] * 3, "translate": [275, 100, 280]},
                    },
                },
            }
        )
        img = lr.render(lr.Scene.from_dict(d))["cornell.exr"]
        assert np.isfinite(img).all()
        assert img.mean() > 0.02
