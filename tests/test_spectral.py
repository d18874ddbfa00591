"""Hero-wavelength spectral rendering tests: up/down-conversion round trips
(SURVEY.md §4), wavelength sampling, and spectral-vs-RGB render agreement."""

import jax.numpy as jnp
import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.core import rgb2spec
from luisarender_tpu.spectra.hero import (
    HeroWavelengthSpectrum,
    sample_visible,
    visible_pdf,
)


class TestRGB2Spec:
    def test_roundtrip_batch(self):
        rs = np.random.RandomState(1)
        rgb = rs.rand(128, 3) * 0.9 + 0.05
        c = rgb2spec.fit_rgb(rgb)
        basis = np.stack([rgb2spec._x**2, rgb2spec._x, np.ones_like(rgb2spec._x)])
        s = rgb2spec._sigmoid(c.astype(np.float64) @ basis)
        back = s @ rgb2spec._W.T
        assert np.abs(back - rgb).mean() < 5e-3

    def test_spectrum_in_unit_range(self):
        c = rgb2spec.fit_rgb(np.asarray([[0.9, 0.2, 0.4]]))
        lam = np.linspace(360.0, 830.0, 100)[None]
        s = np.asarray(rgb2spec.eval_spectrum(jnp.asarray(c), jnp.asarray(lam)))
        assert (s >= 0).all() and (s <= 1).all()


class TestWavelengthSampling:
    def test_pdf_normalized(self):
        lam = jnp.linspace(360.0, 830.0, 2000)
        integral = float(jnp.trapezoid(visible_pdf(lam), lam))
        assert abs(integral - 1.0) < 0.02

    def test_inverse_cdf_consistency(self):
        u = jnp.linspace(1e-4, 1 - 1e-4, 1000)
        lam = sample_visible(u)
        assert float(lam.min()) > 330 and float(lam.max()) < 860
        # monotone mapping
        assert bool(jnp.all(jnp.diff(lam) > 0))

    def test_hero_rotation(self):
        model = HeroWavelengthSpectrum(dimension=4, lut_res=8)
        swl = model.sample_wavelengths(jnp.full((16, 1), 0.37))
        lam = np.asarray(swl.lam)
        pdf = np.asarray(swl.pdf)
        assert lam.shape == (16, 4)
        assert (lam >= 330).all() and (lam <= 860).all()
        assert len(np.unique(np.round(lam[0]))) == 4  # distinct channels
        # pdf matches the marginal at each rotated wavelength
        np.testing.assert_allclose(pdf[0], np.asarray(visible_pdf(swl.lam))[0])


class TestHeroDecode:
    @pytest.fixture(scope="class")
    def model(self):
        return HeroWavelengthSpectrum(dimension=4, lut_res=16)

    def test_albedo_roundtrip_mc(self, model):
        """MC estimate of srgb(decode_albedo(rgb)) under an equal-energy
        illuminant ~ rgb (up/down-conversion round trip)."""
        rs = np.random.RandomState(3)
        n = 1 << 14
        rgb = jnp.asarray([[0.7, 0.3, 0.15]])
        u = jnp.asarray(rs.rand(n, 1), jnp.float32)
        swl = model.sample_wavelengths(u)
        refl = model.decode_albedo(jnp.broadcast_to(rgb, (n, 3)), swl)
        illum = model.decode_illuminant(jnp.ones((n, 3)), swl)
        out = model.srgb(refl * illum, swl)
        mean = np.asarray(jnp.mean(out, axis=0))
        np.testing.assert_allclose(mean, np.asarray(rgb)[0], atol=0.04)

    def test_white_illuminant_is_white(self, model):
        rs = np.random.RandomState(4)
        n = 1 << 14
        u = jnp.asarray(rs.rand(n, 1), jnp.float32)
        swl = model.sample_wavelengths(u)
        illum = model.decode_illuminant(jnp.ones((n, 3)), swl)
        out = np.asarray(jnp.mean(model.srgb(illum, swl), axis=0))
        np.testing.assert_allclose(out, 1.0, atol=0.05)


class TestSpectralRender:
    def test_cornell_spectral_matches_rgb(self):
        d = testing.cornell_box(resolution=(24, 24), spp=48, depth=3)
        rgb_img = lr.render(lr.Scene.from_dict(d))["cornell.exr"]
        d2 = testing.cornell_box(resolution=(24, 24), spp=48, depth=3)
        d2["render"]["spectrum"] = {"impl": "hero", "prop": {"dimension": 4}}
        spec_img = lr.render(lr.Scene.from_dict(d2))["cornell.exr"]
        assert np.isfinite(spec_img).all()
        # agree to within spectral-upsampling + MC tolerance
        scale = np.abs(rgb_img).mean()
        err = np.abs(spec_img - rgb_img).mean() / max(scale, 1e-6)
        assert err < 0.25, err


def test_hero_coeff_decode_matches_lut():
    """The per-pass pre-fit coefficient decoders (round-3 constant-texture
    fast path, scene/compiler.py _hoist_spectral_coeffs) are bit-identical
    to the per-ray LUT decode they replace."""
    import jax.numpy as jnp

    from luisarender_tpu.spectra.hero import HeroWavelengthSpectrum

    spec = HeroWavelengthSpectrum(dimension=4)
    rgb = jnp.asarray([[0.7, 0.2, 0.1], [0.1, 0.9, 0.4], [1.0, 1.0, 1.0]])
    swl = spec.sample_wavelengths(jnp.asarray([[0.3], [0.6], [0.9]]))
    assert float(
        jnp.abs(
            spec.decode_albedo(rgb, swl)
            - spec.decode_albedo_coeffs(spec.coeffs_albedo(rgb), swl)
        ).max()
    ) == 0.0
    c, sc = spec.coeffs_unbounded(rgb * 3.0)
    assert float(
        jnp.abs(
            spec.decode_unbounded(rgb * 3.0, swl)
            - spec.decode_unbounded_coeffs(c, sc, swl)
        ).max()
    ) == 0.0
    ci, si = spec.coeffs_illuminant(rgb * 5.0)
    assert float(
        jnp.abs(
            spec.decode_illuminant(rgb * 5.0, swl)
            - spec.decode_illuminant_coeffs(ci, si, swl)
        ).max()
    ) == 0.0
