"""BSDF validation: white-furnace energy tests, sampling/pdf consistency,
side validation (SURVEY.md §4). Each surface's closure is exercised directly
on a synthetic interaction batch."""

import jax.numpy as jnp
import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu.core import rng
from luisarender_tpu.core.types import Interaction
from luisarender_tpu.core.sampling import UNIFORM_SPHERE_PDF, sample_uniform_sphere


def make_ctx(surface_dict):
    """Compile a one-quad scene with the given surface; return (ctx, params,
    surface_cls)."""
    scene_dict = {
        "render": {
            "cameras": [
                {
                    "impl": "pinhole",
                    "prop": {
                        "film": {"impl": "color", "prop": {"resolution": [4, 4]}},
                        "transform": {
                            "impl": "view",
                            "prop": {"origin": [0, 0, 1], "front": [0, 0, -1]},
                        },
                        "spp": 1,
                    },
                }
            ],
            "integrator": {"impl": "megapath", "prop": {}},
            "shapes": [
                {
                    "impl": "inlinemesh",
                    "prop": {
                        "positions": [-1, -1, 0, 1, -1, 0, 1, 1, 0, -1, 1, 0],
                        "indices": [0, 1, 2, 0, 2, 3],
                        "uvs": [0, 0, 1, 0, 1, 1, 0, 1],
                        "surface": surface_dict,
                    },
                }
            ],
        }
    }
    scene = lr.Scene.from_dict(scene_dict)
    compiled = lr.compile_scene(scene)
    ctx = compiled.context()
    cls = compiled.plan.surface_types[0]
    return ctx, cls, compiled


def make_it(n):
    z = jnp.zeros((n, 3))
    return Interaction(
        valid=jnp.ones(n, bool),
        inst=jnp.zeros(n, jnp.int32),
        prim=jnp.zeros(n, jnp.int32),
        p=z,
        ng=z + jnp.asarray([0.0, 0.0, 1.0]),
        ns=z + jnp.asarray([0.0, 0.0, 1.0]),
        tangent=z + jnp.asarray([1.0, 0.0, 0.0]),
        uv=jnp.full((n, 2), 0.5),
        prim_area=jnp.ones(n),
        back_facing=jnp.zeros(n, bool),
    )


def gather_params(ctx, type_index, n):
    return {
        k: v[jnp.zeros(n, jnp.int32)]
        for k, v in ctx.arrays["surfaces"][type_index].items()
    }


def uniforms(n, dim, seed):
    state = rng.xxhash32(jnp.arange(n, dtype=jnp.uint32), seed)
    us = []
    for _ in range(dim):
        state, u = rng.lcg_step(state)
        us.append(u)
    return [jnp.asarray(u) for u in us]


def sampled_reflectance(surface_dict, wo, n=1 << 15, seed=7):
    """E[f/pdf] over BSDF samples — total (hemi)spherical albedo."""
    ctx, cls, compiled = make_ctx(surface_dict)
    it = make_it(n)
    params = gather_params(ctx, 0, n)
    swl = compiled.spectrum.sample_wavelengths(jnp.zeros((n, 1)))
    wo_b = jnp.broadcast_to(jnp.asarray(wo, jnp.float32), (n, 3))
    u0, u1, u2 = uniforms(n, 3, seed)
    s = cls.sample(
        params, ctx, it, swl, wo_b, u0, jnp.stack([u1, u2], axis=-1)
    )
    contrib = jnp.where(
        (s["pdf"] > 0)[..., None], s["f"] / jnp.maximum(s["pdf"], 1e-12)[..., None], 0.0
    )
    return np.asarray(jnp.mean(contrib, axis=0)), (ctx, cls, compiled)


def uniform_reflectance(surface_dict, wo, n=1 << 15, seed=11):
    """E[f/pdf_uniform] over the whole sphere — same integral, different
    estimator; cross-validates sample() against evaluate()."""
    ctx, cls, compiled = make_ctx(surface_dict)
    it = make_it(n)
    params = gather_params(ctx, 0, n)
    swl = compiled.spectrum.sample_wavelengths(jnp.zeros((n, 1)))
    wo_b = jnp.broadcast_to(jnp.asarray(wo, jnp.float32), (n, 3))
    u1, u2 = uniforms(n, 2, seed)
    wi = sample_uniform_sphere(jnp.stack([u1, u2], axis=-1))
    e = cls.evaluate(params, ctx, it, swl, wo_b, wi)
    return np.asarray(jnp.mean(e["f"] / UNIFORM_SPHERE_PDF, axis=0))


WO = [0.3, -0.2, 0.933]


def _norm(v):
    v = np.asarray(v, np.float64)
    return (v / np.linalg.norm(v)).tolist()


class TestMatte:
    def test_white_furnace(self):
        white = {
            "impl": "matte",
            "prop": {"Kd": {"impl": "constant", "prop": {"v": [1.0, 1.0, 1.0]}}},
        }
        r, _ = sampled_reflectance(white, _norm(WO))
        np.testing.assert_allclose(r, 1.0, atol=5e-3)

    def test_sample_eval_consistent(self):
        kd = {
            "impl": "matte",
            "prop": {
                "Kd": {"impl": "constant", "prop": {"v": [0.8, 0.5, 0.3]}},
                "sigma": {"impl": "constant", "prop": {"v": [20.0]}},
            },
        }
        r_s, _ = sampled_reflectance(kd, _norm(WO))
        r_u = uniform_reflectance(kd, _norm(WO))
        np.testing.assert_allclose(r_s, r_u, rtol=0.06)

    def test_no_transmission(self):
        kd = {"impl": "matte", "prop": {}}
        ctx, cls, compiled = make_ctx(kd)
        n = 16
        it = make_it(n)
        params = gather_params(ctx, 0, n)
        swl = compiled.spectrum.sample_wavelengths(jnp.zeros((n, 1)))
        wo = jnp.broadcast_to(jnp.asarray(_norm(WO), jnp.float32), (n, 3))
        wi_below = jnp.broadcast_to(
            jnp.asarray(_norm([0.1, 0.1, -0.99]), jnp.float32), (n, 3)
        )
        e = cls.evaluate(params, ctx, it, swl, wo, wi_below)
        assert float(jnp.max(jnp.abs(e["f"]))) == 0.0
        assert float(jnp.max(e["pdf"])) == 0.0


class TestMirror:
    def test_energy_bounded_and_substantial(self):
        mirror = {
            "impl": "mirror",
            "prop": {
                "Kd": {"impl": "constant", "prop": {"v": [1.0, 1.0, 1.0]}},
                "roughness": {"impl": "constant", "prop": {"v": [0.3]}},
            },
        }
        r, _ = sampled_reflectance(mirror, _norm(WO))
        assert np.all(r <= 1.01), r
        # single-scattering GGX loses some energy; should retain most
        assert np.all(r > 0.7), r

    def test_sample_eval_consistent(self):
        mirror = {
            "impl": "mirror",
            "prop": {
                "Kd": {"impl": "constant", "prop": {"v": [0.9, 0.7, 0.4]}},
                "roughness": {"impl": "constant", "prop": {"v": [0.5]}},
            },
        }
        r_s, _ = sampled_reflectance(mirror, _norm(WO), n=1 << 16)
        r_u = uniform_reflectance(mirror, _norm(WO), n=1 << 16)
        np.testing.assert_allclose(r_s, r_u, rtol=0.08)

    def test_smooth_mirror_reflects(self):
        mirror = {"impl": "mirror", "prop": {}}
        ctx, cls, compiled = make_ctx(mirror)
        n = 8
        it = make_it(n)
        params = gather_params(ctx, 0, n)
        swl = compiled.spectrum.sample_wavelengths(jnp.zeros((n, 1)))
        wo = jnp.broadcast_to(jnp.asarray(_norm(WO), jnp.float32), (n, 3))
        u0, u1, u2 = uniforms(n, 3, 3)
        s = cls.sample(params, ctx, it, swl, wo, u0, jnp.stack([u1, u2], -1))
        expect = np.asarray([-WO[0], -WO[1], WO[2]])
        expect = expect / np.linalg.norm(expect)
        assert np.abs(np.asarray(s["wi"]) - expect).max() < 2e-2


class TestGlass:
    def test_energy_conservation(self):
        """Radiance-mode BTDF compresses transmitted radiance by 1/eta^2
        (recovered on exit via eta_scale); undo it here to check power
        conservation of refl + trans."""
        glass = {
            "impl": "glass",
            "prop": {
                "roughness": {"impl": "constant", "prop": {"v": [0.2]}},
                "material": "bk7",
            },
        }
        ctx, cls, compiled = make_ctx(glass)
        n = 1 << 16
        it = make_it(n)
        params = gather_params(ctx, 0, n)
        swl = compiled.spectrum.sample_wavelengths(jnp.zeros((n, 1)))
        wo = jnp.broadcast_to(jnp.asarray(_norm(WO), jnp.float32), (n, 3))
        u0, u1, u2 = uniforms(n, 3, 7)
        s = cls.sample(params, ctx, it, swl, wo, u0, jnp.stack([u1, u2], -1))
        pdf = np.asarray(s["pdf"])
        f = np.asarray(s["f"])
        wi = np.asarray(s["wi"])
        contrib = np.where(pdf[:, None] > 0, f / np.maximum(pdf, 1e-12)[:, None], 0)
        eta = 1.5168
        transmitted = wi[:, 2] < 0
        contrib = np.where(transmitted[:, None], contrib * eta * eta, contrib)
        r = contrib.mean(axis=0)
        assert np.all(r <= 1.03), r
        assert np.all(r > 0.85), r

    def test_transmission_happens(self):
        glass = {"impl": "glass", "prop": {"material": "bk7"}}
        ctx, cls, compiled = make_ctx(glass)
        n = 4096
        it = make_it(n)
        params = gather_params(ctx, 0, n)
        swl = compiled.spectrum.sample_wavelengths(jnp.zeros((n, 1)))
        wo = jnp.broadcast_to(jnp.asarray(_norm(WO), jnp.float32), (n, 3))
        u0, u1, u2 = uniforms(n, 3, 5)
        s = cls.sample(params, ctx, it, swl, wo, u0, jnp.stack([u1, u2], -1))
        below = np.asarray(s["wi"])[:, 2] < 0
        frac = below.mean()
        # Fresnel at ~21 deg for bk7 is ~4-5% reflective -> mostly transmit
        assert 0.8 < frac <= 1.0, frac
        events = np.asarray(s["event"])[below]
        from luisarender_tpu.surfaces.base import EVENT_ENTER

        assert (events == EVENT_ENTER).all()

    def test_named_glass_ior(self):
        from luisarender_tpu.surfaces.glass import glass_ior

        assert abs(glass_ior("bk7", 587.56) - 1.5168) < 1e-3
        assert abs(glass_ior("fused_silica", 587.56) - 1.4585) < 1e-3
        assert glass_ior("sf11", 486.13) > glass_ior("sf11", 656.27)  # dispersion
        with pytest.raises(KeyError):
            glass_ior("unobtainium", 550.0)


class TestMetal:
    def test_energy_bounded(self):
        metal = {
            "impl": "metal",
            "prop": {
                "eta": "Au",
                "roughness": {"impl": "constant", "prop": {"v": [0.3]}},
            },
        }
        r, _ = sampled_reflectance(metal, _norm(WO))
        assert np.all(r <= 1.0), r
        # gold: red reflectance much higher than blue
        assert r[0] > r[2] * 1.5, r

    def test_unknown_metal(self):
        from luisarender_tpu.surfaces.metal import metal_eta_k

        with pytest.raises(KeyError):
            metal_eta_k("adamantium")

    def test_lorentz_drude_matches_tabulated(self):
        """The closed-form Lorentz-Drude curves must land near the Johnson
        & Christy 3-point n/k values at the sRGB peak wavelengths (the two
        datasets differ by up to ~40% pointwise in the interband region, so
        the check is loose — it catches wrong oscillator parameters, sign
        errors, or unit mix-ups, all of which are off by >2x)."""
        import jax.numpy as jnp

        from luisarender_tpu.core.spectrum import SRGB_PEAK_WAVELENGTHS
        from luisarender_tpu.surfaces.metal import (
            METAL_LD, ld_eta_k, metal_eta_k,
        )

        lam = jnp.asarray(SRGB_PEAK_WAVELENGTHS)  # R, G, B (descending nm)
        for name, p in METAL_LD.items():
            n3, k3 = metal_eta_k(name)
            n_ld, k_ld = ld_eta_k(
                lam, p["wp"], jnp.asarray(p["f"]), jnp.asarray(p["g"]),
                jnp.asarray(p["w"]),
            )
            n_ld, k_ld = np.asarray(n_ld), np.asarray(k_ld)
            # k (the absorption dominating metal appearance) is the robust
            # one; n in the interband region differs more between datasets.
            assert np.all(np.abs(k_ld - k3) / k3 < 0.45), (name, k_ld, k3)
            assert np.all(np.abs(n_ld - n3) < np.maximum(0.75 * k3, 1.2)), (
                name, n_ld, n3)

    def test_lorentz_drude_dense_curve_dispersion(self):
        """Gold's LD curve must show the visible-band behavior that makes
        gold look gold: k rising steeply from blue to red, n dropping."""
        import jax.numpy as jnp

        from luisarender_tpu.surfaces.metal import METAL_LD, ld_eta_k

        lam = jnp.linspace(400.0, 700.0, 61)
        p = METAL_LD["au"]
        n, k = ld_eta_k(lam, p["wp"], jnp.asarray(p["f"]),
                        jnp.asarray(p["g"]), jnp.asarray(p["w"]))
        n, k = np.asarray(n), np.asarray(k)
        assert k[-1] > 2.5 and k[0] < 2.0  # strong red reflectance ramp
        assert n[-1] < 0.6 and n[0] > 1.0
        assert np.all(np.isfinite(n)) and np.all(np.isfinite(k))


class TestPlastic:
    def test_energy_bounded(self):
        plastic = {
            "impl": "plastic",
            "prop": {
                "Kd": {"impl": "constant", "prop": {"v": [0.7, 0.2, 0.2]}},
                "roughness": {"impl": "constant", "prop": {"v": [0.2]}},
            },
        }
        r, _ = sampled_reflectance(plastic, _norm(WO))
        assert np.all(r <= 1.02), r
        assert r[0] > r[1], r  # red-tinted substrate

    def test_sample_eval_consistent(self):
        plastic = {
            "impl": "plastic",
            "prop": {
                "Kd": {"impl": "constant", "prop": {"v": [0.6, 0.6, 0.2]}},
                "roughness": {"impl": "constant", "prop": {"v": [0.4]}},
            },
        }
        r_s, _ = sampled_reflectance(plastic, _norm(WO), n=1 << 16)
        r_u = uniform_reflectance(plastic, _norm(WO), n=1 << 16)
        np.testing.assert_allclose(r_s, r_u, rtol=0.08)


class TestMix:
    def test_blend(self):
        red = {
            "impl": "matte",
            "prop": {"Kd": {"impl": "constant", "prop": {"v": [1.0, 0.0, 0.0]}}},
        }
        blue = {
            "impl": "matte",
            "prop": {"Kd": {"impl": "constant", "prop": {"v": [0.0, 0.0, 1.0]}}},
        }
        mix = {
            "impl": "mix",
            "prop": {
                "a": red,
                "b": blue,
                "ratio": {"impl": "constant", "prop": {"v": [0.25]}},
            },
        }
        r, _ = sampled_reflectance(mix, _norm(WO))
        np.testing.assert_allclose(r, [0.25, 0.0, 0.75], atol=0.02)


class TestMicrofacet:
    def test_ggx_d_normalized(self):
        """Integral of D(wh) cos(wh) over hemisphere == 1."""
        from luisarender_tpu.core import microfacet as mf

        n = 1 << 18
        u1, u2 = uniforms(n, 2, 13)
        wh = sample_uniform_sphere(jnp.stack([u1, u2], -1))
        wh = wh * jnp.asarray([1.0, 1.0, 1.0]) * jnp.sign(wh[..., 2:3])
        alpha = jnp.full((n, 2), 0.3)
        d = mf.ggx_d(wh, alpha) * jnp.abs(wh[..., 2])
        # hemisphere measure: pdf = 1/(2pi)
        integral = float(jnp.mean(d) * 2.0 * np.pi)
        assert abs(integral - 1.0) < 0.03, integral

    def test_vndf_pdf_integrates_to_one(self):
        from luisarender_tpu.core import frame as fr
        from luisarender_tpu.core import microfacet as mf

        n = 1 << 18
        u1, u2 = uniforms(n, 2, 17)
        wh = sample_uniform_sphere(jnp.stack([u1, u2], -1))
        wh = wh * jnp.sign(wh[..., 2:3])
        wo = jnp.broadcast_to(jnp.asarray(_norm(WO), jnp.float32), (n, 3))
        alpha = jnp.full((n, 2), 0.4)
        pdf = mf.ggx_pdf(wo, wh, alpha)
        integral = float(jnp.mean(pdf) * 2.0 * np.pi)
        assert abs(integral - 1.0) < 0.03, integral

    def test_fresnel_dielectric_limits(self):
        from luisarender_tpu.core import microfacet as mf

        f0 = float(mf.fresnel_dielectric(jnp.asarray(1.0), 1.0, 1.5))
        assert abs(f0 - 0.04) < 0.005  # normal incidence ~4%
        fg = float(mf.fresnel_dielectric(jnp.asarray(0.01), 1.0, 1.5))
        assert fg > 0.9  # grazing -> 1
        # TIR from inside beyond critical angle
        ftir = float(mf.fresnel_dielectric(jnp.asarray(-0.5), 1.0, 1.5))
        assert ftir == 1.0


class TestLayered:
    def test_energy_bounded_and_coat_highlights(self):
        layered = {
            "impl": "layered",
            "prop": {
                "base": {
                    "impl": "matte",
                    "prop": {"Kd": {"impl": "constant", "prop": {"v": [0.6, 0.2, 0.2]}}},
                },
                "roughness": {"impl": "constant", "prop": {"v": [0.1]}},
                "eta": {"impl": "constant", "prop": {"v": [1.5]}},
            },
        }
        r, _ = sampled_reflectance(layered, _norm(WO), n=1 << 16)
        assert np.all(r <= 1.05), r
        assert r[0] > r[1], r  # tinted base shows through

    def test_white_furnace_closed_form(self):
        """The closed-form interreflection series (layered.py
        _transmittances): a lossless white base under an absorption-free
        coat must return ~all entering energy (the reference's stochastic
        walk conserves this by construction)."""
        layered = {
            "impl": "layered",
            "prop": {
                "base": {
                    "impl": "matte",
                    "prop": {"Kd": {"impl": "constant", "prop": {"v": [1.0, 1.0, 1.0]}}},
                },
                "roughness": {"impl": "constant", "prop": {"v": [0.1]}},
                "eta": {"impl": "constant", "prop": {"v": [1.5]}},
            },
        }
        r, _ = sampled_reflectance(layered, _norm(WO), n=1 << 16)
        # bounded by 1 (+MC noise); close to 1 up to the single-scatter GGX
        # coat's own multiple-scattering loss
        assert np.all(r <= 1.05), r
        assert np.all(r >= 0.8), r

    def test_sample_eval_consistent(self):
        layered = {
            "impl": "layered",
            "prop": {
                "base": {
                    "impl": "matte",
                    "prop": {"Kd": {"impl": "constant", "prop": {"v": [0.5, 0.5, 0.7]}}},
                },
                "roughness": {"impl": "constant", "prop": {"v": [0.3]}},
            },
        }
        r_s, _ = sampled_reflectance(layered, _norm(WO), n=1 << 16)
        r_u = uniform_reflectance(layered, _norm(WO), n=1 << 16)
        np.testing.assert_allclose(r_s, r_u, rtol=0.1, atol=0.01)

    def test_absorbing_coat_darkens(self):
        def make(sig):
            return {
                "impl": "layered",
                "prop": {
                    "base": {
                        "impl": "matte",
                        "prop": {
                            "Kd": {"impl": "constant", "prop": {"v": [0.8] * 3}}
                        },
                    },
                    "roughness": {"impl": "constant", "prop": {"v": [0.2]}},
                    "sigma_a": {"impl": "constant", "prop": {"v": [sig, sig, 0.0]}},
                },
            }

        clear, _ = sampled_reflectance(make(0.0), _norm(WO))
        tinted, _ = sampled_reflectance(make(1.0), _norm(WO))
        assert tinted[0] < clear[0] * 0.7  # absorbed channels darken
        assert tinted[2] > tinted[0]  # unabsorbed channel dominates


class TestLayeredStochastic:
    """layered.cpp:14-110 stochastic TIR walk (stochastic: true) vs the
    closed-form control (VERDICT round-1 item 7)."""

    @staticmethod
    def _mk(kd, stochastic, sigma=0.0, k=16):
        prop = {
            "base": {
                "impl": "matte",
                "prop": {"Kd": {"impl": "constant", "prop": {"v": list(kd)}}},
            },
            "roughness": {"impl": "constant", "prop": {"v": [0.1]}},
            "eta": {"impl": "constant", "prop": {"v": [1.5]}},
            "stochastic": stochastic,
            "max_depth": k,
        }
        if sigma:
            prop["sigma_a"] = {"impl": "constant", "prop": {"v": [sigma] * 3}}
        return {"impl": "layered", "prop": prop}

    def test_white_furnace_walk(self):
        r, _ = sampled_reflectance(
            self._mk([1.0, 1.0, 1.0], True), _norm(WO), n=1 << 16
        )
        assert np.all(r <= 1.05), r
        assert np.all(r >= 0.8), r

    def test_walk_matches_closed_form_high_k(self):
        """At K=16 the truncated walk retains (r_int * albedo)^16 ~ 1e-4 of
        the series — it must agree with the closed-form expectation."""
        for sigma in (0.0, 0.4):
            r_walk, _ = sampled_reflectance(
                self._mk([0.7, 0.4, 0.2], True, sigma), _norm(WO), n=1 << 16
            )
            r_closed, _ = sampled_reflectance(
                self._mk([0.7, 0.4, 0.2], False, sigma), _norm(WO), n=1 << 16
            )
            np.testing.assert_allclose(r_walk, r_closed, rtol=0.2, atol=0.03)

    def test_truncation_monotone_in_k(self):
        """More walk bounces can only add energy (every term is positive)."""
        r4, _ = sampled_reflectance(
            self._mk([0.9] * 3, True, k=2), _norm(WO), n=1 << 15
        )
        r16, _ = sampled_reflectance(
            self._mk([0.9] * 3, True, k=16), _norm(WO), n=1 << 15
        )
        assert np.all(r16 >= r4 - 0.02), (r4, r16)
