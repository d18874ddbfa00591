"""Fused whole-path Pallas megakernel (ops/fused_path.py) vs the unfused
XLA bounce loop: same scene, same sampler sequence, interpret mode on CPU.

The two paths share RNG draws and formulas but not float associativity, so
individual paths can flip at decision boundaries (RR, occlusion, alias pick);
the comparison is therefore 'almost all lanes bit-close + unbiased agreement
in the mean', not exact equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.integrators.mega_path import path_trace_batch
from luisarender_tpu.ops import fused_path


def _cornell(res=16, depth=3):
    scene = lr.Scene.from_dict(
        testing.cornell_box(resolution=(res, res), spp=4, depth=depth)
    )
    return scene, lr.compile_scene(scene)


def _trace(scene, compiled, res, si, depth):
    camera, integ = scene.cameras[0], scene.integrator
    ys, xs = jnp.meshgrid(
        jnp.arange(res), jnp.arange(res), indexing="ij"
    )
    pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(
        jnp.int32
    )
    rgb, w, stats = path_trace_batch(
        compiled, compiled.arrays, camera, integ.sampler,
        integ.light_sampler, pixel_xy, jnp.int32(si),
        max_depth=depth, rr_depth=0, rr_threshold=0.95, with_stats=True,
    )
    return np.asarray(rgb), int(stats["rays"])


class TestFusedPath:
    def test_cornell_plan_is_eligible(self):
        _, compiled = _cornell()
        assert compiled.plan.fused_path
        assert "fused" in compiled.arrays
        it = np.asarray(compiled.arrays["fused"]["inst_table"])
        # the light instance carries emission (17, 12, 4) * scale 1 (col 20)
        assert np.any(np.isclose(it[:, 20], 17.0))

    def test_unsupported_surface_is_not_eligible(self):
        # transmissive disney (specular_trans > 0) is outside the fused
        # reflective subset -> fused path disengages
        d = testing.cornell_box(resolution=(16, 16), spp=1, depth=3)
        d["render"]["shapes"][0]["prop"]["surface"] = {
            "impl": "disney",
            "prop": {
                "specular_trans": {"impl": "constant", "prop": {"v": [0.5]}}
            },
        }
        scene = lr.Scene.from_dict(d)
        compiled = lr.compile_scene(scene)
        assert not compiled.plan.fused_path

    def test_reflective_disney_is_eligible(self):
        d = testing.cornell_box(resolution=(16, 16), spp=1, depth=3)
        d["render"]["shapes"][0]["prop"]["surface"] = {
            "impl": "disney",
            "prop": {
                "metallic": {"impl": "constant", "prop": {"v": [0.8]}},
                "roughness": {"impl": "constant", "prop": {"v": [0.25]}},
            },
        }
        scene = lr.Scene.from_dict(d)
        compiled = lr.compile_scene(scene)
        assert compiled.plan.fused_path

    @pytest.mark.parametrize(
        "surf",
        [
            {"impl": "mirror",
             "prop": {"roughness": {"impl": "constant", "prop": {"v": [0.2]}}}},
            {"impl": "metal",
             "prop": {"eta": "Au",
                      "roughness": {"impl": "constant", "prop": {"v": [0.3]}}}},
            {"impl": "plastic", "prop": {}},
            {"impl": "glass", "prop": {"material": "bk7"}},
        ],
        ids=["mirror", "metal", "plastic", "glass"],
    )
    def test_surface_types_match_unfused(self, surf):
        res, depth = 16, 3
        d = testing.cornell_box(resolution=(res, res), spp=1, depth=depth)
        for s0 in d["render"]["shapes"]:
            if "surface" in s0.get("prop", {}):
                s0["prop"]["surface"] = surf
        scene = lr.Scene.from_dict(d)
        compiled = lr.compile_scene(scene)
        assert compiled.plan.fused_path
        rgb_ref, rays_ref = _trace(scene, compiled, res, 0, depth)
        fused_path.FORCE_INTERPRET = True
        try:
            rgb_f, rays_f = _trace(scene, compiled, res, 0, depth)
        finally:
            fused_path.FORCE_INTERPRET = False
        assert abs(rays_ref - rays_f) <= 4, (rays_ref, rays_f)
        frac = (np.abs(rgb_ref - rgb_f).max(-1) > 1e-3).mean()
        assert frac < 0.02, frac

    def test_mixed_types_match_unfused(self):
        res, depth = 16, 3
        d = testing.cornell_box(resolution=(res, res), spp=1, depth=depth)
        surfs = [
            {"impl": "mirror",
             "prop": {"roughness": {"impl": "constant", "prop": {"v": [0.15]}}}},
            {"impl": "glass", "prop": {"material": "bk7"}},
        ]
        k = 0
        for s0 in d["render"]["shapes"]:
            if "surface" in s0.get("prop", {}):
                if k < len(surfs):
                    s0["prop"]["surface"] = surfs[k]
                k += 1
        scene = lr.Scene.from_dict(d)
        compiled = lr.compile_scene(scene)
        assert compiled.plan.fused_path
        rgb_ref, rays_ref = _trace(scene, compiled, res, 0, depth)
        fused_path.FORCE_INTERPRET = True
        try:
            rgb_f, rays_f = _trace(scene, compiled, res, 0, depth)
        finally:
            fused_path.FORCE_INTERPRET = False
        assert abs(rays_ref - rays_f) <= 4, (rays_ref, rays_f)
        frac = (np.abs(rgb_ref - rgb_f).max(-1) > 1e-3).mean()
        assert frac < 0.02, frac

    def test_matches_unfused(self):
        res, depth = 16, 3
        scene, compiled = _cornell(res, depth)
        acc_ref = np.zeros((res * res, 3))
        acc_f = np.zeros((res * res, 3))
        rays_ref = rays_f = 0
        n_samples = 2
        for si in range(n_samples):
            rgb, rays = _trace(scene, compiled, res, si, depth)
            acc_ref += rgb
            rays_ref += rays
        fused_path.FORCE_INTERPRET = True
        try:
            assert fused_path.use_fused(
                compiled, scene.integrator.sampler,
                scene.integrator.light_sampler,
            )
            for si in range(n_samples):
                rgb, rays = _trace(scene, compiled, res, si, depth)
                acc_f += rgb
                rays_f += rays
        finally:
            fused_path.FORCE_INTERPRET = False
        img_ref = acc_ref / n_samples
        img_f = acc_f / n_samples
        # ray counts agree to boundary-flip noise
        assert abs(rays_ref - rays_f) <= max(8, rays_ref // 500), (
            rays_ref, rays_f,
        )
        # almost all lanes bit-close
        frac_diff = (np.abs(img_ref - img_f).max(-1) > 1e-3).mean()
        assert frac_diff < 0.02, frac_diff
        # unbiased agreement in the mean
        assert abs(img_ref.mean() - img_f.mean()) < 0.02 * max(
            img_ref.mean(), 1e-6
        ), (img_ref.mean(), img_f.mean())


class TestPersistentMegawave:
    """ops/fused_path.py persistent mode (megawave.cpp:300-470): in-kernel
    sample regeneration must reproduce the per-sample kernel bit-for-bit."""

    def test_matches_per_sample_sum(self):
        import jax.numpy as jnp

        from luisarender_tpu.ops import fused_path as fp

        d = testing.cornell_box(resolution=(16, 16), spp=1, depth=3)
        scene = lr.Scene.from_dict(d)
        compiled = lr.compile_scene(scene)
        integ = scene.integrator
        cam = fp.camgen_params(scene.cameras[0], 0.0)
        cam = {**cam, "sampler_seed": integ.sampler.seed & 0xFFFFFFFF}
        ys, xs = jnp.meshgrid(
            jnp.arange(16, dtype=jnp.int32), jnp.arange(16, dtype=jnp.int32),
            indexing="ij",
        )
        pxy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
        tot = 0.0
        for s in range(4):
            rgb, _ = fp.trace_paths_fused_camgen(
                compiled, compiled.arrays, cam, pxy, jnp.int32(s),
                max_depth=3, rr_depth=0, rr_threshold=0.95, interpret=True,
            )
            tot = tot + rgb
        rgb_p, _ = fp.trace_paths_fused_persistent(
            compiled, compiled.arrays, cam, pxy, jnp.int32(0), 4,
            max_depth=3, rr_depth=0, rr_threshold=0.95, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(tot), np.asarray(rgb_p), atol=1e-6
        )

    def test_megawave_integrator_matches_megapath(self):
        from luisarender_tpu.ops import fused_path as fp

        old = fp.FORCE_INTERPRET
        fp.FORCE_INTERPRET = True
        try:
            d = testing.cornell_box(
                resolution=(16, 16), spp=8, depth=3, integrator="megawave"
            )
            img_w = lr.render(lr.Scene.from_dict(d))["cornell.exr"]
            d2 = testing.cornell_box(resolution=(16, 16), spp=8, depth=3)
            img_m = lr.render(lr.Scene.from_dict(d2))["cornell.exr"]
            np.testing.assert_allclose(img_w, img_m, atol=1e-5)
        finally:
            fp.FORCE_INTERPRET = old


class TestFusedEnvironment:
    """Round-5 widening: environments in the fused kernel via pre-sampled
    NEE candidates + a deferred miss pass (fused_path._env_nee_candidates).
    Fused and unfused paths share draws, so images must agree lane-wise to
    boundary-flip noise on BOTH constant and image (alias-table) envs."""

    def _env_scene(self, env, res=16, depth=3):
        d = testing.cornell_box(resolution=(res, res), spp=4, depth=depth)
        d["render"]["environment"] = env
        scene = lr.Scene.from_dict(d)
        return scene, lr.compile_scene(scene)

    def _compare(self, env, res=16, depth=3, n_samples=2):
        scene, compiled = self._env_scene(env, res, depth)
        assert compiled.plan.fused_path, "env scene must route fused"
        acc_ref = np.zeros((res * res, 3))
        acc_f = np.zeros((res * res, 3))
        for si in range(n_samples):
            rgb, _ = _trace(scene, compiled, res, si, depth)
            acc_ref += rgb
        fused_path.FORCE_INTERPRET = True
        try:
            assert fused_path.use_fused(
                compiled, scene.integrator.sampler,
                scene.integrator.light_sampler,
            )
            for si in range(n_samples):
                rgb, _ = _trace(scene, compiled, res, si, depth)
                acc_f += rgb
        finally:
            fused_path.FORCE_INTERPRET = False
        img_ref = acc_ref / n_samples
        img_f = acc_f / n_samples
        frac_diff = (np.abs(img_ref - img_f).max(-1) > 1e-3).mean()
        assert frac_diff < 0.02, frac_diff
        assert abs(img_ref.mean() - img_f.mean()) < 0.02 * max(
            img_ref.mean(), 1e-6
        ), (img_ref.mean(), img_f.mean())
        assert img_f.mean() > 0.01

    def test_constant_env_matches_unfused(self):
        self._compare({
            "impl": "spherical",
            "prop": {
                "emission": {
                    "impl": "constant", "prop": {"v": [0.4, 0.5, 0.7]}
                }
            },
        })

    def test_image_env_matches_unfused(self, tmp_path):
        from luisarender_tpu.utils import imageio as iio

        rng = np.random.default_rng(5)
        hdr = (rng.uniform(0.05, 1.0, (8, 16, 3)) ** 2).astype(np.float32)
        hdr[2, 5] = [25.0, 20.0, 5.0]  # a bright 'sun' texel
        p = tmp_path / "env.exr"
        iio.save_exr(str(p), hdr)
        self._compare({
            "impl": "spherical",
            "prop": {
                "emission": {
                    "impl": "image", "prop": {"file": str(p)}
                }
            },
        })

    def test_env_only_scene(self):
        """No area lights at all: p_env = 1, NEE entirely via candidates."""
        d = testing.cornell_box(resolution=(16, 16), spp=4, depth=3)
        d["render"]["shapes"] = [
            s for s in d["render"]["shapes"]
            if "light" not in s.get("prop", {})
        ]
        d["render"]["environment"] = {
            "impl": "spherical",
            "prop": {
                "emission": {
                    "impl": "constant", "prop": {"v": [1.0, 0.8, 0.6]}
                }
            },
        }
        scene = lr.Scene.from_dict(d)
        compiled = lr.compile_scene(scene)
        assert compiled.plan.fused_path
        res, depth = 16, 3
        acc_ref = np.zeros((res * res, 3))
        acc_f = np.zeros((res * res, 3))
        for si in range(2):
            rgb, _ = _trace(scene, compiled, res, si, depth)
            acc_ref += rgb
        fused_path.FORCE_INTERPRET = True
        try:
            for si in range(2):
                rgb, _ = _trace(scene, compiled, res, si, depth)
                acc_f += rgb
        finally:
            fused_path.FORCE_INTERPRET = False
        assert abs(acc_ref.mean() - acc_f.mean()) < 0.02 * max(
            acc_ref.mean(), 1e-6
        )
