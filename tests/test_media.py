"""Participating media tests: HG phase normalization, Beer-Lambert slab
absorption vs analytic, scattering energy behavior."""

import jax.numpy as jnp
import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu.core import rng
from luisarender_tpu.phasefunctions.hg import hg_p, hg_sample


class TestHG:
    def test_pdf_normalized(self):
        """Integral of p over the sphere == 1 for several g."""
        n = 1 << 16
        rs = np.random.RandomState(0)
        from luisarender_tpu.core.sampling import (
            UNIFORM_SPHERE_PDF,
            sample_uniform_sphere,
        )

        u = jnp.asarray(rs.rand(n, 2), jnp.float32)
        wi = sample_uniform_sphere(u)
        wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        for g in (-0.5, 0.0, 0.3, 0.8):
            cos_t = jnp.sum(wo * wi, -1)
            p = hg_p(cos_t, jnp.full((n,), g))
            integral = float(jnp.mean(p / UNIFORM_SPHERE_PDF))
            assert abs(integral - 1.0) < 0.02, (g, integral)

    def test_sample_matches_pdf(self):
        """Mean of dot(wo, wi) == -g: with wo and wi both pointing away from
        the scatter point (PBRT convention, p ~ 1/(1+g^2+2g cos)^1.5),
        forward scattering means wi ~ -wo."""
        n = 1 << 16
        rs = np.random.RandomState(1)
        u = jnp.asarray(rs.rand(n, 2), jnp.float32)
        wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        for g in (0.0, 0.4, -0.6):
            wi, pdf = hg_sample(wo, u, jnp.full((n,), g))
            mean_cos = float(jnp.mean(jnp.sum(wo * wi, -1)))
            assert abs(mean_cos + g) < 0.02, (g, mean_cos)
            # returned pdf equals p at the sampled angle
            p = hg_p(jnp.sum(wo * wi, -1), jnp.full((n,), g))
            np.testing.assert_allclose(np.asarray(pdf), np.asarray(p), rtol=1e-4)


def _slab_scene(sigma_a, sigma_s=(0.0, 0.0, 0.0), depth=16, spp=32, g=0.0):
    """Emissive quad at z=-2 seen through a medium slab between z in [-1, 1]
    bounded by null surfaces; camera at z=4 looking down -z."""
    emitter = {
        "impl": "inlinemesh",
        "prop": {
            "positions": [-9, -9, -2, 9, -9, -2, 9, 9, -2, -9, 9, -2],
            "indices": [0, 1, 2, 0, 2, 3],
            "surface": {"impl": "matte", "prop": {}},
            "light": {
                "impl": "diffuse",
                "prop": {
                    "emission": {"impl": "constant", "prop": {"v": [3.0, 3.0, 3.0]}}
                },
            },
        },
    }

    # slab: a box from z=-1 to z=1 with null surface + interior medium
    def box(z0, z1, s=8.0):
        p = []
        for z in (z0, z1):
            p += [[-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z]]
        idx = []
        # front (z1) and back (z0) faces with outward normals
        idx += [[4, 5, 6], [4, 6, 7]]  # +z face
        idx += [[1, 0, 3], [1, 3, 2]]  # -z face
        # sides
        idx += [[0, 1, 5], [0, 5, 4], [1, 2, 6], [1, 6, 5],
                [2, 3, 7], [2, 7, 6], [3, 0, 4], [3, 4, 7]]
        return (
            [c for v in p for c in v],
            [i for t in idx for i in t],
        )

    pos, idx = box(-1.0, 1.0)
    slab = {
        "impl": "inlinemesh",
        "prop": {
            "positions": pos,
            "indices": idx,
            "surface": {"impl": "null", "prop": {}},
            "medium": {
                "impl": "homogeneous",
                "prop": {
                    "sigma_a": list(sigma_a),
                    "sigma_s": list(sigma_s),
                    "phase": {"impl": "hg", "prop": {"g": g}},
                },
            },
        },
    }
    return {
        "render": {
            "cameras": [
                {
                    "impl": "pinhole",
                    "prop": {
                        "fov": 25.0,
                        "spp": spp,
                        "file": "slab.exr",
                        "film": {"impl": "color", "prop": {"resolution": [16, 16]}},
                        "transform": {
                            "impl": "view",
                            "prop": {"origin": [0, 0, 4.0], "front": [0, 0, -1]},
                        },
                    },
                }
            ],
            "integrator": {"impl": "megavpt", "prop": {"depth": depth}},
            "shapes": [emitter, slab],
        }
    }


class TestHomogeneousMedium:
    def test_beer_lambert_absorption(self):
        """Pure absorber slab of thickness 2: pixel = Le * exp(-2 sigma_a)."""
        sigma = (0.8, 0.4, 0.1)
        img = lr.render(lr.Scene.from_dict(_slab_scene(sigma, spp=64)))["slab.exr"]
        center = img[6:10, 6:10].mean(axis=(0, 1))
        expected = 3.0 * np.exp(-2.0 * np.asarray(sigma))
        np.testing.assert_allclose(center, expected, rtol=0.06)

    def test_no_medium_passthrough(self):
        """Null-surface slab with near-zero extinction: emitter unattenuated."""
        img = lr.render(
            lr.Scene.from_dict(_slab_scene((1e-6, 1e-6, 1e-6), spp=16))
        )["slab.exr"]
        center = img[6:10, 6:10].mean(axis=(0, 1))
        np.testing.assert_allclose(center, 3.0, rtol=0.02)

    def test_scattering_conserves_more_than_absorbing(self):
        """A scattering slab keeps more energy than a pure absorber of equal
        extinction (in-scattering returns light to the path)."""
        absorb = lr.render(
            lr.Scene.from_dict(_slab_scene((0.5,) * 3, (0.0,) * 3, spp=64))
        )["slab.exr"]
        scatter = lr.render(
            lr.Scene.from_dict(
                _slab_scene((0.0,) * 3, (0.5,) * 3, depth=24, spp=64)
            )
        )["slab.exr"]
        assert scatter.mean() > absorb.mean() * 1.2


def _grid_slab_scene(sigma_a, density, dims, spp=64, depth=16, sigma_s=(0, 0, 0)):
    """Same slab geometry as _slab_scene but with a heterogeneous grid medium.

    Grid bounds cover the whole slab (x, y in [-9, 9], z in [-1, 1]) so the
    density field is defined everywhere a camera ray traverses the medium."""
    scene = _slab_scene(sigma_a, sigma_s=sigma_s, spp=spp, depth=depth)
    scene["render"]["shapes"][1]["prop"]["medium"] = {
        "impl": "grid",
        "prop": {
            "sigma_a": list(sigma_a),
            "sigma_s": list(sigma_s),
            "bounds_min": [-9.0, -9.0, -1.0],
            "bounds_max": [9.0, 9.0, 1.0],
            "density": density,
            "dimensions": list(dims),
        },
    }
    return scene


class TestGridMedium:
    def test_constant_density_matches_beer_lambert(self):
        """Uniform density-1 grid must reproduce the homogeneous analytic
        result Le * exp(-2 sigma_a) (delta tracking is unbiased)."""
        sigma = (0.8, 0.4, 0.1)
        nx, ny, nz = 4, 4, 4
        density = [1.0] * (nx * ny * nz)
        img = lr.render(
            lr.Scene.from_dict(
                _grid_slab_scene(sigma, density, (nx, ny, nz), spp=128)
            )
        )["slab.exr"]
        center = img[6:10, 6:10].mean(axis=(0, 1))
        expected = 3.0 * np.exp(-2.0 * np.asarray(sigma))
        np.testing.assert_allclose(center, expected, rtol=0.12)

    def test_half_density_scales_optical_depth(self):
        """Density 0.5 halves the optical depth: Le * exp(-sigma_a)."""
        sigma = (1.0, 0.6, 0.2)
        nx, ny, nz = 2, 2, 2
        density = [0.5] * (nx * ny * nz)
        img = lr.render(
            lr.Scene.from_dict(
                _grid_slab_scene(sigma, density, (nx, ny, nz), spp=128)
            )
        )["slab.exr"]
        center = img[6:10, 6:10].mean(axis=(0, 1))
        expected = 3.0 * np.exp(-1.0 * np.asarray(sigma))
        np.testing.assert_allclose(center, expected, rtol=0.12)

    def test_linear_gradient_integrates_correctly(self):
        """Density linear in z from 0 (back) to 1 (front): trilinear lookup is
        exact for a linear field, so optical depth = sigma * integral = sigma
        (avg density 0.5 over thickness 2)."""
        sigma = (1.2, 0.5, 0.1)
        nx, ny, nz = 2, 2, 2
        # grid stored (z, y, x); z index 0 is bounds_min side (z=-1, toward
        # the emitter), z index 1 the camera side
        density = [0.0] * (nx * ny) + [1.0] * (nx * ny)
        img = lr.render(
            lr.Scene.from_dict(
                _grid_slab_scene(sigma, density, (nx, ny, nz), spp=128)
            )
        )["slab.exr"]
        center = img[6:10, 6:10].mean(axis=(0, 1))
        expected = 3.0 * np.exp(-np.asarray(sigma))
        np.testing.assert_allclose(center, expected, rtol=0.15)

    def test_scattering_grid_keeps_energy(self):
        """A purely scattering grid slab keeps more energy than an absorbing
        one of equal extinction."""
        absorb = lr.render(
            lr.Scene.from_dict(
                _grid_slab_scene((0.5,) * 3, [1.0] * 8, (2, 2, 2), spp=64)
            )
        )["slab.exr"]
        scatter = lr.render(
            lr.Scene.from_dict(
                _grid_slab_scene(
                    (0.0,) * 3, [1.0] * 8, (2, 2, 2),
                    spp=64, depth=24, sigma_s=(0.5,) * 3,
                )
            )
        )["slab.exr"]
        assert scatter.mean() > absorb.mean() * 1.2
