"""Analytic quadric spheres (round 3): tracer merge, interaction
reconstruction, and agreement with the tessellated-mesh path."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu.accel import traverse


def _sphere_scene(analytic, subdiv=4, surface=None, res=40, depth=5):
    surface = surface or {
        "impl": "matte",
        "prop": {"Kd": {"impl": "constant", "prop": {"v": [0.8, 0.6, 0.4]}}},
    }
    return {
        "render": {
            "cameras": [
                {
                    "impl": "pinhole",
                    "prop": {
                        "fov": 35.0,
                        "spp": 8,
                        "file": "s.exr",
                        "film": {
                            "impl": "color",
                            "prop": {"resolution": [res, res]},
                        },
                        "transform": {
                            "impl": "view",
                            "prop": {
                                "origin": [0, 1.0, 4.0],
                                "front": [0, -0.15, -1.0],
                            },
                        },
                    },
                }
            ],
            "integrator": {"impl": "megapath", "prop": {"depth": depth}},
            "shapes": [
                {  # floor
                    "impl": "inlinemesh",
                    "prop": {
                        "positions": [-5, 0, -5, 5, 0, -5, 5, 0, 5, -5, 0, 5],
                        "indices": [0, 1, 2, 0, 2, 3],
                        "surface": {
                            "impl": "matte",
                            "prop": {
                                "Kd": {
                                    "impl": "constant",
                                    "prop": {"v": [0.7, 0.7, 0.7]},
                                }
                            },
                        },
                    },
                },
                {
                    "impl": "sphere",
                    "prop": {
                        "analytic": analytic,
                        "subdivision": subdiv,
                        "surface": surface,
                        "transform": {
                            "impl": "srt",
                            "prop": {
                                "scale": [0.8, 0.8, 0.8],
                                "translate": [0.0, 1.0, 0.0],
                            },
                        },
                    },
                },
                {  # light panel
                    "impl": "inlinemesh",
                    "prop": {
                        "positions": [-1, 3, -1, 1, 3, -1, 1, 3, 1, -1, 3, 1],
                        "indices": [0, 1, 2, 0, 2, 3],
                        "surface": {"impl": "matte", "prop": {}},
                        "light": {
                            "impl": "diffuse",
                            "prop": {
                                "emission": {
                                    "impl": "constant",
                                    "prop": {"v": [12.0, 12.0, 12.0]},
                                }
                            },
                        },
                    },
                },
            ],
        }
    }


def _render(d):
    scene = lr.Scene.from_dict(d)
    compiled = lr.compile_scene(scene)
    return compiled, np.asarray(
        list(scene.integrator.render(compiled).values())[0]
    )


def test_plan_counts_spheres():
    compiled, _ = _render(_sphere_scene(True, res=8, depth=2))
    assert compiled.plan.num_spheres == 1
    # sphere tris never enter the triangle pipeline
    assert compiled.plan.num_tris == 4


def test_analytic_matches_fine_mesh():
    """Analytic quadric render ~= high-subdivision icosphere render."""
    _, img_a = _render(_sphere_scene(True))
    _, img_m = _render(_sphere_scene(False, subdiv=6))
    assert np.isfinite(img_a).all()
    # same scene, same sampler: only the sphere representation differs
    assert abs(img_a.mean() - img_m.mean()) < 2e-3
    assert np.abs(img_a - img_m).mean() < 2e-3


def test_opt_out_uses_mesh():
    compiled, _ = _render(_sphere_scene(False, subdiv=3, res=8, depth=2))
    assert compiled.plan.num_spheres == 0
    assert compiled.plan.num_tris > 300


def test_trace_merge_closest_and_any():
    """Sphere-first merge: closest picks the nearer of tri/sphere; any-hit
    sees opaque spheres."""
    compiled, _ = _render(_sphere_scene(True, res=8, depth=2))
    geom = compiled.trace_geometry(compiled.arrays)
    from luisarender_tpu.core.types import Ray

    o = jnp.asarray(
        [[0.0, 1.0, 3.0], [2.5, 1.0, 3.0], [0.0, 1.0, 0.0]], jnp.float32
    )
    d = jnp.asarray(
        [[0.0, 0.0, -1.0], [0.0, 0.0, -1.0], [0.0, -1.0, 0.0]], jnp.float32
    )
    rays = Ray(
        origin=o,
        direction=d,
        t_min=jnp.zeros(3),
        t_max=jnp.full((3,), 100.0, jnp.float32),
    )
    hit = traverse.trace_closest(geom, rays)
    p_tris = geom.tri_v0.shape[0]
    # ray 0: hits the sphere (front face at z=0.8 -> t ~ 2.2)
    assert int(hit.prim[0]) >= p_tris
    assert abs(float(hit.t[0]) - 2.2) < 1e-3
    # ray 1: misses the sphere, misses the floor (parallel) -> miss
    assert int(hit.prim[1]) < 0
    # ray 2: from sphere center downward: exits sphere then floor; the
    # closest hit is the sphere's inside at t = 0.8
    assert int(hit.prim[2]) >= p_tris
    assert abs(float(hit.t[2]) - 0.8) < 1e-3
    occ = traverse.trace_any(geom, rays)
    assert bool(occ[0]) and not bool(occ[1]) and bool(occ[2])


def test_interaction_normal_uv():
    compiled, _ = _render(_sphere_scene(True, res=8, depth=2))
    geom = compiled.trace_geometry(compiled.arrays)
    from luisarender_tpu.core.types import Ray
    from luisarender_tpu.scene.geometry import surface_interaction

    o = jnp.asarray([[0.0, 1.0, 3.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    rays = Ray(origin=o, direction=d, t_min=jnp.zeros(1),
               t_max=jnp.full((1,), 100.0, jnp.float32))
    hit = traverse.trace_closest(geom, rays)
    it = surface_interaction(compiled.arrays, hit, rays)
    assert bool(it.valid[0])
    # front-center hit: normal points back at the camera (+z)
    np.testing.assert_allclose(
        np.asarray(it.ng[0]), [0.0, 0.0, 1.0], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(it.p[0]), [0.0, 1.0, 0.8], atol=1e-4
    )
    # icosphere uv convention: theta measured from the local +z axis,
    # which this front-center hit's normal lies on -> v = acos(1)/pi = 0
    assert abs(float(it.uv[0, 1])) < 1e-3
    assert int(it.inst[0]) == 1


def test_fused_mixed_matches_unfused():
    """materials.json (spheres + 5 surface types incl. disney) through the
    fused interpret-mode kernel == the general XLA path."""
    from luisarender_tpu.integrators.mega_path import path_trace_batch
    from luisarender_tpu.ops import fused_path

    path = os.path.join(
        os.path.dirname(__file__), "..", "scenes", "materials.json"
    )
    d = json.load(open(path))
    cam = d["render"]["cameras"][0]["prop"]
    cam["film"]["prop"]["resolution"] = [32, 32]
    d["render"]["integrator"]["prop"]["depth"] = 4
    scene = lr.Scene.from_dict(d)
    compiled = lr.compile_scene(scene)
    assert compiled.plan.fused_path and compiled.plan.num_spheres == 4
    integ, camera = scene.integrator, scene.cameras[0]
    n = 32 * 32
    ys, xs = jnp.meshgrid(jnp.arange(32), jnp.arange(32), indexing="ij")
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(jnp.int32)

    os.environ["LUISARENDER_TPU_NO_FUSED"] = "1"
    try:
        rgb_u, _ = path_trace_batch(
            compiled, compiled.arrays, camera, integ.sampler,
            integ.light_sampler, pix, jnp.int32(5), max_depth=4,
            rr_depth=0, rr_threshold=0.95,
        )
    finally:
        del os.environ["LUISARENDER_TPU_NO_FUSED"]
    old = fused_path.FORCE_INTERPRET
    fused_path.FORCE_INTERPRET = True
    try:
        assert fused_path.use_fused(compiled, integ.sampler, integ.light_sampler)
        rgb_f, _ = path_trace_batch(
            compiled, compiled.arrays, camera, integ.sampler,
            integ.light_sampler, pix, jnp.int32(5), max_depth=4,
            rr_depth=0, rr_threshold=0.95,
        )
    finally:
        fused_path.FORCE_INTERPRET = old
    u, f = np.asarray(rgb_u), np.asarray(rgb_f)
    assert np.abs(u - f).mean() < 1e-5
    assert (np.abs(u - f).max(-1) > 1e-2).mean() < 1e-3
