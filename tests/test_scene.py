"""Scene description layer tests: parser, node properties, dedup, compiler."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.scene.node import SceneNodeError, SceneNodeTag
from luisarender_tpu.scene.parser import parse_scene_dict


def _minimal_scene(**extra_root):
    return {
        "render": {
            "cameras": [
                {
                    "impl": "pinhole",
                    "prop": {
                        "film": {"impl": "color", "prop": {"resolution": [8, 8]}},
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
                        "positions": [0, 0, 0, 1, 0, 0, 0, 1, 0],
                        "indices": [0, 1, 2],
                        "surface": {"impl": "matte", "prop": {}},
                    },
                }
            ],
            **extra_root,
        }
    }


class TestParser:
    def test_minimal(self):
        desc = parse_scene_dict(_minimal_scene())
        assert desc.root is not None

    def test_reference_and_dedup(self):
        d = _minimal_scene()
        d["mat"] = {
            "type": "Surface",
            "impl": "matte",
            "prop": {"Kd": {"impl": "constant", "prop": {"v": [0.5, 0.5, 0.5]}}},
        }
        d["render"]["shapes"][0]["prop"]["surface"] = "@mat"
        d["render"]["shapes"].append(
            {
                "impl": "inlinemesh",
                "prop": {
                    "positions": [0, 0, 0, 1, 0, 0, 0, 0, 1],
                    "indices": [0, 1, 2],
                    "surface": "@mat",
                },
            }
        )
        scene = lr.Scene.from_dict(d)
        assert scene.shapes[0].surface is scene.shapes[1].surface
        compiled = lr.compile_scene(scene)
        # one surface type, one row (deduped); the constant Kd hoists so the
        # handle column is dropped and only kd__src survives stacking
        assert len(compiled.plan.surface_types) == 1
        assert compiled.arrays["surfaces"][0]["kd__src"].shape[0] == 1
        assert "kd" not in compiled.arrays["surfaces"][0]

    def test_undefined_reference_raises(self):
        d = _minimal_scene()
        d["render"]["shapes"][0]["prop"]["surface"] = "@nonexistent"
        with pytest.raises(SceneNodeError):
            parse_scene_dict(d)

    def test_unknown_impl_raises(self):
        d = _minimal_scene()
        d["render"]["integrator"] = {"impl": "doesnotexist", "prop": {}}
        with pytest.raises(KeyError):
            lr.Scene.from_dict(d)

    def test_base_inheritance(self):
        d = _minimal_scene()
        d["base_tex"] = {
            "type": "Texture",
            "impl": "constant",
            "prop": {"v": [0.9, 0.1, 0.1]},
        }
        d["derived"] = {
            "type": "Surface",
            "impl": "matte",
            "base": "@base_mat",
            "prop": {},
        }
        d["base_mat"] = {
            "type": "Surface",
            "impl": "matte",
            "prop": {"Kd": "@base_tex"},
        }
        d["render"]["shapes"][0]["prop"]["surface"] = "@derived"
        scene = lr.Scene.from_dict(d)
        assert scene.shapes[0].surface.kd is not None

    def test_json_file_roundtrip(self, tmp_path):
        p = tmp_path / "scene.json"
        p.write_text(json.dumps(_minimal_scene()))
        scene = lr.load_scene(p)
        assert len(scene.cameras) == 1

    def test_import_file(self, tmp_path):
        mat = {"mat": {"type": "Surface", "impl": "matte", "prop": {}}}
        (tmp_path / "mat.json").write_text(json.dumps(mat))
        d = _minimal_scene()
        d["import"] = "mat.json"
        d["render"]["shapes"][0]["prop"]["surface"] = "@mat"
        p = tmp_path / "scene.json"
        p.write_text(json.dumps(d))
        scene = lr.load_scene(p)
        assert scene.shapes[0].surface is not None

    def test_tag_conflict(self):
        d = _minimal_scene()
        d["thing"] = {"type": "Surface", "impl": "matte", "prop": {}}
        d["render"]["shapes"][0]["prop"]["light"] = "@thing"
        with pytest.raises(SceneNodeError):
            lr.Scene.from_dict(d)


class TestProperties:
    def test_accessors(self):
        from luisarender_tpu.scene.node import SceneNodeDesc

        n = SceneNodeDesc("x", SceneNodeTag.CAMERA)
        n.properties.update(
            {"f": 1.5, "i": 3, "b": True, "s": "hi", "v3": [1, 2, 3], "fl": [1.0, 2.0]}
        )
        assert n.float("f") == 1.5
        assert n.int("i") == 3
        assert n.bool("b") is True
        assert n.string("s") == "hi"
        assert n.float3("v3") == (1.0, 2.0, 3.0)
        assert n.float_list("fl") == [1.0, 2.0]
        assert n.float("missing", 7.0) == 7.0
        # scalar broadcast to vector
        n.properties["scalar"] = 2.0
        assert n.float3("scalar") == (2.0, 2.0, 2.0)


class TestCompiler:
    def test_cornell_compile(self):
        scene = lr.Scene.from_dict(testing.cornell_box())
        compiled = lr.compile_scene(scene)
        plan = compiled.plan
        assert plan.num_lights == 1
        assert plan.num_instances == 8
        assert plan.num_tris == 2 * 5 + 10 + 10 + 2
        assert not plan.has_environment
        inst = compiled.arrays["instances"]
        assert int(inst["light_tag"][-1]) >= 0  # light quad is last
        assert all(int(t) >= 0 for t in inst["surface_tag"])
        # light alias table pdf ~ areas
        entries = compiled.arrays["light_entries"]
        assert float(entries["total_area"][0]) == pytest.approx(130 * 105, rel=1e-3)

    def test_shade_table_matches_raw_arrays(self):
        """The packed slot-ordered shade table (scene/geometry.py) must agree
        with the raw vertex/triangle arrays it was packed from."""
        scene = lr.Scene.from_dict(testing.cornell_box())
        compiled = lr.compile_scene(scene)
        a = compiled.arrays
        table = np.asarray(a["trace"]["shade_table"])
        order = np.asarray(a["trace"]["prim_index"])
        valid = order >= 0
        tris = np.asarray(a["triangles"])[np.maximum(order, 0)]
        vp = np.asarray(a["vertex_p"])
        vn = np.asarray(a["vertex_n"])
        vuv = np.asarray(a["vertex_uv"])
        np.testing.assert_allclose(table[valid, 0:3], vp[tris[valid, 0]], atol=1e-6)
        np.testing.assert_allclose(
            table[valid, 3:6], vp[tris[valid, 1]] - vp[tris[valid, 0]], atol=1e-6
        )
        np.testing.assert_allclose(table[valid, 13:16], vn[tris[valid, 0]], atol=1e-6)
        np.testing.assert_allclose(table[valid, 22:24], vuv[tris[valid, 0]], atol=1e-6)
        # geometric normal is unit and orthogonal to both edges
        ng = table[valid, 9:12]
        np.testing.assert_allclose((ng**2).sum(-1), 1.0, atol=1e-5)
        assert np.abs((ng * table[valid, 3:6]).sum(-1)).max() < 1e-2
        # instance ids match tri_inst; padding rows are flagged invalid
        np.testing.assert_array_equal(
            table[valid, 31].astype(np.int32),
            np.asarray(a["tri_inst"])[np.maximum(order, 0)][valid],
        )
        assert np.all(table[~valid, 32] == 0.0)
        assert np.all(table[valid, 32] == 1.0)

    def test_interaction_consistency(self):
        """surface_interaction reconstruction: p lies on the ray at t, normals
        unit, uv interpolates, instance resolves (vs direct gather formula)."""
        from luisarender_tpu.accel import traverse
        from luisarender_tpu.core.types import make_ray
        from luisarender_tpu.scene.geometry import surface_interaction

        scene = lr.Scene.from_dict(testing.cornell_box())
        compiled = lr.compile_scene(scene)
        geom = compiled.trace_geometry()
        rs = np.random.RandomState(7)
        o = np.asarray([278.0, 273.0, 279.6], np.float32) + rs.randn(
            512, 3
        ).astype(np.float32)
        d = rs.randn(512, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = make_ray(jnp.asarray(o), jnp.asarray(d))
        hit = traverse.trace_closest(geom, rays)
        it = surface_interaction(compiled.arrays, hit, rays)
        v = np.asarray(it.valid)
        assert v.sum() > 100
        p = np.asarray(it.p)[v]
        t = np.asarray(hit.t)[v]
        np.testing.assert_allclose(p, o[v] + t[:, None] * d[v], atol=1e-2)
        for n in (np.asarray(it.ng)[v], np.asarray(it.ns)[v]):
            np.testing.assert_allclose((n**2).sum(-1), 1.0, atol=1e-4)
        inst = np.asarray(it.inst)[v]
        assert inst.min() >= 0 and inst.max() < compiled.plan.num_instances

    def test_transform_applied(self):
        d = _minimal_scene()
        d["render"]["shapes"][0]["prop"]["transform"] = {
            "impl": "srt",
            "prop": {"translate": [5.0, 0.0, 0.0], "scale": [2.0, 2.0, 2.0]},
        }
        compiled = lr.compile_scene(lr.Scene.from_dict(d))
        vp = np.asarray(compiled.arrays["vertex_p"])
        np.testing.assert_allclose(vp[1], [7.0, 0.0, 0.0], atol=1e-5)
