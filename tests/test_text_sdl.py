"""Text-format (.luisa) SDL parser tests and CLI smoke test."""

import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu.scene.node import SceneNodeError

SCENE = """
define bright 2
// a triangle lit by a constant environment
Surface white : matte {
  Kd : constant { v { 0.8, 0.8, 0.8 } }
}

Camera cam : pinhole {
  fov { 40 }
  spp { 2 }
  file { "out.exr" }
  film : color { resolution { 16, 16 } }
  transform : view {
    origin { 0, 0, 2 }
    front { 0, 0, -1 }
  }
}

render {
  cameras { @cam }
  integrator : megapath { depth { 2 } }
  environment : spherical {
    emission : constant { v { #bright, 1, 1 } }
  }
  shapes {
    @base_tri,
    @tri2
  }
}

Shape base_tri : inlinemesh {
  positions { -1, -1, 0, 1, -1, 0, 0, 1, 0 }
  indices { 0, 1, 2 }
  surface { @white }
}

Shape tri2 : inlinemesh(@base_tri) {
  positions { -1, -1, -1, 1, -1, -1, 0, 1, -1 }
}

"""


class TestTextSDL:
    def test_parse_and_render(self, tmp_path):
        p = tmp_path / "scene.luisa"
        p.write_text(SCENE)
        scene = lr.load_scene(p)
        assert len(scene.cameras) == 1
        assert len(scene.shapes) == 2
        img = lr.render(scene)["out.exr"]
        assert np.isfinite(img).all()
        # background = env (2, 1, 1)
        corner = img[0, 0]
        np.testing.assert_allclose(corner, [2.0, 1.0, 1.0], rtol=1e-3)

    def test_macro_override(self, tmp_path):
        p = tmp_path / "scene.luisa"
        p.write_text(SCENE)
        scene = lr.load_scene(p, macros={"bright": "5"})
        img = lr.render(scene)["out.exr"]
        np.testing.assert_allclose(img[0, 0], [5.0, 1.0, 1.0], rtol=1e-3)

    def test_base_inheritance(self, tmp_path):
        p = tmp_path / "scene.luisa"
        p.write_text(SCENE)
        scene = lr.load_scene(p)
        # tri2 inherits surface from base_tri via (@base_tri)
        assert scene.shapes[1].surface is scene.shapes[0].surface

    def test_import(self, tmp_path):
        (tmp_path / "mat.luisa").write_text(
            'Surface red : matte { Kd : constant { v { 1, 0, 0 } } }\n'
        )
        main = SCENE.replace("@white", "@red") + '\nimport "mat.luisa"\n'
        p = tmp_path / "scene.luisa"
        p.write_text(main)
        scene = lr.load_scene(p)
        assert scene.shapes[0].surface is not None

    def test_syntax_error(self, tmp_path):
        p = tmp_path / "bad.luisa"
        p.write_text("render { cameras }")
        with pytest.raises(SceneNodeError):
            lr.load_scene(p)


class TestCLI:
    def test_render_json(self, tmp_path, capsys):
        import json

        from luisarender_tpu import testing
        from luisarender_tpu.cli import main

        d = testing.cornell_box(resolution=(16, 16), spp=2, depth=2)
        out = tmp_path / "cli.png"
        scene_file = tmp_path / "scene.json"
        scene_file.write_text(json.dumps(d))
        rc = main([str(scene_file), "-o", str(out), "--spp", "2"])
        assert rc == 0
        assert out.exists()
