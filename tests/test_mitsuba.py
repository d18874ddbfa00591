"""Mitsuba XML converter (tools/mitsuba2scene.py): property grammar,
transforms, bsdf mapping, and an end-to-end render of a converted scene
(the reference converts Mitsuba scenes via tools/mitsuba2tungsten.py +
tools/tungsten2luisa.py; VERDICT item 10 asks for a Mitsuba-origin scene to
render)."""

import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu.tools import mitsuba2scene as m2s

XML = """<?xml version="1.0"?>
<scene version="0.6.0">
    <default name="spp" value="8"/>
    <integrator type="path">
        <integer name="max_depth" value="5"/>
    </integrator>
    <sensor type="perspective">
        <float name="fov" value="60"/>
        <transform name="to_world">
            <lookat origin="0, 1.2, -3.5" target="0, 0.5, 0" up="0, 1, 0"/>
        </transform>
        <film type="hdrfilm">
            <integer name="width" value="48"/>
            <integer name="height" value="32"/>
        </film>
        <sampler type="independent">
            <integer name="sample_count" value="$spp"/>
        </sampler>
    </sensor>
    <bsdf type="twosided" id="floor-mat">
        <bsdf type="diffuse">
            <rgb name="reflectance" value="0.6, 0.6, 0.55"/>
        </bsdf>
    </bsdf>
    <bsdf type="roughconductor" id="metal-mat">
        <string name="material" value="Au"/>
        <float name="alpha" value="0.09"/>
    </bsdf>
    <shape type="rectangle">
        <transform name="to_world">
            <scale value="3"/>
            <rotate x="1" y="0" z="0" angle="-90"/>
        </transform>
        <ref id="floor-mat"/>
    </shape>
    <shape type="sphere">
        <float name="radius" value="0.5"/>
        <point name="center" x="0" y="0.5" z="0"/>
        <ref id="metal-mat"/>
    </shape>
    <shape type="cube">
        <transform name="to_world">
            <scale value="0.3"/>
            <translate x="1.1" y="0.3" z="0.4"/>
        </transform>
        <bsdf type="plastic">
            <rgb name="diffuse_reflectance" value="0.2, 0.3, 0.7"/>
        </bsdf>
    </shape>
    <shape type="rectangle">
        <transform name="to_world">
            <rotate x="1" y="0" z="0" angle="90"/>
            <translate y="3"/>
        </transform>
        <emitter type="area">
            <rgb name="radiance" value="8, 8, 7"/>
        </emitter>
    </shape>
    <emitter type="constant">
        <rgb name="radiance" value="0.1, 0.12, 0.15"/>
    </emitter>
</scene>
"""


@pytest.fixture
def doc(tmp_path):
    p = tmp_path / "scene.xml"
    p.write_text(XML)
    return m2s.convert(str(p), str(tmp_path / "out.json"))


class TestMitsubaConvert:
    def test_defaults_and_sampler(self, doc):
        assert doc["render"]["cameras"][0]["prop"]["spp"] == 8

    def test_integrator(self, doc):
        assert doc["render"]["integrator"]["impl"] == "megapath"
        assert doc["render"]["integrator"]["prop"]["depth"] == 5

    def test_fov_axis_conversion(self, doc):
        # 60 deg horizontal at 48x32 -> vertical fov < 60
        fov = doc["render"]["cameras"][0]["prop"]["fov"]
        assert 35.0 < fov < 45.0, fov

    def test_bsdf_mapping(self, doc):
        shapes = doc["render"]["shapes"]
        floor = shapes[0]["prop"]["surface"]
        assert floor["impl"] == "matte" and floor["prop"]["two_sided"]
        metal = shapes[1]["prop"]["surface"]
        assert metal["impl"] == "metal"
        assert metal["prop"]["material"] == "Au"
        cube = shapes[2]["prop"]["surface"]
        assert cube["impl"] == "plastic"

    def test_area_emitter_and_env(self, doc):
        light_shape = doc["render"]["shapes"][3]
        assert light_shape["prop"]["light"]["impl"] == "diffuse"
        assert doc["render"]["environment"]["impl"] == "spherical"

    def test_rectangle_transform(self, doc):
        # floor: scale 3 then rotate -90 about x -> lies in y=0 plane
        pos = np.asarray(doc["render"]["shapes"][0]["prop"]["positions"])
        pos = pos.reshape(-1, 3)
        assert np.abs(pos[:, 1]).max() < 1e-6
        assert np.abs(pos[:, 0]).max() == pytest.approx(3.0, abs=1e-6)

    def test_end_to_end_render(self, doc):
        scene = lr.Scene.from_dict(doc)
        img = next(iter(lr.render(scene).values()))
        img = np.asarray(img)
        assert img.shape == (32, 48, 3)
        assert np.isfinite(img).all()
        assert img.mean() > 0.02  # lit scene
        # gold sphere region should be warm (R > B on average)
        assert img[..., 0].mean() > img[..., 2].mean() * 0.9
