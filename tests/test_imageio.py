"""Image IO round-trip tests (util/imageio equivalents)."""

import numpy as np

from luisarender_tpu.utils import imageio


class TestEXR:
    def test_roundtrip_float(self, tmp_path):
        rs = np.random.RandomState(0)
        img = rs.rand(17, 23, 3).astype(np.float32) * 10.0
        p = tmp_path / "t.exr"
        imageio.save_exr(p, img)
        back = imageio.load_exr(p)
        np.testing.assert_array_equal(back, img)

    def test_roundtrip_half(self, tmp_path):
        rs = np.random.RandomState(1)
        img = rs.rand(8, 8, 4).astype(np.float32)
        p = tmp_path / "t.exr"
        imageio.save_exr(p, img, half=True)
        back = imageio.load_exr(p)
        np.testing.assert_allclose(back, img, atol=1e-3)

    def test_single_channel(self, tmp_path):
        img = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8)
        p = tmp_path / "t.exr"
        imageio.save_exr(p, img)
        back = imageio.load_exr(p)
        np.testing.assert_array_equal(back[..., 0], img)


class TestPNG:
    def test_write_readable_by_pillow(self, tmp_path):
        img = np.zeros((4, 6, 3), np.float32)
        img[..., 0] = 1.0
        p = tmp_path / "t.png"
        imageio.save_png(p, img)
        try:
            from PIL import Image
        except ImportError:
            return
        back = np.asarray(Image.open(p))
        assert back.shape == (4, 6, 3)
        assert (back[..., 0] == 255).all()
        assert (back[..., 1] == 0).all()


class TestPFM:
    def test_roundtrip(self, tmp_path):
        rs = np.random.RandomState(2)
        img = rs.rand(9, 5, 3).astype(np.float32)
        p = tmp_path / "t.pfm"
        imageio.save_pfm(p, img)
        back = imageio.load_pfm(p)
        np.testing.assert_array_equal(back, img)


class TestIES:
    def test_parse_and_lookup(self, tmp_path):
        from luisarender_tpu.utils.ies import IESProfile

        # minimal LM-63 file: 3 vertical angles, 1 horizontal, cosine-ish lobe
        content = """IESNA:LM-63-2002
[TEST] sample
TILT=NONE
1 1000.0 1.0 3 1 1 1 0.1 0.1 0.1
1.0 1.0 60.0
0.0 90.0 180.0
0.0
1000.0 500.0 0.0
"""
        p = tmp_path / "lamp.ies"
        p.write_text(content)
        prof = IESProfile.parse(p)
        assert prof.candela.shape == (1, 3)
        # downward (theta=0) is brightest
        assert prof.intensity(0.0, 0.0) > prof.intensity(90.0, 0.0)
        assert prof.intensity(180.0, 0.0) == 0.0
        img = prof.rasterize((16, 32))
        assert img.shape == (16, 32)
        assert img.max() == 1.0
