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
