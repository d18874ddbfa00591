"""Texture system tests: atlas packing, image sampling, procedural textures."""

import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu.utils import imageio


def _plane_scene(tmp_path, kd_texture, res=32, spp=8):
    """Orthographic-ish view of a textured quad filling the frame, lit by a
    uniform environment (so texture color reads out directly)."""
    return {
        "render": {
            "cameras": [
                {
                    "impl": "pinhole",
                    "prop": {
                        "fov": 53.2,
                        "spp": spp,
                        "file": "tex.exr",
                        "film": {"impl": "color", "prop": {"resolution": [res, res]}},
                        "transform": {
                            "impl": "view",
                            "prop": {"origin": [0, 0, 1.0], "front": [0, 0, -1]},
                        },
                    },
                }
            ],
            "integrator": {"impl": "megapath", "prop": {"depth": 2}},
            "environment": {
                "impl": "spherical",
                "prop": {
                    "emission": {"impl": "constant", "prop": {"v": [1.0, 1.0, 1.0]}}
                },
            },
            "shapes": [
                {
                    "impl": "inlinemesh",
                    "prop": {
                        "positions": [-1, -1, 0, 1, -1, 0, 1, 1, 0, -1, 1, 0],
                        "indices": [0, 1, 2, 0, 2, 3],
                        "uvs": [0, 0, 1, 0, 1, 1, 0, 1],
                        "surface": {"impl": "matte", "prop": {"Kd": kd_texture}},
                    },
                }
            ],
        }
    }


class TestImageTexture:
    def test_image_colors_visible(self, tmp_path):
        # 2x2 image: distinct quadrant colors
        img = np.zeros((2, 2, 3), np.float32)
        img[0, 0] = [1, 0, 0]
        img[0, 1] = [0, 1, 0]
        img[1, 0] = [0, 0, 1]
        img[1, 1] = [1, 1, 0]
        p = tmp_path / "t.exr"
        imageio.save_exr(p, img)
        tex = {"impl": "image", "prop": {"file": str(p)}}
        scene = lr.Scene.from_dict(_plane_scene(tmp_path, tex, res=48, spp=16))
        out = lr.render(scene)["tex.exr"]
        # quadrants (v=0 at bottom of uv -> top/bottom depend on camera flip)
        q_colors = [
            out[8:16, 8:16].mean(axis=(0, 1)),
            out[8:16, 32:40].mean(axis=(0, 1)),
            out[32:40, 8:16].mean(axis=(0, 1)),
            out[32:40, 32:40].mean(axis=(0, 1)),
        ]
        # all four quadrant colors present somewhere (dominant channel test)
        dominants = {int(np.argmax(c)) for c in q_colors if c.sum() > 0.05}
        assert len(dominants) >= 2

    def test_atlas_multiple_images(self, tmp_path):
        imgs = []
        for i, c in enumerate([[1, 0, 0], [0, 1, 0]]):
            a = np.broadcast_to(np.asarray(c, np.float32), (4, 4, 3)).copy()
            p = tmp_path / f"i{i}.exr"
            imageio.save_exr(p, a)
            imgs.append(str(p))
        d = _plane_scene(tmp_path, {"impl": "image", "prop": {"file": imgs[0]}})
        # second texture on a second quad off-screen shares the atlas
        d["render"]["shapes"].append(
            {
                "impl": "inlinemesh",
                "prop": {
                    "positions": [10, -1, 0, 12, -1, 0, 12, 1, 0, 10, 1, 0],
                    "indices": [0, 1, 2, 0, 2, 3],
                    "uvs": [0, 0, 1, 0, 1, 1, 0, 1],
                    "surface": {
                        "impl": "matte",
                        "prop": {"Kd": {"impl": "image", "prop": {"file": imgs[1]}}},
                    },
                },
            }
        )
        scene = lr.Scene.from_dict(d)
        compiled = lr.compile_scene(scene)
        # rects are per mip LEVEL; the mip table maps image -> (offset, count)
        mips = np.asarray(compiled.arrays["texture_atlas_mips"])
        assert mips.shape[0] == 2
        rects = np.asarray(compiled.arrays["texture_atlas_rects"])
        assert rects.shape[0] == mips[:, 1].sum()
        # base level of image 0 is full size; last level is 1x1
        assert (rects[mips[0, 0], 2:] >= rects[mips[0, 0] + 1, 2:]).all()
        assert (rects[mips[0, 0] + mips[0, 1] - 1, 2:] == 1).all()
        out = scene.integrator.render(compiled)["tex.exr"]
        center = out[16, 16]
        assert center[0] > 0.5 and center[1] < 0.2  # red texture visible


class TestMipLOD:
    def test_minified_checker_converges_to_gray(self, tmp_path):
        """Ray-cone LOD: a 128x128 checker viewed at ~32x minification must
        sample high mip levels and read ~0.5 gray even at 1 spp. Without
        mips every sample is a hard 0 or 1 (high variance)."""
        n = 128
        yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        checker = ((xx + yy) % 2).astype(np.float32)
        img = np.repeat(checker[..., None], 3, axis=-1)
        p = tmp_path / "checker.exr"
        imageio.save_image(str(p), img)
        # emissive quad: camera reads the texture value directly (no MC
        # lighting noise), so 1 spp isolates the texture filter itself
        d = _plane_scene(
            tmp_path, {"impl": "constant", "prop": {"v": [1, 1, 1]}}, res=8, spp=1
        )
        shape = d["render"]["shapes"][0]
        shape["prop"]["light"] = {
            "impl": "diffuse",
            "prop": {"emission": {"impl": "image", "prop": {"file": str(p)}}},
        }
        del d["render"]["environment"]
        out = lr.render(lr.Scene.from_dict(d))["tex.exr"]
        center = out[2:6, 2:6].mean(-1)
        # each 8-res pixel covers ~16 texels -> mip blend ~= mean 0.5
        assert np.all(np.abs(center - 0.5) < 0.2), center


class TestProceduralTextures:
    def test_checkerboard(self, tmp_path):
        tex = {
            "impl": "checkerboard",
            "prop": {
                "on": {"impl": "constant", "prop": {"v": [1.0, 1.0, 1.0]}},
                "off": {"impl": "constant", "prop": {"v": [0.0, 0.0, 0.0]}},
                "uv_scale": [4.0, 4.0],
            },
        }
        scene = lr.Scene.from_dict(_plane_scene(tmp_path, tex, res=64, spp=8))
        out = lr.render(scene)["tex.exr"]
        lum = out.mean(-1)
        center = lum[16:48, 16:48]
        # roughly half bright, half dark
        bright = (center > center.mean()).mean()
        assert 0.3 < bright < 0.7

    def test_swizzle(self, tmp_path):
        base = {"impl": "constant", "prop": {"v": [0.9, 0.1, 0.5]}}
        tex = {"impl": "swizzle", "prop": {"base": base, "swizzle": "zyx"}}
        scene = lr.Scene.from_dict(_plane_scene(tmp_path, tex, res=16, spp=16))
        out = lr.render(scene)["tex.exr"]
        c = out[8, 8]
        assert c[0] < c[2]  # red/blue swapped

    def test_scale(self, tmp_path):
        base = {"impl": "constant", "prop": {"v": [0.5, 0.5, 0.5]}}
        tex = {"impl": "scale", "prop": {"base": base, "scale": [2.0, 1.0, 0.2, 1.0]}}
        scene = lr.Scene.from_dict(_plane_scene(tmp_path, tex, res=16, spp=16))
        out = lr.render(scene)["tex.exr"]
        c = out[8, 8]
        assert c[0] > 0.8 and c[2] < 0.2


def test_atlas_gather_batched_matches_dense():
    """The batched 4-corner gather must match per-corner indexing in both
    value and gradient (its custom-backward experiment was removed after
    measuring a wash — see textures/image.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from luisarender_tpu.textures.image import _atlas_gather

    rng = np.random.default_rng(5)
    atlas = jnp.asarray(rng.normal(size=(16, 32, 4)).astype(np.float32))
    yi = jnp.asarray(rng.integers(0, 16, (4, 300)).astype(np.int32))
    xi = jnp.asarray(rng.integers(0, 32, (4, 300)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(4, 300, 4)).astype(np.float32))

    g_custom = jax.grad(lambda a: jnp.sum(_atlas_gather(a, yi, xi) * w))(atlas)
    g_ref = jax.grad(lambda a: jnp.sum(a[yi, xi] * w))(atlas)
    assert np.allclose(np.asarray(g_custom), np.asarray(g_ref), atol=1e-4)
    # forward unchanged
    assert np.allclose(
        np.asarray(_atlas_gather(atlas, yi, xi)), np.asarray(atlas[yi, xi])
    )
