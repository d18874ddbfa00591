"""Checkpoint/resume of progressive renders (SURVEY.md §5)."""

import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu import testing


class TestCheckpoint:
    def test_resume_is_exact(self, tmp_path):
        """Interrupting after k passes and resuming yields the identical
        image (stateless sampler => exact resume)."""
        ckpt = str(tmp_path / "film.npz")

        def scene(spp):
            d = testing.cornell_box(resolution=(16, 16), spp=spp, depth=2)
            d["render"]["integrator"]["prop"].update(
                {"checkpoint_file": ckpt, "checkpoint_interval": 4,
                 "samples_per_pass": 4}
            )
            return lr.Scene.from_dict(d)

        full = lr.render(scene(8))["cornell.exr"]

        # simulate preemption: render only the first half by truncating via a
        # fresh run that loads the checkpoint written after pass 1
        data = np.load(ckpt)
        assert int(data["done"]) == 8  # final checkpoint was written

        # overwrite the checkpoint to look half-done, then resume
        np.savez(ckpt, accum=data["accum"] * 0.0, done=0, spp=8)
        # partially render 4 spp manually: emulate by writing a mid checkpoint
        d_half = testing.cornell_box(resolution=(16, 16), spp=4, depth=2)
        d_half["render"]["integrator"]["prop"]["samples_per_pass"] = 4
        # (render 4spp fresh, then place as a checkpoint of the 8spp run)
        import jax

        half_scene = lr.Scene.from_dict(d_half)
        compiled = lr.compile_scene(half_scene)
        # reuse integrator internals to get the raw accumulator
        integ = half_scene.integrator
        cam = half_scene.cameras[0]
        img_half = integ.render(compiled)["cornell.exr"]

        # resume from a *real* mid checkpoint: rerun the 8spp scene but
        # pre-seed the checkpoint with done=4 from an identical 4spp pass.
        # The film accumulator equals develop-input; reconstruct it:
        accum_half = np.concatenate(
            [img_half * 4.0, np.full((16, 16, 1), 4.0, np.float32)], axis=-1
        )
        np.savez(ckpt, accum=accum_half, done=4, spp=8)
        resumed = lr.render(scene(8))["cornell.exr"]
        np.testing.assert_allclose(resumed, full, rtol=1e-5, atol=1e-6)

    def test_mismatched_checkpoint_ignored(self, tmp_path):
        ckpt = str(tmp_path / "film.npz")
        np.savez(ckpt, accum=np.zeros((4, 4, 4), np.float32), done=2, spp=99)
        d = testing.cornell_box(resolution=(16, 16), spp=2, depth=2)
        d["render"]["integrator"]["prop"]["checkpoint_file"] = ckpt
        img = lr.render(lr.Scene.from_dict(d))["cornell.exr"]
        assert np.isfinite(img).all() and img.mean() > 0.01
