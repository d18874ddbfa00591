"""Blocked coherent shading dispatch (surfaces/base.py blocked_tag_apply) vs
the compute-all dispatch.

The blocked path (wave_path_v2.cpp:891-928's surface-tag counting sort,
re-imagined as in-place blocks + per-block lax.switch) must match dispatch()
to float-associativity noise: the per-lane math is the same function over
the same parameter rows, but XLA fuses/vectorizes the blocked shapes
differently, so individual lanes may differ in the last ULP.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.integrators.mega_path import path_trace_batch
from luisarender_tpu.surfaces import base as surf_base


def _render(scene_dict, spp=2):
    scene = lr.Scene.from_dict(scene_dict)
    compiled = lr.compile_scene(scene)
    integ = scene.integrator
    camera = scene.cameras[0]
    w, h = camera.film.resolution
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.int32), jnp.arange(w, dtype=jnp.int32),
        indexing="ij",
    )
    pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
    acc = 0.0
    for s in range(spp):
        rgb, _ = path_trace_batch(
            compiled, compiled.arrays, camera, integ.sampler,
            integ.light_sampler, pixel_xy, jnp.int32(s),
            max_depth=4, rr_depth=integ.rr_depth,
            rr_threshold=integ.rr_threshold,
        )
        acc = acc + rgb
    return np.asarray(acc / spp)


@pytest.mark.parametrize("block", [256, 1024])
def test_tag_sorted_shading_matches_dispatch(monkeypatch, block):
    import inspect

    d = (
        testing.cornell_box(resolution=(48, 48), spp=2, depth=4, mixed=True)
        if "mixed" in inspect.signature(testing.cornell_box).parameters
        else None
    )
    if d is None:
        import json
        import os

        path = os.path.join(
            os.path.dirname(__file__), "..", "scenes", "materials.json"
        )
        d = json.load(open(path))
        d["render"]["cameras"][0]["prop"]["film"]["prop"]["resolution"] = [48, 48]
        d["render"]["cameras"][0]["prop"]["spp"] = 2

    # reference: compute-all dispatch (the default)
    monkeypatch.delenv("LUISARENDER_TPU_TAGSORT", raising=False)
    ref = _render(d)

    # blocked path, forced on at tiny lane counts and small blocks so
    # uniform, mixed, AND dead blocks all occur at 48x48
    monkeypatch.setenv("LUISARENDER_TPU_TAGSORT", "1")
    monkeypatch.setattr(surf_base, "TAG_SORT_MIN_LANES", 0)
    import functools

    orig = surf_base.blocked_tag_apply
    monkeypatch.setattr(
        surf_base, "blocked_tag_apply", functools.partial(orig, block=block)
    )
    got = _render(d)

    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
