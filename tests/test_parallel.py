"""Multi-device sharded rendering tests on the 8-way virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.parallel.render import make_mesh, render_sharded


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestShardedRender:
    def test_matches_single_device(self):
        scene = lr.Scene.from_dict(
            testing.cornell_box(resolution=(32, 32), spp=2, depth=3)
        )
        compiled = lr.compile_scene(scene)
        single = scene.integrator.render(compiled)["cornell.exr"]

        mesh = make_mesh(jax.devices()[:8])
        sharded = np.asarray(
            render_sharded(
                compiled, scene.cameras[0], scene.integrator, mesh, spp=2
            )
        )
        np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)

    def test_dryrun_entrypoint(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert bool(jnp.isfinite(out).all())
