"""Differentiable rendering tests: gradient correctness vs finite differences
(SURVEY.md §4 'gradient checks vs finite differences') and inverse-rendering
albedo recovery (BASELINE.json config 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import luisarender_tpu as lr
from luisarender_tpu import testing
from luisarender_tpu.diff.render import get_in, make_render_fn, l2_loss_fn


@pytest.fixture(scope="module")
def small_cornell():
    d = testing.cornell_box(resolution=(16, 16), spp=4, depth=3)
    scene = lr.Scene.from_dict(d)
    compiled = lr.compile_scene(scene)
    return scene, compiled


ALBEDO_PATH = ("textures", "constant", "value")


class TestGradients:
    def test_grad_nonzero_and_finite(self, small_cornell):
        scene, compiled = small_cornell
        render = make_render_fn(
            compiled, scene.cameras[0], scene.integrator, spp=2, max_depth=3
        )
        base = get_in(compiled.arrays, ALBEDO_PATH)

        def loss(v):
            img = render({ALBEDO_PATH: v}, compiled.arrays)
            return jnp.mean(img)

        g = jax.grad(loss)(base)
        g = np.asarray(g)
        assert np.isfinite(g).all()
        # brightening any wall albedo brightens the render
        assert (g[:, :3] >= -1e-6).all()
        assert g.max() > 1e-5

    def test_grad_matches_finite_difference(self, small_cornell):
        """Same sampler seeds => correlated estimates => FD ~ analytic."""
        scene, compiled = small_cornell
        render = make_render_fn(
            compiled, scene.cameras[0], scene.integrator, spp=2, max_depth=3
        )
        base = np.asarray(get_in(compiled.arrays, ALBEDO_PATH)).copy()

        def loss(v):
            img = render({ALBEDO_PATH: jnp.asarray(v)}, compiled.arrays)
            return jnp.mean(img)

        loss_jit = jax.jit(loss)
        g = np.asarray(jax.jit(jax.grad(loss))(jnp.asarray(base)))

        eps = 1e-3
        # probe the white-wall red channel and the red-wall red channel
        for idx in [(0, 0), (1, 0)]:
            up = base.copy()
            up[idx] += eps
            down = base.copy()
            down[idx] -= eps
            fd = (float(loss_jit(jnp.asarray(up))) - float(loss_jit(jnp.asarray(down)))) / (
                2 * eps
            )
            assert abs(fd - g[idx]) <= max(0.15 * abs(fd), 2e-4), (
                idx,
                fd,
                g[idx],
            )

    def test_emission_gradient(self, small_cornell):
        """d(image)/d(emission) is exactly linear: grad == image/emission."""
        scene, compiled = small_cornell
        render = make_render_fn(
            compiled, scene.cameras[0], scene.integrator, spp=2, max_depth=3
        )
        base = get_in(compiled.arrays, ALBEDO_PATH)

        def total(v):
            return jnp.sum(render({ALBEDO_PATH: v}, compiled.arrays))

        # scale-invariance sanity: doubling emission row doubles the image.
        # emission lives in the same constant-texture table; find its row
        # (the one with values > 1)
        vals = np.asarray(base)
        emis_row = int(np.argmax(vals[:, :3].max(axis=1)))
        assert vals[emis_row].max() > 1.0

        def loss_e(scale):
            v = jnp.asarray(vals).at[emis_row].mul(scale)
            return jnp.sum(render({ALBEDO_PATH: v}, compiled.arrays))

        g = float(jax.grad(loss_e)(jnp.float32(1.0)))
        val = float(loss_e(jnp.float32(1.0)))
        np.testing.assert_allclose(g, val, rtol=1e-3)


class TestInverseRendering:
    def test_recover_albedo(self, small_cornell):
        """Recover the red wall's albedo from a rendered target."""
        from luisarender_tpu.diff.optimize import recover

        scene, compiled = small_cornell
        render = make_render_fn(
            compiled, scene.cameras[0], scene.integrator, spp=4, max_depth=3
        )
        true_vals = jnp.asarray(get_in(compiled.arrays, ALBEDO_PATH))
        target = render({ALBEDO_PATH: true_vals}, compiled.arrays)

        # start from gray walls (keep the emission row intact)
        init = np.asarray(true_vals).copy()
        emis_row = int(np.argmax(init[:, :3].max(axis=1)))
        for i in range(init.shape[0]):
            if i != emis_row:
                init[i, :3] = 0.5

        params, losses = recover(
            compiled,
            scene.cameras[0],
            scene.integrator,
            target,
            {ALBEDO_PATH: init},
            spp=4,
            max_depth=3,
            steps=48,
            learning_rate=8e-2,
            param_bounds=(0.0, 32.0),  # emission row lives in the same table
        )
        assert losses[-1] < losses[0] * 0.1, (losses[0], losses[-1])
        rec = np.asarray(params[ALBEDO_PATH])
        true = np.asarray(true_vals)
        # white walls (large visible area) recover tightly
        np.testing.assert_allclose(rec[0, :3], true[0, :3], atol=0.05)
        # emission recovers through the same gradients
        np.testing.assert_allclose(rec[emis_row, :3], true[emis_row, :3], rtol=0.05)
        # colored walls recover their hue (dim channels converge slowly)
        red_row, green_row = 4, 3
        assert np.argmax(rec[red_row, :3]) == 0
        assert np.argmax(rec[green_row, :3]) == 1
        np.testing.assert_allclose(rec[red_row, 0], true[red_row, 0], atol=0.1)
        np.testing.assert_allclose(rec[green_row, 1], true[green_row, 1], atol=0.1)
