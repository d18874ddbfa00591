"""Differentiable rendering: radiance as a pure function of scene parameters.

The capability BASELINE.json's north star adds beyond the reference (which
has no differentiable pass): `jax.grad` through the path-traced image with
respect to material/texture/light parameters.

Design (SURVEY.md §7.10):
- the bounce loop becomes a `lax.scan` with static length = max_depth
  (while_loop is not reverse-mode differentiable); each step is wrapped in
  `jax.checkpoint` so the backward pass rematerializes the bounce instead of
  storing every intermediate — the memory shape of an adjoint wavefront pass;
- detached sampling (integrators/common.py detach_sampling): gradients flow
  through BSDF values, textures and emission, not through sampled directions
  or pdfs — the standard unbiased interior-derivative estimator (visibility
  discontinuities are not differentiated; reparameterization is future work);
- parameters are addressed by *paths* into the compiled arrays pytree
  (e.g. ("textures", "constant", "value")), so any compiled quantity —
  texture values, emission, sigma_t, instance fields — is optimizable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..integrators import common


def set_in(tree, path, value):
    """Immutable deep-set of tree[path[0]][path[1]]... = value."""
    if len(path) == 1:
        out = dict(tree) if isinstance(tree, dict) else list(tree)
        out[path[0]] = value
        return out
    out = dict(tree) if isinstance(tree, dict) else list(tree)
    out[path[0]] = set_in(tree[path[0]], path[1:], value)
    return out


def get_in(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def apply_params(arrays, params: dict):
    """params: {path_tuple: array} -> arrays with overrides applied."""
    for path, value in params.items():
        arrays = set_in(arrays, tuple(path), value)
    return arrays


def make_render_fn(
    compiled,
    camera,
    integrator,
    *,
    spp=4,
    max_depth=None,
    resolution=None,
    remat=True,
):
    """Build f(params, base_arrays) -> (H, W, 3) differentiable radiance.

    params: {path: array} overriding entries of the compiled arrays.
    The sampler is deterministic in spp/pixel, so two calls with the same
    settings produce correlated estimates — ideal for finite-difference
    validation and for optimizing against a rendered target.
    """
    w, h = resolution or camera.film.resolution
    depth = max_depth or getattr(integrator, "max_depth", 5)
    sampler = integrator.sampler
    light_sampler = integrator.light_sampler
    spectrum = compiled.spectrum
    c = compiled.plan.spectral_dim
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.int32), jnp.arange(w, dtype=jnp.int32), indexing="ij"
    )
    pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
    n = w * h

    def one_sample(arrays, sample_index):
        state = sampler.start(pixel_xy, sample_index)
        state, u_filter = sampler.generate_pixel_2d(state)
        u_lens = jnp.full((n, 2), 0.5, jnp.float32)
        if camera.requires_lens_sampling:
            state, u_lens = sampler.generate_2d(state)
        ray, _, cam_weight = camera.generate_rays(pixel_xy, u_filter, u_lens, 0.0)
        if spectrum.is_fixed:
            swl = spectrum.sample_wavelengths(jnp.zeros((n, 1), jnp.float32))
        else:
            state, u_swl = sampler.generate_1d(state)
            swl = spectrum.sample_wavelengths(u_swl[..., None])
        carry = common.init_carry(
            ray, jnp.broadcast_to(cam_weight[..., None], (n, c)), state, swl
        )

        def step(carry, _):
            carry = common.bounce_step(
                compiled,
                arrays,
                sampler,
                light_sampler,
                carry,
                max_depth=depth,
                rr_depth=10_000,  # no RR in the differentiable pass
                rr_threshold=0.0,
                detach_sampling=True,
            )
            return carry, None

        step_fn = jax.checkpoint(step) if remat else step
        # +1 flushes the final bounce's deferred shadow ray (fused NEE)
        carry, _ = jax.lax.scan(step_fn, carry, None, length=depth + 1)
        return spectrum.srgb(carry["L"], carry["swl"])

    def render(params, base_arrays):
        arrays = apply_params(base_arrays, params)
        acc = jnp.zeros((n, 3), jnp.float32)
        for i in range(spp):
            acc = acc + one_sample(arrays, jnp.int32(i))
        return (acc / spp).reshape(h, w, 3)

    return render


def l2_loss_fn(render_fn, target):
    """Mean-squared-error loss against a target image."""

    def loss(params, base_arrays):
        img = render_fn(params, base_arrays)
        return jnp.mean((img - target) ** 2)

    return loss
