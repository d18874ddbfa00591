"""Inverse rendering: recover scene parameters by gradient descent.

The optimization loop for BASELINE.json's differentiable configs (recover
albedo/roughness textures from renders). Gradients come from diff/render.py;
on a device mesh, parameter gradients are all-reduced by `psum` inside the
sharded value_and_grad (see parallel/render.py for the mesh plumbing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .render import l2_loss_fn, make_render_fn


def recover(
    compiled,
    camera,
    integrator,
    target_image,
    init_params: dict,
    *,
    spp=4,
    max_depth=4,
    steps=64,
    learning_rate=5e-2,
    param_bounds=(0.0, 1.0),
    verbose=False,
):
    """Adam-optimize `init_params` ({path: array}) to match target_image.

    Returns (final_params, losses). The loss/grad is jitted once; every step
    reuses the same compiled executable.
    """
    render_fn = make_render_fn(
        compiled, camera, integrator, spp=spp, max_depth=max_depth
    )
    loss_fn = l2_loss_fn(render_fn, jnp.asarray(target_image))
    opt = optax.adam(learning_rate)

    # keys must be hashable/static: use sorted tuple order
    keys = sorted(init_params.keys())
    params = {k: jnp.asarray(init_params[k], jnp.float32) for k in keys}
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, arrays):
        loss, grads = jax.value_and_grad(loss_fn)(params, arrays)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        if param_bounds is not None:
            lo, hi = param_bounds
            params = jax.tree_util.tree_map(
                lambda p: jnp.clip(p, lo, hi), params
            )
        return params, opt_state, loss

    losses = []
    for i in range(steps):
        params, opt_state, loss = train_step(params, opt_state, compiled.arrays)
        losses.append(float(loss))
        if verbose and (i % 8 == 0 or i == steps - 1):
            print(f"step {i}: loss {losses[-1]:.6f}")
    return params, losses
