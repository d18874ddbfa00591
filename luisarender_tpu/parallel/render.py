"""Multi-chip rendering: rays/tiles data-parallel over a device mesh.

TPU-native scale-out that the reference lacks entirely (SURVEY.md §2.D: the
reference is single-process single-device). Strategy per BASELINE.json:
rays are embarrassingly parallel — shard the pixel batch over a 1-axis mesh
with `shard_map`, replicate scene arrays in HBM, keep each device's film rows
local (no cross-device traffic in the forward pass; gradient reductions are
the only collectives in the differentiable path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "rays") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def sharded_render_pass(compiled, camera, integrator, mesh: Mesh, resolution=None):
    """Build a jitted, shard_map'ed render pass.

    Returns fn(arrays, accum, sample_index) -> accum where `accum` rows are
    sharded over the mesh axis and `arrays` is replicated.
    """
    from ..integrators.mega_path import path_trace_batch

    w, h = resolution or camera.film.resolution
    n_dev = mesh.devices.size
    if h % n_dev != 0:
        raise ValueError(f"film height {h} must divide over {n_dev} devices")
    axis = mesh.axis_names[0]
    film = camera.film
    sampler = integrator.sampler
    light_sampler = integrator.light_sampler

    def local_pass(arrays, accum, sample_index, row0):
        """Runs per device on its block of rows; accum block (h/n, w, 4)."""
        hh = accum.shape[0]
        ys, xs = jnp.meshgrid(
            jnp.arange(hh, dtype=jnp.int32) + row0,
            jnp.arange(w, dtype=jnp.int32),
            indexing="ij",
        )
        pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
        rgb, weight = path_trace_batch(
            compiled,
            arrays,
            camera,
            sampler,
            light_sampler,
            pixel_xy,
            sample_index,
            max_depth=integrator.max_depth,
            rr_depth=integrator.rr_depth,
            rr_threshold=integrator.rr_threshold,
        )
        return film.accumulate_image(
            accum, rgb.reshape(hh, w, 3), weight.reshape(hh, w)
        )

    def sharded(arrays, accum, sample_index):
        def per_device(arrays, accum, sample_index):
            idx = jax.lax.axis_index(axis)
            row0 = idx.astype(jnp.int32) * (h // n_dev)
            return local_pass(arrays, accum, sample_index, row0)

        # check_vma=False: Pallas kernels (the fused megapath / cluster
        # tracers) declare out_shapes without varying-mesh-axis metadata,
        # which the vma checker rejects; per-device execution is still a
        # plain single-device program, so the check adds nothing here
        return jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), P(axis), P()),
            out_specs=P(axis),
            check_vma=False,
        )(arrays, accum, sample_index)

    return jax.jit(sharded, donate_argnums=(1,))


def make_sharded_grad_fn(
    compiled,
    camera,
    integrator,
    target,
    mesh: Mesh,
    *,
    spp=2,
    max_depth=3,
):
    """Distributed inverse-rendering step: pixels shard over the mesh, each
    device runs forward + adjoint on its rows, and parameter gradients are
    all-reduced by psum over ICI (BASELINE.json: 'parameter gradients
    all-reduced overlapped with backward compute' — XLA overlaps the psum
    with the remaining backward automatically).

    Returns fn(params, arrays) -> (loss, grads) with params/grads replicated.
    """
    from ..diff.render import apply_params
    from ..integrators import common

    w, h = camera.film.resolution
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    if h % n_dev != 0:
        raise ValueError(f"film height {h} must divide over {n_dev} devices")
    rows = h // n_dev
    target = jnp.asarray(target)

    sampler = integrator.sampler
    light_sampler = integrator.light_sampler
    spectrum = compiled.spectrum
    c = compiled.plan.spectral_dim
    n_local = rows * w

    def local_render(arrays, row0):
        ys, xs = jnp.meshgrid(
            jnp.arange(rows, dtype=jnp.int32),
            jnp.arange(w, dtype=jnp.int32),
            indexing="ij",
        )
        pixel_xy = jnp.stack(
            [xs.reshape(-1), (ys + row0).reshape(-1)], axis=-1
        )
        acc = jnp.zeros((n_local, 3), jnp.float32)
        for i in range(spp):
            state = sampler.start(pixel_xy, jnp.int32(i))
            state, u_filter = sampler.generate_pixel_2d(state)
            u_lens = jnp.full((n_local, 2), 0.5, jnp.float32)
            ray, _, cw = camera.generate_rays(pixel_xy, u_filter, u_lens, 0.0)
            if spectrum.is_fixed:
                swl = spectrum.sample_wavelengths(
                    jnp.zeros((n_local, 1), jnp.float32)
                )
            else:
                state, u_swl = sampler.generate_1d(state)
                swl = spectrum.sample_wavelengths(u_swl[..., None])
            carry = common.init_carry(
                ray, jnp.broadcast_to(cw[..., None], (n_local, c)), state, swl
            )

            def step(carry, _):
                carry = common.bounce_step(
                    compiled,
                    arrays,
                    sampler,
                    light_sampler,
                    carry,
                    max_depth=max_depth,
                    rr_depth=10_000,
                    rr_threshold=0.0,
                    detach_sampling=True,
                )
                return carry, None

            carry, _ = jax.lax.scan(
                jax.checkpoint(step), carry, None, length=max_depth + 1
            )
            acc = acc + spectrum.srgb(carry["L"], carry["swl"])
        return (acc / spp).reshape(rows, w, 3)

    def per_device(params, arrays, target_block):
        idx = jax.lax.axis_index(axis)
        row0 = idx.astype(jnp.int32) * rows

        def local_loss(params):
            merged = apply_params(arrays, params)
            img = local_render(merged, row0)
            return jnp.sum((img - target_block) ** 2)

        loss, grads = jax.value_and_grad(local_loss)(params)
        loss = jax.lax.psum(loss, axis) / (h * w * 3)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, axis) / (h * w * 3), grads
        )
        return loss, grads

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    target_sharded = jax.device_put(target, NamedSharding(mesh, P(axis)))
    return jax.jit(lambda params, arrays: sharded(params, arrays, target_sharded))


def render_sharded(compiled, camera, integrator, mesh: Mesh, spp=None):
    """Full multi-device progressive render; returns the developed image."""
    film = camera.film
    w, h = film.resolution
    axis = mesh.axis_names[0]
    accum = film.prepare()
    accum = jax.device_put(
        accum, NamedSharding(mesh, P(axis))
    )
    arrays = jax.device_put(
        compiled.arrays, NamedSharding(mesh, P())
    )
    step = sharded_render_pass(compiled, camera, integrator, mesh)
    for i in range(spp if spp is not None else camera.spp):
        accum = step(arrays, accum, jnp.int32(i))
    return film.develop(accum)
