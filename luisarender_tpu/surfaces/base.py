"""Surface (BSDF) interface and scene-static polymorphic dispatch.

TPU-native equivalent of /root/reference/src/base/surface.h:37-144. The
reference's node/Instance/Closure triple becomes:

- host node (this class): parses textures/params, `compile()` packs one row of
  per-instance parameters (numpy scalars + texture handles);
- device "closure": pure static methods `evaluate`/`sample` operating on
  batched gathered parameter rows — the staged DSL closure becomes a traced
  JAX function specialized per scene.

Polymorphism: the wavefront integrator sorts by surface tag and calls one
type per segment; the megakernel path uses `dispatch_*` below (compute every
type present, select by tag mask) — the XLA analogue of
`Polymorphic::dispatch` + `$switch` (base/pipeline.h:75-77).

Conventions (verified against integrators/mega_path.cpp:114-144):
- `f` INCLUDES the |cos(theta_i)| factor;
- pdf is solid-angle measure; pdf == 0 marks an invalid sample;
- wo points away from the surface (towards the previous vertex), world space.

Wrapper features of the reference (NormalMap/TwoSided/Opacity,
surface.h:160-330) are data-driven here: every surface row carries optional
`normal_map`/`alpha` texture handles and a `two_sided` flag.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import jax

from ..core import frame as fr
from ..core.fetch import gather_param_rows
from ..scene.scene import SceneNode
from ..textures.base import (
    NULL_HANDLE,
    compile_tex_param,
    evaluate_handles,
    evaluate_param,
    param_present,
)

# Surface event codes (surface.h:37-41).
EVENT_REFLECT = 0
EVENT_ENTER = 1
EVENT_EXIT = 2
EVENT_THROUGH = 3

# Property bits (surface.h:142-144).
PROPERTY_REFLECTIVE = 1 << 0
PROPERTY_TRANSMISSIVE = 1 << 1
PROPERTY_THIN = 1 << 2


class Surface(SceneNode):
    properties: int = PROPERTY_REFLECTIVE

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.normal_map = scene.load_texture(desc.node("normal_map"))
        self.alpha = scene.load_texture(desc.node("alpha"))
        self.two_sided = desc.bool("two_sided", False)

    # --- host compile ---
    def compile_common(self, compiler) -> dict:
        row = {"two_sided": np.float32(1.0 if self.two_sided else 0.0)}
        compile_tex_param(compiler, self.normal_map, row, "normal_map")
        compile_tex_param(compiler, self.alpha, row, "alpha")
        return row

    def compile(self, compiler) -> dict:
        raise NotImplementedError

    @property
    def is_null(self) -> bool:
        return False

    # --- device closure API (override in subclasses) ---
    @staticmethod
    def evaluate(params, ctx, it, swl, wo, wi):
        raise NotImplementedError

    @staticmethod
    def sample(params, ctx, it, swl, wo, u_lobe, u):
        raise NotImplementedError

    @staticmethod
    def albedo(params, ctx, it, swl):
        return jnp.zeros(it.p.shape[:-1] + (swl.dimension,), jnp.float32)

    @staticmethod
    def roughness(params, ctx, it):
        return jnp.ones(it.p.shape[:-1] + (2,), jnp.float32)

    @staticmethod
    def is_dispersive(params, ctx):
        return False

    @staticmethod
    def eta_value(params, ctx, it, swl):
        """Closure relative IOR (surface.h:90 `eta()`), 1.0 = no refraction.
        Consumed by GPT's transmissive half-vector shift (gpt.cpp:934-948
        `closure->eta().value_or(1.f)`)."""
        return jnp.ones(it.p.shape[:-1], jnp.float32)


def shading_frame(params, ctx, it):
    """Shading frame with optional tangent-space normal mapping
    (surface.h:217-280 NormalMapWrapper)."""
    frame = it.shading_frame()
    if "normal_map__s" in params and ctx.plan.any_normal_maps:
        mapped = evaluate_param(
            ctx, params, "normal_map", it, default=(0.5, 0.5, 1.0, 0.0)
        )[..., :3]
        n_local = fr.normalize(mapped * 2.0 - 1.0)
        has = param_present(params, "normal_map")[..., None]
        n_world = fr.normalize(fr.to_world(frame, n_local))
        n = jnp.where(has, n_world, frame["n"])
        frame = fr.frame_from_z_and_hint(n, it.tangent)
    return frame


def oriented_frame(params, ctx, it, wo):
    """Shading frame, flipped toward wo when the surface is two-sided
    (surface.h:282-330 TwoSidedWrapper as a data-driven feature)."""
    frame = shading_frame(params, ctx, it)
    two_sided = params.get("two_sided")
    if two_sided is None:
        return frame
    flip = ((fr.dot(wo, frame["n"]) < 0.0) & (two_sided > 0.5))[..., None]
    return {
        "s": frame["s"],
        "t": jnp.where(flip, -frame["t"], frame["t"]),
        "n": jnp.where(flip, -frame["n"], frame["n"]),
    }


def validate_sides(it, frame, wo, wi, f, pdf):
    """Zero out f/pdf when wo/wi disagree in side between geometric and
    shading normals (base/surface.cpp:34-43 validate_surface_sides)."""
    ns = frame["n"]
    ng = it.ng
    # reflection if wi on same geometric side as wo, transmission otherwise;
    # require agreement between shading/geometric classification
    refl_geo = fr.dot(wo, ng) * fr.dot(wi, ng) > 0.0
    refl_sha = fr.dot(wo, ns) * fr.dot(wi, ns) > 0.0
    ok = refl_geo == refl_sha
    return jnp.where(ok[..., None], f, 0.0), jnp.where(ok, pdf, 0.0)


def _gather_rows(params, index):
    return gather_param_rows(params, index)


def dispatch(ctx, it, method, *args, init):
    """Evaluate `method` for every surface type present; select by tag.

    init: pytree template (broadcast shapes) used when no type matches.
    Returns a pytree like the per-type results.
    """
    inst = ctx.arrays["instances"]
    meta = gather_param_rows(
        {"tag": inst["surface_tag"], "idx": inst["surface_index"]}, it.inst
    )
    tag, index = meta["tag"], meta["idx"]
    result = init
    for t, surf_cls in enumerate(ctx.plan.surface_types):
        mask = it.valid & (tag == t)
        rows = _gather_rows(params_arrays(ctx, t), index)
        value = getattr(surf_cls, method)(rows, ctx, it, *args)
        result = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                mask.reshape(mask.shape + (1,) * (new.ndim - mask.ndim)), new, old
            ),
            value,
            result,
        )
    return result


def params_arrays(ctx, type_index):
    return ctx.arrays["surfaces"][type_index]


# ---------------------------------------------------------------------------
# Blocked coherent dispatch (wave_path_v2.cpp:891-928 surface-tag counting
# sort, re-imagined for the TPU's actual cost model): lanes are cut into
# fixed blocks IN PLACE and each block lax.switches to the single surface
# type it contains; mixed blocks fall back to compute-all-masked and blocks
# of dead lanes short-circuit to the init template — late bounces with
# mostly-terminated lanes pay ~0 shading cost.
#
# Why no actual sort: every permutation mechanism measured on v5e loses.
# A wide variadic lax.sort carrying the ~35 shading columns never finishes
# XLA-TPU compilation (>20 min; operand-count blowup in the comparator
# codegen); splitting it into narrow same-key sorts gets re-merged by XLA's
# sort combiner back into the wide sort (5x9-op grouped sorts also >20 min);
# and applying a (key, iota)-sort permutation with a row gather costs ~61 ms
# per (1M, 35) apply — several times the shading it would save. Instead we
# exploit the coherence that ALREADY exists: camera rays are screen-ordered
# and bounce waves are Morton-sorted for the cluster tracer, so consecutive
# lanes overwhelmingly hit the same material; blocks inherit that purity for
# free, with zero data movement.
# ---------------------------------------------------------------------------

_DEAD_TAG = 0x3FFFFFFF

# min lanes for blocked dispatch: below this one block covers everything and
# the switch machinery is pure overhead
TAG_SORT_MIN_LANES = 32768


def use_tag_sort(ctx, n) -> bool:
    """Whether shading should use blocked dispatch instead of compute-all.

    DEFAULT OFF, by measurement: on v5e (512k-tri scene, 921600 lanes,
    matte+disney+null) the compute-all dispatch's marginal cost inside a
    fused bounce program is ~3 ms — XLA fuses every closure into the
    surrounding elementwise stream, so computing all types for all lanes is
    nearly free — while blocked dispatch measured ~6 ms (lax.map slice/
    update machinery exceeds the work it skips). The reference's tag sort
    (wave_path_v2.cpp:891-928) pays on GPUs because divergent warps
    serialize closure code; XLA's dense SIMD execution has no such penalty
    until closures contain per-type GATHERS (image-atlas-heavy scenes),
    where skipping whole blocks can still win: opt in with
    LUISARENDER_TPU_TAGSORT=1."""
    import os

    if not os.environ.get("LUISARENDER_TPU_TAGSORT"):
        return False
    if n < TAG_SORT_MIN_LANES:
        return False
    return len(ctx.plan.surface_types) >= 2


def blocked_tag_apply(ctx, it, inputs, init, per_type_fn, block=2048):
    """Apply `per_type_fn(surf_cls, type_index, it_blk, inputs_blk)` over
    fixed lane blocks, dispatching each block to the single surface type it
    contains (blocked coherent dispatch — see the design note above).
    Returns a pytree shaped like `init` (per-lane results, original order).

    inputs: pytree of per-lane arrays cut into blocks alongside `it`.
    init: pytree template for dead lanes AND the mixed-block fallback's
    accumulator (same role as dispatch()'s init).
    """
    n = it.p.shape[0]
    types = ctx.plan.surface_types
    inst = ctx.arrays["instances"]
    meta = gather_param_rows(
        {"tag": inst["surface_tag"], "idx": inst["surface_index"]}, it.inst
    )
    tag = jnp.where(it.valid, meta["tag"], _DEAD_TAG).astype(jnp.int32)
    index = meta["idx"]

    pad = (-n) % block
    if pad:
        pad_tree = lambda x: jnp.pad(
            x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)
        )
        tag = jnp.pad(tag, (0, pad), constant_values=_DEAD_TAG)
        index = jnp.pad(index, (0, pad))
        it = jax.tree_util.tree_map(pad_tree, it)
        inputs = jax.tree_util.tree_map(pad_tree, inputs)
    nb = (n + pad) // block

    def reshape_blk(tree):
        return jax.tree_util.tree_map(
            lambda x: x.reshape((nb, block) + x.shape[1:]), tree
        )

    b_tag = tag.reshape(nb, block)
    b_it, b_index, b_inputs = reshape_blk(it), reshape_blk(index), reshape_blk(inputs)
    # per-block purity from one cheap pass over the tags: a block is uniform
    # iff min == max (dead lanes excluded by mapping them to +inf for min)
    tag_lo = jnp.min(jnp.where(b_tag == _DEAD_TAG, 0x7FFFFFFF, b_tag), axis=1)
    tag_hi = jnp.max(jnp.where(b_tag == _DEAD_TAG, -1, b_tag), axis=1)
    # dead lanes get the init VALUES (dispatch() semantics). init must be
    # lane-uniform (zeros / broadcast constants) — true for every call site.
    init_blk = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[:1], (block,) + x.shape[1:]), init
    )

    def one_block(args):
        lo, hi, tag_blk, it_blk, index_blk, inputs_blk = args
        has_dead = jnp.any(tag_blk == _DEAD_TAG)

        def make_branch(t):
            def branch(_):
                out = per_type_fn(types[t], t, index_blk, it_blk, inputs_blk)
                # uniform-live blocks skip the mask; blocks with a dead tail
                # (or holes) still need init values on dead lanes
                live = tag_blk != _DEAD_TAG
                return jax.lax.cond(
                    has_dead,
                    lambda o: jax.tree_util.tree_map(
                        lambda new, old: jnp.where(
                            live.reshape(
                                live.shape + (1,) * (new.ndim - live.ndim)
                            ),
                            new,
                            old,
                        ),
                        o,
                        init_blk,
                    ),
                    lambda o: o,
                    out,
                )

            return branch

        def dead_branch(_):
            return init_blk

        def mixed_branch(_):
            out = init_blk
            for t, cls in enumerate(types):
                mask = it_blk.valid & (tag_blk == t)
                val = per_type_fn(cls, t, index_blk, it_blk, inputs_blk)
                out = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(
                        mask.reshape(
                            mask.shape + (1,) * (new.ndim - mask.ndim)
                        ),
                        new,
                        old,
                    ),
                    val,
                    out,
                )
            return out

        branches = [make_branch(t) for t in range(len(types))]
        branches.append(mixed_branch)
        branches.append(dead_branch)
        which = jnp.where(
            hi < 0,  # every lane dead
            len(types) + 1,
            jnp.where(lo == hi, lo, len(types)),
        )
        return jax.lax.switch(which, branches, None)

    out_blocks = jax.lax.map(
        one_block, (tag_lo, tag_hi, b_tag, b_it, b_index, b_inputs)
    )
    result = jax.tree_util.tree_map(
        lambda x: x.reshape((nb * block,) + x.shape[2:]), out_blocks
    )
    if pad:
        result = jax.tree_util.tree_map(lambda x: x[:n], result)
    return result


def any_dispersive(ctx) -> bool:
    """Static: does any surface type in the plan support dispersion?"""
    return any(
        hasattr(cls, "is_dispersive_rows") for cls in ctx.plan.surface_types
    )


def dispersive_mask(ctx, it):
    """Per-ray: did this ray hit a dispersive surface (glass with nonzero
    Cauchy B)? Drives swl.terminate_secondary (mega_path.cpp:117-119)."""
    inst = ctx.arrays["instances"]
    meta = gather_param_rows(
        {"tag": inst["surface_tag"], "idx": inst["surface_index"]}, it.inst
    )
    tag, index = meta["tag"], meta["idx"]
    mask = jnp.zeros(it.inst.shape, bool)
    for t, surf_cls in enumerate(ctx.plan.surface_types):
        fn = getattr(surf_cls, "is_dispersive_rows", None)
        if fn is None:
            continue
        rows = _gather_rows(params_arrays(ctx, t), index)
        mask = jnp.where(it.valid & (tag == t), fn(rows, ctx), mask)
    return mask
