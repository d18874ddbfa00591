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
# Tag-sorted blocked dispatch (wave_path_v2.cpp:891-928 surface-tag counting
# sort, re-imagined for XLA static shapes): sort lanes by surface tag with a
# variadic lax.sort (TPU sorts are fast; 1M-index gathers are not), cut the
# sorted axis into fixed blocks, and lax.switch each block to the single
# surface type it contains. Mixed boundary blocks (at most n_types-1 of
# them) fall back to compute-all-masked; blocks of dead lanes short-circuit
# to the init template — late bounces with mostly-terminated lanes pay ~0
# shading cost. Results are unsorted by carrying the inverse permutation
# through a second sort.
# ---------------------------------------------------------------------------

_DEAD_TAG = 0x3FFFFFFF

# min lanes for tag-sorted shading: below this the sort costs more than the
# per-type savings (sorts are ~ms-scale at 1M lanes)
TAG_SORT_MIN_LANES = 32768


def use_tag_sort(ctx, n) -> bool:
    import os

    if os.environ.get("LUISARENDER_TPU_NO_TAGSORT"):
        return False
    if n < TAG_SORT_MIN_LANES:
        return False
    # pays when >1 surface type (skip whole types per block) or whenever
    # many lanes are dead (dead blocks short-circuit); with a single cheap
    # type and mostly-live lanes it's a wash — require multiple types
    return len(ctx.plan.surface_types) >= 2


def _tree_cols(tree):
    """Flatten a pytree of (n,) / (n, k) arrays into (n,) f32/i32 sort
    columns + a rebuild spec."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    cols = []
    spec = []
    for leaf in leaves:
        dt = leaf.dtype
        width = 0 if leaf.ndim == 1 else leaf.shape[1]
        if dt == jnp.bool_:
            conv = lambda c: c.astype(jnp.int32)
            back = lambda c: c.astype(jnp.bool_)
        else:
            conv = lambda c: c
            back = lambda c: c
        if width == 0:
            cols.append(conv(leaf))
            spec.append((back, 0))
        else:
            for j in range(width):
                cols.append(conv(leaf[:, j]))
            spec.append((back, width))
    return cols, (treedef, spec)


def _tree_uncols(cols, meta):
    treedef, spec = meta
    leaves = []
    i = 0
    for back, width in spec:
        if width == 0:
            leaves.append(back(cols[i]))
            i += 1
        else:
            leaves.append(back(jnp.stack(cols[i:i + width], axis=-1)))
            i += width
    return jax.tree_util.tree_unflatten(treedef, leaves)


def sorted_tag_apply(ctx, it, inputs, init, per_type_fn, block=8192):
    """Apply `per_type_fn(surf_cls, type_index, it_blk, inputs_blk)` over
    lanes grouped by surface tag. Returns a pytree shaped like `init`
    (per-lane results in original lane order).

    inputs: pytree of per-lane arrays riding the sort with `it`.
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

    in_cols, in_meta = _tree_cols((it, index, inputs))
    iota = jnp.arange(n, dtype=jnp.int32)
    pad = (-n) % block
    if pad:
        tag = jnp.pad(tag, (0, pad), constant_values=_DEAD_TAG)
        iota = jnp.pad(iota, (0, pad), constant_values=n)
        in_cols = [jnp.pad(c, (0, pad)) for c in in_cols]
    sorted_all = jax.lax.sort((tag, iota, *in_cols), num_keys=1)
    s_tag, s_iota = sorted_all[0], sorted_all[1]
    s_it, s_index, s_inputs = _tree_uncols(list(sorted_all[2:]), in_meta)

    nb = (n + pad) // block

    def reshape_blk(tree):
        return jax.tree_util.tree_map(
            lambda x: x.reshape((nb, block) + x.shape[1:]), tree
        )

    b_tag = s_tag.reshape(nb, block)
    b_it, b_index, b_inputs = (
        reshape_blk(s_it), s_index.reshape(nb, block), reshape_blk(s_inputs)
    )
    # dead lanes get the init VALUES (dispatch() semantics). init must be
    # lane-uniform (zeros / broadcast constants) — true for every call site.
    init_blk = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[:1], (block,) + x.shape[1:]), init
    )

    def one_block(args):
        tag_blk, it_blk, index_blk, inputs_blk = args
        t_first = tag_blk[0]
        uniform = (tag_blk[block - 1] == t_first) & (t_first < _DEAD_TAG)

        def make_branch(t):
            def branch(_):
                return per_type_fn(types[t], t, index_blk, it_blk, inputs_blk)

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
            t_first >= _DEAD_TAG,
            len(types) + 1,
            jnp.where(uniform, t_first, len(types)),
        )
        return jax.lax.switch(which, branches, None)

    out_blocks = jax.lax.map(one_block, (b_tag, b_it, b_index, b_inputs))
    out_sorted = jax.tree_util.tree_map(
        lambda x: x.reshape((nb * block,) + x.shape[2:]), out_blocks
    )
    out_cols, out_meta = _tree_cols(out_sorted)
    unsorted = jax.lax.sort((s_iota, *out_cols), num_keys=1)
    result = _tree_uncols(list(unsorted[1:]), out_meta)
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
