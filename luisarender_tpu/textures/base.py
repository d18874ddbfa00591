"""Texture interface and the batched polymorphic texture evaluator.

TPU-native equivalent of /root/reference/src/base/texture.h:52-66. A texture
node compiles to an integer *handle* (type-tag in the high bits, row index in
the low bits) plus rows in per-type parameter tables held by the scene
compiler. Device-side evaluation (`evaluate_handles`) is scene-static
polymorphism: for each texture type present in the scene, evaluate all rays
and select by tag mask — the XLA analogue of the reference's bindless
texture fetch + `Polymorphic` dispatch.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..scene.scene import SceneNode

HANDLE_TYPE_SHIFT = 24
HANDLE_INDEX_MASK = (1 << HANDLE_TYPE_SHIFT) - 1
# Handle 0 is reserved as "no texture" (callers supply a default constant).
NULL_HANDLE = np.int32(-1)


def make_handle(type_id: int, index: int) -> int:
    return (type_id << HANDLE_TYPE_SHIFT) | index


class Texture(SceneNode):
    """Host-side texture node. Subclasses implement compile()."""

    # Semantic category hints (texture.h:52-59): textures are decoded by the
    # *consumer* as albedo / unbounded / illuminant via the spectrum model.

    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.range_ = None  # optional (lo, hi) clamp

    def compile(self, compiler) -> int:
        """Register this texture with the compiler; returns a handle."""
        raise NotImplementedError

    def evaluate_static(self):
        """Constant-folded host value (texture.h:66) or None."""
        return None

    @property
    def channels(self) -> int:
        return 4


# Maximum texture-nesting depth unrolled by the dispatcher. Combinator
# textures (checkerboard/swizzle/scale) take a `depth` kwarg and recurse;
# past this depth only leaf textures evaluate (children read as defaults).
MAX_NEST = 3


def compile_tex_param(compiler, tex, row, name):
    """Register a texture-valued parameter with constant hoisting.

    Adds `name` (handle) and `name__src` (row index into the constant
    texture table when the texture is a plain constant, else -1). At
    ShadingContext construction — inside the traced render, once per pass —
    the constant rows are hoisted per-INSTANCE into `name__s`/`name__f`
    columns, so per-ray evaluation reads the value straight from the
    gathered parameter row with no texture-table fetch, while gradients
    still flow to the constant table (the inverse-rendering parameter
    vector, diff/render.py). When EVERY instance of a type hoists, the
    handle column is dropped at stack time (scene/compiler.py stack_rows)
    and the dynamic texture path is not even traced. The device-side
    analogue of the reference's constant folding into pipeline constant
    slots (/root/reference/src/textures/constant.cpp,
    base/pipeline.cpp:174-187)."""
    from .constant import ConstantTexture

    handle = np.int32(compiler.compile_texture(tex) if tex is not None else NULL_HANDLE)
    src = -1
    if tex is not None and isinstance(tex, ConstantTexture):
        src = int(handle) & HANDLE_INDEX_MASK
    row[name] = handle
    row[name + "__src"] = np.int32(src)


def param_present(params, name):
    """Per-ray bool: does this parameter have a texture (folded or dynamic)?"""
    folded = params[name + "__f"] > 0.5
    handles = params.get(name)
    return folded if handles is None else (folded | (handles >= 0))


def evaluate_param(ctx, params, name, it, default=(0.0, 0.0, 0.0, 0.0), depth=0):
    """Evaluate a texture parameter from a gathered row dict -> (..., 4).

    Folded instances read `name__s` directly; only when some instance of the
    type is dynamic (handle column survived stacking) is the polymorphic
    texture evaluation traced, with folded lanes masked out of it."""
    static = params[name + "__s"]
    folded = params[name + "__f"] > 0.5
    base = jnp.broadcast_to(
        jnp.asarray(default, jnp.float32), static.shape
    )
    handles = params.get(name)
    if handles is None:  # every instance folded or textureless
        return jnp.where(folded[..., None], static, base)
    dyn = evaluate_handles(
        ctx,
        jnp.where(folded, jnp.int32(NULL_HANDLE), handles),
        it,
        default=default,
        depth=depth,
    )
    return jnp.where(folded[..., None], static, dyn)


def evaluate_handles(ctx, handles, it, default=(0.0, 0.0, 0.0, 0.0), depth=0):
    """Evaluate per-ray texture handles -> (..., 4) float32.

    ctx: ShadingContext (scene/compiler.py); handles: (...,) int32; it:
    Interaction. Dispatch = compute each texture type present, select by tag
    (scene-static polymorphism).
    """
    shape = handles.shape
    result = jnp.broadcast_to(
        jnp.asarray(default, jnp.float32), shape + (4,)
    )
    type_tag = handles >> HANDLE_TYPE_SHIFT
    index = handles & HANDLE_INDEX_MASK
    for type_id, tex_cls in enumerate(ctx.plan.texture_types):
        if not ctx.plan.texture_type_used[type_id]:
            continue
        nests = "depth" in tex_cls.evaluate_rows.__code__.co_varnames
        if nests:
            if depth >= MAX_NEST:
                continue
            value = tex_cls.evaluate_rows(ctx, index, it, depth=depth)
        else:
            value = tex_cls.evaluate_rows(ctx, index, it)
        mask = (handles >= 0) & (type_tag == type_id)
        result = jnp.where(mask[..., None], value, result)
    return result


def spectral_param(
    ctx, params, name, it, swl, kind="albedo", default=(0.0, 0.0, 0.0, 0.0)
):
    """Texture parameter -> sampled spectrum (..., C).

    kind: "albedo" | "unbounded" | "illuminant" — which spectrum decoder
    applies (texture.h:52-59 semantic decoders). Under the hero spectrum,
    lanes whose value was hoisted from a constant texture use the
    per-instance pre-fit sigmoid coefficients (scene/compiler.py
    _hoist_spectral_coeffs) — pure VPU math instead of per-ray LUT gathers;
    dynamic-texture lanes fall back to the full evaluate + LUT decode.
    Fixed-spectrum (sRGB) mode is the plain evaluate + decode."""
    import jax.numpy as jnp

    spec = ctx.spectrum
    ck = {"albedo": "__ca", "unbounded": "__cu", "illuminant": "__ci"}[kind]
    if spec.is_fixed or (name + ck) not in params:
        rgba = evaluate_param(ctx, params, name, it, default=default)
        return getattr(spec, "decode_" + kind)(rgba[..., :3], swl)

    folded = params[name + "__f"] > 0.5
    d3 = jnp.asarray(default[:3], jnp.float32)
    if kind == "albedo":
        dflt = spec.coeffs_albedo(d3)
        coeffs = jnp.where(folded[..., None], params[name + ck], dflt)
        out = spec.decode_albedo_coeffs(coeffs, swl)
    else:
        fit = spec.coeffs_unbounded if kind == "unbounded" else (
            spec.coeffs_illuminant
        )
        dc, ds = fit(d3)
        coeffs = jnp.where(folded[..., None], params[name + ck], dc)
        scale = jnp.where(folded, params[name + ck + "s"], ds)
        dec = (
            spec.decode_unbounded_coeffs
            if kind == "unbounded"
            else spec.decode_illuminant_coeffs
        )
        out = dec(coeffs, scale, swl)

    handles = params.get(name)
    if handles is None:
        return out
    dyn_rgba = evaluate_handles(
        ctx, jnp.where(folded, jnp.int32(NULL_HANDLE), handles), it,
        default=default,
    )
    out_dyn = getattr(spec, "decode_" + kind)(dyn_rgba[..., :3], swl)
    use_dyn = (~folded) & (handles >= 0)
    return jnp.where(use_dyn[..., None], out_dyn, out)
