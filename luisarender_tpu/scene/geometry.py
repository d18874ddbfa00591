"""Device-side geometry services: Hit -> Interaction reconstruction.

TPU-native equivalent of /root/reference/src/base/geometry.cpp:281-301
(`interaction()`) and 345-389 (barycentric shading point with dpdu/UV-fallback
and normal transforms). Batched over rays.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import frame as fr
from ..core.types import Hit, Interaction


def surface_interaction(arrays, hit: Hit, ray, needs_uv: bool = True) -> Interaction:
    """needs_uv=False (scene has no uv-dependent textures or normal maps)
    skips the uv gathers and the dpdu computation — a measurable win since
    the interaction runs every bounce for every ray."""
    prim = jnp.maximum(hit.prim, 0)
    valid = hit.prim >= 0
    tri = arrays["triangles"][prim]
    inst = arrays["tri_inst"][prim]

    p0 = arrays["vertex_p"][tri[..., 0]]
    p1 = arrays["vertex_p"][tri[..., 1]]
    p2 = arrays["vertex_p"][tri[..., 2]]
    n0 = arrays["vertex_n"][tri[..., 0]]
    n1 = arrays["vertex_n"][tri[..., 1]]
    n2 = arrays["vertex_n"][tri[..., 2]]

    # Möller-Trumbore barycentrics: p = (1-u-v) p0 + u p1 + v p2
    u = hit.bary[..., 0]
    v = hit.bary[..., 1]
    w = 1.0 - u - v
    p = w[..., None] * p0 + u[..., None] * p1 + v[..., None] * p2

    e1 = p1 - p0
    e2 = p2 - p0
    ng_raw = jnp.cross(e1, e2)
    prim_area = 0.5 * fr.length(ng_raw)
    ng = fr.normalize(ng_raw)
    ns = fr.normalize(w[..., None] * n0 + u[..., None] * n1 + v[..., None] * n2)
    # guard against degenerate authored normals; fall back to geometric
    ns = jnp.where(
        (fr.length(ns) > 0.5)[..., None] & (jnp.isfinite(ns).all(axis=-1))[..., None],
        ns,
        ng,
    )
    # keep shading normal in the geometric hemisphere convention of the mesh
    ns = jnp.where(fr.dot(ns, ng)[..., None] < 0.0, -ns, ns)

    if needs_uv:
        uv0 = arrays["vertex_uv"][tri[..., 0]]
        uv1 = arrays["vertex_uv"][tri[..., 1]]
        uv2 = arrays["vertex_uv"][tri[..., 2]]
        uv = w[..., None] * uv0 + u[..., None] * uv1 + v[..., None] * uv2
        # dpdu from uv parameterization (geometry.cpp:345-389); fallback to
        # any tangent when the uv mapping is degenerate
        duv1 = uv1 - uv0
        duv2 = uv2 - uv0
        det = duv1[..., 0] * duv2[..., 1] - duv1[..., 1] * duv2[..., 0]
        dpdu = (
            duv2[..., 1:2] * e1 - duv1[..., 1:2] * e2
        ) / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)[..., None]
        degenerate = (jnp.abs(det) < 1e-12) | (fr.length(dpdu) < 1e-12)
        fallback = fr.make_frame(ng)["s"]
        tangent = jnp.where(degenerate[..., None], fallback, dpdu)
    else:
        uv = jnp.zeros(p.shape[:-1] + (2,), jnp.float32)
        tangent = fr.make_frame(ng)["s"]

    wo = -ray.direction
    back_facing = fr.dot(wo, ng) < 0.0
    return Interaction(
        valid=valid,
        inst=jnp.where(valid, inst, -1),
        prim=hit.prim,
        p=p,
        ng=ng,
        ns=ns,
        tangent=tangent,
        uv=uv,
        prim_area=prim_area,
        back_facing=back_facing,
    )
