"""Device-side geometry services: Hit -> Interaction reconstruction.

TPU-native equivalent of /root/reference/src/base/geometry.cpp:281-301
(`interaction()`) and 345-389 (barycentric shading point with dpdu/UV-fallback
and normal transforms). Batched over rays.

All per-triangle shading attributes live in ONE packed (P, 40) float32 table
in SORTED primitive-slot order (the order tracers index by, see
accel/traverse.py Hit.prim convention), so reconstructing an interaction is
a single row gather + elementwise math. The previous formulation (11 separate
gathers through triangles -> vertex arrays) measured 30.6 ms for 1M rays on
v5e; the packed row gather is 6.8 ms. Triangle-constant quantities
(geometric normal, area, dpdu tangent with its degenerate-uv fallback) are
precomputed on the host at scene-compile time.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import frame as fr
from ..core.fetch import fetch_rows
from ..core.types import Hit, Interaction

# Packed shade-table column layout (SHADE_COLS wide, slot-ordered rows):
#   0:3   v0        3:6   e1        6:9   e2
#   9:12  ng (unit geometric normal)      12    prim_area
#   13:16 n0        16:19 n1        19:22 n2   (authored vertex normals)
#   22:24 uv0       24:26 uv1       26:28 uv2
#   28:31 tangent (dpdu from the uv parameterization; frame fallback when
#         the mapping is degenerate — geometry.cpp:345-389)
#   31    instance id (exact float; instance count << 2^24)
#   32    valid flag (0 = padding slot)
#   33    uv density: sqrt(uv-area / world-area) — converts a world-space
#         ray-cone width into a uv-space texture footprint (mip LOD)
SHADE_COLS = 40


def _np_frame_tangent(n: np.ndarray) -> np.ndarray:
    """numpy port of core/frame.py make_frame()['s'] (Duff et al. 2017) so
    host-precomputed fallbacks match the device formula bit-for-bit."""
    nz = n[:, 2]
    sign = np.where(nz >= 0.0, np.float32(1.0), np.float32(-1.0))
    a = np.float32(-1.0) / (sign + nz)
    b = n[:, 0] * n[:, 1] * a
    return np.stack(
        [1.0 + sign * n[:, 0] * n[:, 0] * a, sign * b, -sign * n[:, 0]],
        axis=-1,
    ).astype(np.float32)


def build_shade_table(
    vertex_p: np.ndarray,
    vertex_n: np.ndarray,
    vertex_uv: np.ndarray,
    triangles: np.ndarray,
    tri_inst: np.ndarray,
    prim_index: np.ndarray,
) -> np.ndarray:
    """Host-side (P, SHADE_COLS) table in sorted-slot order; prim_index is
    the sorted->original map from the BVH build (-1 = padding)."""
    p = prim_index.shape[0]
    orig = np.maximum(prim_index, 0)
    tris = triangles[orig]
    v0 = vertex_p[tris[:, 0]].astype(np.float32)
    v1 = vertex_p[tris[:, 1]].astype(np.float32)
    v2 = vertex_p[tris[:, 2]].astype(np.float32)
    e1 = v1 - v0
    e2 = v2 - v0
    ng_raw = np.cross(e1, e2)
    ng_len = np.sqrt(np.maximum((ng_raw * ng_raw).sum(-1), 0.0))
    prim_area = (0.5 * ng_len).astype(np.float32)
    ng = (ng_raw / np.maximum(ng_len, 1e-20)[:, None]).astype(np.float32)

    n0 = vertex_n[tris[:, 0]].astype(np.float32)
    n1 = vertex_n[tris[:, 1]].astype(np.float32)
    n2 = vertex_n[tris[:, 2]].astype(np.float32)
    uv0 = vertex_uv[tris[:, 0]].astype(np.float32)
    uv1 = vertex_uv[tris[:, 1]].astype(np.float32)
    uv2 = vertex_uv[tris[:, 2]].astype(np.float32)

    # dpdu is constant per triangle (uv mapping is affine over it)
    duv1 = uv1 - uv0
    duv2 = uv2 - uv0
    det = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    safe_det = np.where(np.abs(det) < 1e-12, np.float32(1.0), det)
    dpdu = (duv2[:, 1:2] * e1 - duv1[:, 1:2] * e2) / safe_det[:, None]
    dpdu_len = np.sqrt(np.maximum((dpdu * dpdu).sum(-1), 0.0))
    degenerate = (np.abs(det) < 1e-12) | (dpdu_len < 1e-12)
    tangent = np.where(degenerate[:, None], _np_frame_tangent(ng), dpdu)

    table = np.zeros((p, SHADE_COLS), np.float32)
    table[:, 0:3] = v0
    table[:, 3:6] = e1
    table[:, 6:9] = e2
    table[:, 9:12] = ng
    table[:, 12] = prim_area
    table[:, 13:16] = n0
    table[:, 16:19] = n1
    table[:, 19:22] = n2
    table[:, 22:24] = uv0
    table[:, 24:26] = uv1
    table[:, 26:28] = uv2
    table[:, 28:31] = tangent.astype(np.float32)
    table[:, 31] = tri_inst[orig].astype(np.float32)
    table[:, 32] = (prim_index >= 0).astype(np.float32)
    uv_area = 0.5 * np.abs(det)
    table[:, 33] = np.sqrt(
        uv_area / np.maximum(prim_area, 1e-20)
    ).astype(np.float32)
    return table


def build_shade_table_object(
    positions: np.ndarray,
    normals: np.ndarray,
    uvs: np.ndarray,
    triangles: np.ndarray,
    prim_index: np.ndarray,
) -> np.ndarray:
    """OBJECT-space shade table for the two-level path (accel/twolevel.py):
    same layout as build_shade_table but per unique mesh, untransformed;
    col 31 is unused (instance comes from the Hit), col 33 stores the raw
    UV-space triangle area (world area is instance-dependent and computed at
    runtime from the transformed edges)."""
    table = build_shade_table(
        positions,
        normals,
        uvs,
        triangles,
        np.zeros(triangles.shape[0], np.int32),
        prim_index,
    )
    orig = np.maximum(prim_index, 0)
    tris = triangles[orig]
    uv0 = uvs[tris[:, 0]].astype(np.float32)
    duv1 = uvs[tris[:, 1]].astype(np.float32) - uv0
    duv2 = uvs[tris[:, 2]].astype(np.float32) - uv0
    det = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    table[:, 33] = (0.5 * np.abs(det)).astype(np.float32)
    return table


def surface_interaction_2l(
    arrays, hit: Hit, ray, needs_uv: bool = True, cone_width=None
) -> Interaction:
    """Two-level interaction reconstruction: object-space shade row + the
    instance's object-to-world transform (accel/twolevel.py INST row layout:
    cols 0:12 world-to-object, 12:24 object-to-world)."""
    from ..accel.twolevel import _xform_normal, _xform_point, _xform_vector

    t2 = arrays["trace2"]
    slot = jnp.maximum(hit.prim, 0)
    row = fetch_rows(t2["shade_rows"], slot)
    irow = fetch_rows(t2["inst_rows"], jnp.maximum(hit.inst, 0))
    valid = (hit.prim >= 0) & (hit.inst >= 0) & (row[..., 32] > 0.0)

    u = hit.bary[..., 0]
    v = hit.bary[..., 1]
    w = 1.0 - u - v
    p_obj = (
        row[..., 0:3] + u[..., None] * row[..., 3:6] + v[..., None] * row[..., 6:9]
    )
    p = _xform_point(irow, 12, p_obj)
    e1w = _xform_vector(irow, 12, row[..., 3:6])
    e2w = _xform_vector(irow, 12, row[..., 6:9])
    ng_raw = jnp.cross(e1w, e2w)
    prim_area = 0.5 * fr.length(ng_raw)
    ng = fr.normalize(ng_raw)

    ns_obj = (
        w[..., None] * row[..., 13:16]
        + u[..., None] * row[..., 16:19]
        + v[..., None] * row[..., 19:22]
    )
    # normals transform by the inverse transpose = transpose of cols 0:12
    ns = fr.normalize(_xform_normal(irow, 0, ns_obj))
    ns = jnp.where(
        (fr.length(ns) > 0.5)[..., None]
        & (jnp.isfinite(ns).all(axis=-1))[..., None],
        ns,
        ng,
    )
    ns = jnp.where(fr.dot(ns, ng)[..., None] < 0.0, -ns, ns)

    uv = (
        w[..., None] * row[..., 22:24]
        + u[..., None] * row[..., 24:26]
        + v[..., None] * row[..., 26:28]
    )
    tangent = _xform_vector(irow, 12, row[..., 28:31])

    wo = -ray.direction
    back_facing = fr.dot(wo, ng) < 0.0
    footprint = None
    if cone_width is not None:
        uv_density = jnp.sqrt(
            row[..., 33] / jnp.maximum(prim_area, 1e-20)
        )
        footprint = cone_width * uv_density
    return Interaction(
        valid=valid,
        inst=jnp.where(valid, hit.inst, -1),
        prim=hit.prim,
        p=p,
        ng=ng,
        ns=ns,
        tangent=tangent,
        uv=uv,
        prim_area=prim_area,
        back_facing=back_facing,
        footprint=footprint,
    )


def surface_interaction(
    arrays, hit: Hit, ray, needs_uv: bool = True, cone_width=None
) -> Interaction:
    """Reconstruct the shading interaction from a Hit: one packed row gather
    (shade table, slot-indexed) + barycentric interpolation. needs_uv is kept
    for API compatibility; the packed row carries uv at no extra fetch cost.

    cone_width: optional (...,) world-space ray-cone diameter at the hit
    (integrators/common.py ray-cone tracking); converted to a uv-space
    texture footprint via the per-triangle uv density."""
    if "trace2" in arrays:
        return surface_interaction_2l(
            arrays, hit, ray, needs_uv=needs_uv, cone_width=cone_width
        )
    slot = jnp.maximum(hit.prim, 0)
    row = fetch_rows(arrays["trace"]["shade_table"], slot)
    valid = (hit.prim >= 0) & (row[..., 32] > 0.0)

    u = hit.bary[..., 0]
    v = hit.bary[..., 1]
    # The subpacket MXU tracer (ops/subpacket_pallas.py) returns bary = NaN:
    # its Woop-transform u/v are algebraically rearranged vs MT, so exact
    # barycentrics are recomputed HERE from the winner's shade row (v0/e1/e2
    # already fetched — zero extra gathers) instead of extracted per cluster
    # in the kernel (~120 cycles/cluster saved). The recompute is only
    # emitted when that opt-in tracer is active (static Python branch) so
    # the default cluster/brute tracers, whose bary is already exact, don't
    # pay an extra Moller-Trumbore per ray (ADVICE r4).
    from ..ops import subpacket_pallas as _sp

    if _sp.ENABLED:
        from ..accel.traverse import intersect_tri

        recomp = jnp.isnan(u)
        mt_valid, _, u_mt, v_mt = intersect_tri(
            ray.origin, ray.direction,
            row[..., 0:3], row[..., 3:6], row[..., 6:9],
        )
        keep = recomp & valid & mt_valid
        u = jnp.where(recomp, jnp.where(keep, u_mt, 0.0), u)
        v = jnp.where(recomp, jnp.where(keep, v_mt, 0.0), v)
    w = 1.0 - u - v
    # p = (1-u-v) p0 + u p1 + v p2 = v0 + u e1 + v e2
    p = row[..., 0:3] + u[..., None] * row[..., 3:6] + v[..., None] * row[..., 6:9]
    ng = row[..., 9:12]
    prim_area = row[..., 12]

    ns = fr.normalize(
        w[..., None] * row[..., 13:16]
        + u[..., None] * row[..., 16:19]
        + v[..., None] * row[..., 19:22]
    )
    # guard against degenerate authored normals; fall back to geometric
    ns = jnp.where(
        (fr.length(ns) > 0.5)[..., None]
        & (jnp.isfinite(ns).all(axis=-1))[..., None],
        ns,
        ng,
    )
    # keep shading normal in the geometric hemisphere convention of the mesh
    ns = jnp.where(fr.dot(ns, ng)[..., None] < 0.0, -ns, ns)

    uv = (
        w[..., None] * row[..., 22:24]
        + u[..., None] * row[..., 24:26]
        + v[..., None] * row[..., 26:28]
    )
    tangent = row[..., 28:31]
    inst = row[..., 31].astype(jnp.int32)

    sph = arrays["trace"].get("sph")
    if sph is not None:
        # analytic-sphere hits: prim = P + sphere_index; bary carries the
        # spherical (u, v) — reconstruct position/normal/tangent exactly
        # from the quadric (scene/compiler.py sphere table layout)
        p_tris = arrays["trace"]["shade_table"].shape[0]
        is_sph = hit.prim >= p_tris
        srow = fetch_rows(
            sph, jnp.clip(hit.prim - p_tris, 0, sph.shape[0] - 1)
        )
        c = srow[..., 0:3]
        radius = srow[..., 3]
        rot = srow[..., 4:13]
        two_pi = jnp.float32(2.0 * np.pi)
        phi = u * two_pi
        theta = v * jnp.float32(np.pi)
        st = jnp.sin(theta)
        n_loc = jnp.stack(
            [jnp.cos(phi) * st, jnp.sin(phi) * st, jnp.cos(theta)], axis=-1
        )
        # world normal = R n_loc (rot is row-major R)
        n_w = jnp.stack(
            [
                rot[..., 0] * n_loc[..., 0] + rot[..., 1] * n_loc[..., 1] + rot[..., 2] * n_loc[..., 2],
                rot[..., 3] * n_loc[..., 0] + rot[..., 4] * n_loc[..., 1] + rot[..., 5] * n_loc[..., 2],
                rot[..., 6] * n_loc[..., 0] + rot[..., 7] * n_loc[..., 1] + rot[..., 8] * n_loc[..., 2],
            ],
            axis=-1,
        )
        p_sph = c + radius[..., None] * n_w
        # dpdu = 2*pi*r * R (-sin phi * st, cos phi * st, 0); frame fallback
        # at the poles (degenerate parameterization)
        t_loc = jnp.stack(
            [-jnp.sin(phi) * st, jnp.cos(phi) * st, jnp.zeros_like(phi)],
            axis=-1,
        )
        t_w = jnp.stack(
            [
                rot[..., 0] * t_loc[..., 0] + rot[..., 1] * t_loc[..., 1],
                rot[..., 3] * t_loc[..., 0] + rot[..., 4] * t_loc[..., 1],
                rot[..., 6] * t_loc[..., 0] + rot[..., 7] * t_loc[..., 1],
            ],
            axis=-1,
        ) * (two_pi * radius)[..., None]
        t_w = jnp.where(
            (st > 1e-6)[..., None], t_w, fr.make_frame(n_w)["s"]
        )
        m = is_sph[..., None]
        p = jnp.where(m, p_sph, p)
        uv = jnp.where(m, hit.bary, uv)
        ng = jnp.where(m, n_w, ng)
        ns = jnp.where(m, n_w, ns)
        tangent = jnp.where(m, t_w, tangent)
        inst = jnp.where(is_sph, srow[..., 13].astype(jnp.int32), inst)
        prim_area = jnp.where(
            is_sph,
            jnp.float32(4.0 * np.pi) * radius * radius,
            prim_area,
        )
        valid = valid | (is_sph & (hit.prim < p_tris + sph.shape[0]))
        if cone_width is not None:
            # uv density of the spherical map ~ 1/(2 pi r)
            row = row.at[..., 33].set(
                jnp.where(
                    is_sph,
                    1.0 / jnp.maximum(two_pi * radius, 1e-20),
                    row[..., 33],
                )
            )

    wo = -ray.direction
    back_facing = fr.dot(wo, ng) < 0.0
    footprint = None
    if cone_width is not None:
        footprint = cone_width * row[..., 33]
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
        footprint=footprint,
    )
