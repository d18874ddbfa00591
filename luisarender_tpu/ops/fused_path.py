"""Fully-fused whole-path Pallas megakernel for eligible scenes.

This is the true TPU analogue of the reference's megakernel
(/root/reference/src/integrators/mega_path.cpp:49-156): ONE kernel runs the
entire bounce loop — closest trace (triangles + analytic quadric spheres),
interaction reconstruction, emissive-hit MIS, NEE (light pick, shadow
trace), BSDF evaluate/sample over matte/mirror/metal/plastic/glass/disney,
Russian roulette — with every intermediate resident in VMEM/registers. The unfused
XLA path (integrators/common.py bounce_step) round-trips the ~40-array path
state through HBM between every phase; at 1M lanes that is ~5.4 ms per bounce
against a ~0.4 ms memory floor. Here HBM traffic is one ray-block read and
one radiance write per PATH, not per phase.

Eligibility (checked at scene-compile time, scene/compiler.py -> plan flag
`fused_path`): surfaces in {matte, mirror, metal, plastic, glass, disney
(reflective subset)} with constant textures and no normal maps/alpha,
diffuse area lights with constant emission, uniform light sampler,
independent sampler, fixed sRGB spectrum, no environment/media, all-opaque
geometry small enough for the VMEM-resident brute-force trace
(P <= MAX_TRIS triangle rows + <= MAX_SPHERES analytic spheres),
<= MAX_INSTANCES instances. Everything per-lane-indexed
(instance row, light row) becomes an unrolled select over the (tiny) table —
Pallas TPU has no per-lane gather, and at these sizes selects are cheaper
than any gather anyway.

The kernel mirrors the unfused math AND the independent sampler's draw order
exactly (7 LCG draws per bounce: u_sel, u_light.xy, u_lobe, u_bsdf.xy, u_rr),
so fused and unfused renders of the same scene agree to float-associativity
noise (tests/test_fused_path.py).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fused_bsdf as fb

MAX_TRIS = 64  # padded tri-table rows (select-loop unroll bound)
MAX_INSTANCES = 32
MAX_LIGHT_TRIS = 8
MAX_LIGHTS = 4
BLK = 4096  # measured best on v5e (2048: 199 Mray/s, 4096: 224, 8192: 219)
SUB = BLK // 128
UNROLL_DEPTH = True

_F32_BIG = 3e38  # plain Python float: jnp constants at module scope would be
# captured as out-of-trace closure constants by pallas_call

# ---------------------------------------------------------------------------
# Compile-time pack construction (host, numpy)
# ---------------------------------------------------------------------------

# inst_table v2 columns (one row per instance; union layout over the
# supported surface types — see ops/fused_bsdf.py ST_* tags):
#   0     stype
#   1:4   c0  kd / F0 / tint / kd / Kr
#   4:7   c1  - / - / - / sigma*thickness / Kt
#   7:10  c2  metal n (at the sRGB peak wavelengths)
#   10:13 c3  metal k
#   13    p0  matte ON-A / plastic eta / glass eta(hero)
#   14    p1  matte ON-B / plastic kd-luminance / glass Kr-luminance-ratio
#   15:17 alpha_x, alpha_y (GGX)
#   17    surface two_sided      18 has_surface     19 has_light
#   20:23 emission (illuminant * scale)
#   23    light two_sided        24 light total_area
#   disney (ST_DISNEY; c0 = color, c1 = sheen*csheen, c2 = cspec0,
#   c3 = ctint_mix, p0 = eta, p1 = roughness, alpha in 15:17):
#   25    metallic   26 alpha_cc   27 clearcoat
#   28:31 normalized lobe weights w_diff / w_spec / w_cc
INST_COLS = 32
# entry_table columns (one row per light-list entry):
#   0 alias_offset  1 tri_count  2 total_area  3 instance id
#   4:7 emission    7 two_sided
ENTRY_COLS = 8

_FUSED_SURFACES = ("matte", "mirror", "metal", "plastic", "glass", "disney")
MAX_SPHERES = 16
_SRGB_PEAKS = (602.785, 539.285, 445.772)


def _const_value(texture_types, texture_rows, handle, default):
    """Fold a texture handle to its constant rgba, or None if not foldable."""
    h = int(handle)
    if h < 0:
        return np.asarray(default, np.float32)
    type_id = h >> 24
    index = h & ((1 << 24) - 1)
    cls = texture_types[type_id]
    if cls.impl_names[0] != "constant":
        return None
    return np.asarray(texture_rows[type_id][index]["value"], np.float32)


def _cie_y(rgb):
    """host cie_y_of_srgb (core/colorspace.py) on a numpy rgb triple."""
    from ..core.colorspace import cie_y_of_srgb

    return float(np.asarray(cie_y_of_srgb(np.asarray(rgb, np.float32))))


def _fold_alpha(tt, tr, row):
    """Mirror surfaces/mirror.py _resolve_alpha for constant roughness."""
    rough = _const_value(tt, tr, row["roughness"], (0.0,) * 4)
    if rough is None:
        return None
    ch = float(row.get("roughness_channels", 1.0))
    r = rough[:2] if ch >= 1.5 else np.asarray([rough[0], rough[0]])
    if float(row.get("remap_roughness", 1.0)) > 0.5:
        a = np.maximum(r * r, 1e-4)
    else:
        a = np.maximum(r, 1e-4)
    return float(a[0]), float(a[1])


def _fold_surface(tt, tr, cls, row, out):
    """Fill the per-type inst_table columns; returns False if unfoldable."""
    name = cls.impl_names[0]
    if int(row.get("normal_map", -1)) >= 0 or int(row.get("alpha", -1)) >= 0:
        return False
    out[17] = float(row.get("two_sided", 0.0))
    if name == "matte":
        kd = _const_value(tt, tr, row["kd"], (1.0, 1.0, 1.0, 0.0))
        sigma = _const_value(tt, tr, row["sigma"], (0.0,) * 4)
        if kd is None or sigma is None:
            return False
        sg = float(sigma[0]) * (np.pi / 180.0)
        s2 = sg * sg
        out[0] = fb.ST_MATTE
        out[1:4] = np.clip(kd[:3], 0.0, 1.0)
        out[13] = 1.0 - s2 / (2.0 * (s2 + 0.33))
        out[14] = 0.45 * s2 / (s2 + 0.09)
        return True
    al = _fold_alpha(tt, tr, row)
    if al is None:
        return False
    out[15], out[16] = al
    if name == "mirror":
        kd = _const_value(tt, tr, row["kd"], (1.0, 1.0, 1.0, 0.0))
        if kd is None:
            return False
        out[0] = fb.ST_MIRROR
        out[1:4] = np.clip(kd[:3], 0.0, 1.0)
        return True
    if name == "metal":
        kd = _const_value(tt, tr, row["kd"], (1.0, 1.0, 1.0, 0.0))
        if kd is None:
            return False
        out[0] = fb.ST_METAL
        out[1:4] = np.clip(kd[:3], 0.0, 1.0)
        n3 = np.asarray(row["eta_n"], np.float32)
        k3 = np.asarray(row["eta_k"], np.float32)
        if float(row.get("ld_valid", 0.0)) > 0.5:
            from ..surfaces.metal import ld_eta_k

            lam = np.asarray(_SRGB_PEAKS, np.float32)
            n_ld, k_ld = ld_eta_k(
                lam, row["ld_wp"], row["ld_f"], row["ld_g"], row["ld_w"]
            )
            n3 = np.asarray(n_ld, np.float32)
            k3 = np.asarray(k_ld, np.float32)
        out[7:10] = n3
        out[10:13] = k3
        return True
    if name == "plastic":
        kd = _const_value(tt, tr, row["kd"], (0.5, 0.5, 0.5, 0.0))
        eta = _const_value(tt, tr, row["eta"], (1.5,) * 4)
        sig = _const_value(tt, tr, row["sigma_a"], (0.0,) * 4)
        thick = _const_value(tt, tr, row["thickness"], (1.0,) * 4)
        if kd is None or eta is None or sig is None or thick is None:
            return False
        out[0] = fb.ST_PLASTIC
        out[1:4] = np.clip(kd[:3], 0.0, 1.0)
        out[4:7] = sig[:3] * float(thick[0])
        out[13] = float(eta[0])
        out[14] = _cie_y(kd[:3])
        out[17] = 0.0  # plastic ignores the two-sided wrapper (implicit flip)
        return True
    if name == "glass":
        kr = _const_value(tt, tr, row["kr"], (1.0, 1.0, 1.0, 0.0))
        kt = _const_value(tt, tr, row["kt"], (1.0, 1.0, 1.0, 0.0))
        if kr is None or kt is None:
            return False
        out[0] = fb.ST_GLASS
        out[1:4] = np.clip(kr[:3], 0.0, 1.0)
        out[4:7] = np.clip(kt[:3], 0.0, 1.0)
        lam_um2 = (_SRGB_PEAKS[0] * 1e-3) ** 2
        out[13] = float(row["cauchy_a"]) + float(row["cauchy_b"]) / lam_um2
        kr_lum = _cie_y(kr[:3])
        kt_lum = _cie_y(kt[:3])
        out[14] = 0.0 if kr_lum <= 0.0 else kr_lum / max(kr_lum + kt_lum, 1e-8)
        return True
    if name == "disney":
        # reflective subset only: thin / specular_trans / diffuse_trans
        # eject the scene to the general path (surfaces/disney.py full set)
        if float(row.get("thin", 0.0)) > 0.5:
            return False

        def scalar(pname, default):
            v = _const_value(tt, tr, row[pname], (default,) * 4)
            return None if v is None else float(v[0])

        color = _const_value(tt, tr, row["color"], (0.5, 0.5, 0.5, 0.0))
        metallic = scalar("metallic", 0.0)
        eta = scalar("eta", 1.5)
        roughness = scalar("roughness", 0.5)
        spec_tint = scalar("specular_tint", 0.0)
        aniso = scalar("anisotropic", 0.0)
        sheen = scalar("sheen", 0.0)
        sheen_tint = scalar("sheen_tint", 0.0)
        clearcoat = scalar("clearcoat", 0.0)
        cc_gloss = scalar("clearcoat_gloss", 1.0)
        spec_trans = scalar("specular_trans", 0.0)
        diff_trans = scalar("diffuse_trans", 0.0)
        vals = (color, metallic, eta, roughness, spec_tint, aniso, sheen,
                sheen_tint, clearcoat, cc_gloss, spec_trans, diff_trans)
        if any(v is None for v in vals):
            return False
        if spec_trans > 0.0 or diff_trans > 0.0:
            return False
        color = np.clip(color[:3], 0.0, 1.0)
        eta = max(eta, 1.001)
        roughness = float(np.clip(roughness, 0.0, 1.0))
        lum = max(_cie_y(color), 1e-6)
        tint = color / lum
        csheen = (1.0 - sheen_tint) + sheen_tint * tint
        f0 = ((eta - 1.0) / (eta + 1.0)) ** 2
        cspec0 = (1.0 - metallic) * f0 * (
            (1.0 - spec_tint) + spec_tint * tint
        ) + metallic * color
        ctint_mix = (1.0 - spec_tint) + spec_tint * tint
        aspect = float(np.sqrt(max(1.0 - 0.9 * aniso, 1e-4)))
        rr_ = roughness * roughness if float(
            row.get("remap_roughness", 1.0)
        ) > 0.5 else roughness
        out[0] = fb.ST_DISNEY
        out[1:4] = color
        out[4:7] = sheen * csheen
        out[7:10] = cspec0
        out[10:13] = ctint_mix
        out[13] = eta
        out[14] = roughness
        out[15] = max(rr_ / aspect, 1e-4)
        out[16] = max(rr_ * aspect, 1e-4)
        out[25] = metallic
        out[26] = (1.0 - cc_gloss) * 0.1 + cc_gloss * 0.001
        out[27] = clearcoat
        # normalized lobe sampling weights (disney.cpp:542-556)
        w_diff = (1.0 - metallic) * lum
        w_spec = max(_cie_y(np.clip(cspec0, 0.0, None)), 0.1)
        w_cc = 0.25 * clearcoat
        total = max(w_diff + w_spec + w_cc, 1e-6)
        out[28] = w_diff / total
        out[29] = w_spec / total
        out[30] = w_cc / total
        return True
    return False


def build_fused_pack(
    surface_types,
    surface_rows,
    light_types,
    light_rows,
    texture_types,
    texture_rows,
    instances,
    light_entries,
    spectrum,
    num_tris_padded,
    all_opaque,
    has_environment,
    has_media,
    two_level,
    n_spheres=0,
    environment=None,
):
    """Returns {"inst_table": (NI,28), "entry_table": (NL,8)} numpy arrays if
    the scene qualifies for the fused path, else None."""
    if two_level or has_media or not all_opaque:
        return None
    if has_environment and type(environment).__name__ not in (
        "SphericalEnvironment", "DirectionalEnvironment"
    ):
        # environments ride the fused kernel via PRE-SAMPLED NEE candidates
        # + a deferred miss pass (see _env_nee_candidates): the kernel
        # itself never touches the alias tables, so only env types whose
        # sample()/evaluate() run outside qualify (combined: not yet)
        return None
    if num_tris_padded > MAX_TRIS or n_spheres > MAX_SPHERES:
        return None
    if type(spectrum).__name__ != "SRGBSpectrum":
        return None
    ni = len(instances["surface_tag"])
    if ni == 0 or ni > MAX_INSTANCES:
        return None
    nl = len(light_entries["inst"])
    if nl > MAX_LIGHTS:
        return None
    if nl and (
        int(np.sum(np.asarray(light_entries["tri_count"]))) > MAX_LIGHT_TRIS
    ):
        return None
    for cls in surface_types:
        if cls.impl_names[0] not in _FUSED_SURFACES:
            return None
    for cls in light_types:
        if cls.impl_names[0] != "diffuse":
            return None

    inst_table = np.zeros((ni, INST_COLS), np.float32)
    # alpha floor everywhere: in mixed-type scenes every type's GGX math runs
    # on every lane before the select; ax=0 would breed (discarded) inf/NaN
    inst_table[:, 15:17] = 1e-4
    for i in range(ni):
        stag = int(instances["surface_tag"][i])
        if int(instances["medium_tag"][i]) >= 0:
            return None
        if stag >= 0:
            cls = surface_types[stag]
            row = surface_rows[stag][int(instances["surface_index"][i])]
            if not _fold_surface(
                texture_types, texture_rows, cls, row, inst_table[i]
            ):
                return None
            inst_table[i, 18] = 1.0
        ltag = int(instances["light_tag"][i])
        if ltag >= 0:
            lrow = light_rows[ltag][int(instances["light_index"][i])]
            em = _const_value(
                texture_types, texture_rows, lrow["emission"],
                (1.0, 1.0, 1.0, 0.0),
            )
            if em is None:
                return None
            entry = int(instances["light_entry"][i])
            inst_table[i, 19] = 1.0
            inst_table[i, 20:23] = (
                np.maximum(em[:3], 0.0) * float(lrow["scale"])
            )
            inst_table[i, 23] = float(lrow["two_sided"])
            inst_table[i, 24] = float(light_entries["total_area"][entry])

    entry_table = np.zeros((max(nl, 1), ENTRY_COLS), np.float32)
    for e in range(nl):
        inst = int(light_entries["inst"][e])
        entry_table[e, 0] = float(light_entries["alias_offset"][e])
        entry_table[e, 1] = float(light_entries["tri_count"][e])
        entry_table[e, 2] = float(light_entries["total_area"][e])
        entry_table[e, 3] = float(inst)
        entry_table[e, 4:7] = inst_table[inst, 20:23]
        entry_table[e, 7] = inst_table[inst, 23]
    return {
        "inst_table": inst_table,
        "entry_table": entry_table,
    }


# ---------------------------------------------------------------------------
# In-kernel math helpers (all operate on (SUB, 128) f32 blocks)
# ---------------------------------------------------------------------------

_INV_U32 = 2.3283064365386963e-10
_ONE_MINUS_EPS = 1.0 - 2.0 ** -24


def _u32_to_f32(v):
    """uint32 -> float32 with round-to-nearest, Mosaic-compatible (Mosaic has
    no direct u32->f32 cast). hi*256 and lo are exact in f32; their sum rounds
    once — identical bits to the direct conversion XLA emits elsewhere."""
    hi = jax.lax.bitcast_convert_type(v >> jnp.uint32(8), jnp.int32).astype(
        jnp.float32
    )
    lo = jax.lax.bitcast_convert_type(
        v & jnp.uint32(0xFF), jnp.int32
    ).astype(jnp.float32)
    return hi * 256.0 + lo


def _xxhash32_4(w0, w1, w2, w3):
    """core/rng.py xxhash32 over exactly 4 uint32 words (the independent
    sampler's per-(pixel, sample) seed), uint32-only ops."""
    P2 = jnp.uint32(2246822519)
    P3 = jnp.uint32(3266489917)
    P4 = jnp.uint32(668265263)
    P5 = jnp.uint32(374761393)
    h = P5 + jnp.uint32(16)
    for w in (w0, w1, w2, w3):
        h = h + w * P3
        h = (h << jnp.uint32(17)) | (h >> jnp.uint32(15))
        h = h * P4
    h = (h ^ (h >> jnp.uint32(15))) * P2
    h = (h ^ (h >> jnp.uint32(13))) * P3
    h = h ^ (h >> jnp.uint32(16))
    return h


def _lcg(st):
    st = st * jnp.uint32(0x0019660D) + jnp.uint32(0x3C6EF35F)
    u = jnp.minimum(
        _u32_to_f32(st) * jnp.float32(_INV_U32),
        jnp.float32(_ONE_MINUS_EPS),
    )
    return st, u


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize3(x, y, z, eps=1e-20):
    inv = 1.0 / jnp.maximum(jnp.sqrt(x * x + y * y + z * z), eps)
    return x * inv, y * inv, z * inv


def _safe_div(a, b, eps=1e-20):
    ok = jnp.abs(b) > eps
    return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)


def _balance(pdf_a, pdf_b):
    return pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-20)


_ORIGIN = 1.0 / 32.0
_FLOAT_SCALE = 1.0 / 65536.0
_INT_SCALE = 256.0


def _offset1(p, n):
    """Robust ray-origin offset, one component (core/types.py offset_ray_origin)."""
    of_i = (_INT_SCALE * n).astype(jnp.int32)
    p_bits = jax.lax.bitcast_convert_type(p, jnp.int32)
    p_i = jax.lax.bitcast_convert_type(
        jnp.where(p < 0.0, p_bits - of_i, p_bits + of_i), jnp.float32
    )
    return jnp.where(jnp.abs(p) < _ORIGIN, p + _FLOAT_SCALE * n, p_i)


def _concentric_disk(u0, u1):
    ux = 2.0 * u0 - 1.0
    uy = 2.0 * u1 - 1.0
    zero = (ux == 0.0) & (uy == 0.0)
    use_x = jnp.abs(ux) > jnp.abs(uy)
    r = jnp.where(use_x, ux, uy)
    pi = jnp.float32(np.pi)
    theta = jnp.where(
        use_x,
        (pi / 4.0) * (uy / jnp.where(ux == 0.0, 1.0, ux)),
        (pi / 2.0) - (pi / 4.0) * (ux / jnp.where(uy == 0.0, 1.0, uy)),
    )
    dx = jnp.where(zero, 0.0, r * jnp.cos(theta))
    dy = jnp.where(zero, 0.0, r * jnp.sin(theta))
    return dx, dy


def _make_frame(nx, ny, nz):
    """Duff et al. branchless frame (core/frame.py make_frame)."""
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    sx = 1.0 + sign * nx * nx * a
    sy = sign * b
    sz = -sign * nx
    tx = b
    ty = sign + ny * ny * a
    tz = -ny
    return sx, sy, sz, tx, ty, tz


def _frame_from_z_and_hint(nx, ny, nz, hx, hy, hz):
    """core/frame.py frame_from_z_and_hint (Gram-Schmidt with fallback)."""
    d = _dot(hx, hy, hz, nx, ny, nz)
    sx = hx - d * nx
    sy = hy - d * ny
    sz = hz - d * nz
    s_len = jnp.sqrt(jnp.maximum(sx * sx + sy * sy + sz * sz, 0.0))
    fsx, fsy, fsz, ftx, fty, ftz = _make_frame(nx, ny, nz)
    ok = s_len > 1e-8
    inv = 1.0 / jnp.maximum(s_len, 1e-20)
    sx = jnp.where(ok, sx * inv, fsx)
    sy = jnp.where(ok, sy * inv, fsy)
    sz = jnp.where(ok, sz * inv, fsz)
    # t = n x s
    tx = jnp.where(ok, ny * sz - nz * sy, ftx)
    ty = jnp.where(ok, nz * sx - nx * sz, fty)
    tz = jnp.where(ok, nx * sy - ny * sx, ftz)
    return sx, sy, sz, tx, ty, tz


def _moller_trumbore_row(tri, j, ox, oy, oz, dx, dy, dz):
    """One static triangle row (float literals) against a ray block. The
    caller skips invalid (padding) rows statically — no validity term here."""
    v0x, v0y, v0z = float(tri[j, 0]), float(tri[j, 1]), float(tri[j, 2])
    e1x, e1y, e1z = float(tri[j, 3]), float(tri[j, 4]), float(tri[j, 5])
    e2x, e2y, e2z = float(tri[j, 6]), float(tri[j, 7]), float(tri[j, 8])
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return ok, t, u, v


def _select_row(table, idx_f, cols, n_rows):
    """Unrolled per-lane row select: idx_f (SUB,128) float row index ->
    tuple of selected column values. table is host numpy: entries enter the
    kernel as float literals."""
    out = [jnp.zeros_like(idx_f) for _ in cols]
    for r in range(n_rows):
        m = idx_f == float(r)
        for k, c in enumerate(cols):
            out[k] = jnp.where(m, float(table[r, c]), out[k])
    return out


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _dispatch_eval(stypes, ic, stype_f, wol, wil):
    """(f_r, f_g, f_b, pdf) across the statically-present surface types,
    selected per lane by the instance's stype. Single-type scenes compile to
    the bare closure with no select."""
    def one(t):
        if t == fb.ST_MATTE:
            return fb.eval_matte(ic, wol, wil)
        if t == fb.ST_MIRROR:
            return fb.eval_mirror_metal(ic, wol, wil, metal=False)
        if t == fb.ST_METAL:
            return fb.eval_mirror_metal(ic, wol, wil, metal=True)
        if t == fb.ST_PLASTIC:
            return fb.eval_plastic(ic, wol, wil)
        if t == fb.ST_GLASS:
            return fb.eval_glass(ic, wol, wil)
        if t == fb.ST_DISNEY:
            return fb.eval_disney(ic, wol, wil)
        raise AssertionError(t)

    if len(stypes) == 1:
        return one(stypes[0])
    zero = jnp.zeros_like(wol[0])
    out = [zero, zero, zero, zero]
    for t in stypes:
        v = one(t)
        m = stype_f == float(t)
        out = [jnp.where(m, v[k], out[k]) for k in range(4)]
    return tuple(out)


def _dispatch_sample_wi(stypes, ic, stype_f, wol, u_lobe, u0, u1):
    """Per-type BSDF direction sampling in the local (oriented) frame.
    Returns (wi_l (3,), event, eta) selected per lane; f/pdf come from a
    subsequent _dispatch_eval at the sampled wi (each type's eval formula is
    its own sampler's pdf source, mirroring the unfused closures)."""
    wol_x, wol_y, wol_z = wol

    def one(t):
        zero = jnp.zeros_like(wol_x)
        event = jnp.zeros_like(wol_x)  # EVENT_REFLECT, as float for select
        eta = zero + 1.0
        valid = zero < 1.0
        if t == fb.ST_MATTE:
            ddx, ddy = _concentric_disk(u0, u1)
            dz_l = jnp.sqrt(jnp.maximum(0.0, 1.0 - ddx * ddx - ddy * ddy))
            wz = jnp.where(wol_z < 0.0, -dz_l, dz_l)
            return (ddx, ddy, wz), event, eta, valid
        if t in (fb.ST_MIRROR, fb.ST_METAL):
            hx, hy, hz = fb.ggx_sample_wh(
                wol_x, wol_y, wol_z, u0, u1, ic["ax"], ic["ay"]
            )
            d = wol_x * hx + wol_y * hy + wol_z * hz
            return (
                (2.0 * d * hx - wol_x, 2.0 * d * hy - wol_y,
                 2.0 * d * hz - wol_z),
                event, eta, valid,
            )
        if t == fb.ST_PLASTIC:
            # work in the z-flipped space (plastic's implicit two-sidedness),
            # then unflip the sampled direction
            neg = wol_z < 0.0
            fz = jnp.where(neg, -wol_z, wol_z)
            f_o = fb.fres_dielectric(jnp.abs(fz), ic["p0"])
            w = fb.plastic_substrate_weight(ic, f_o)
            pick_diffuse = u_lobe < w
            ddx, ddy = _concentric_disk(u0, u1)
            dz_l = jnp.sqrt(jnp.maximum(0.0, 1.0 - ddx * ddx - ddy * ddy))
            hx, hy, hz = fb.ggx_sample_wh(
                wol_x, wol_y, fz, u0, u1, ic["ax"], ic["ay"]
            )
            d = wol_x * hx + wol_y * hy + fz * hz
            cx = 2.0 * d * hx - wol_x
            cy = 2.0 * d * hy - wol_y
            cz = 2.0 * d * hz - fz
            wx = jnp.where(pick_diffuse, ddx, cx)
            wy = jnp.where(pick_diffuse, ddy, cy)
            wz = jnp.where(pick_diffuse, dz_l, cz)
            wz = jnp.where(neg, -wz, wz)
            return (wx, wy, wz), event, eta, valid
        if t == fb.ST_GLASS:
            eta_t = ic["p0"]
            f_wo = fb.fres_dielectric(wol_z, eta_t)
            ratio = fb.glass_refl_prob(ic, f_wo)
            pick_refl = u_lobe < ratio
            hx, hy, hz = fb.ggx_sample_wh(
                wol_x, wol_y, wol_z, u0, u1, ic["ax"], ic["ay"]
            )
            neg_o = wol_z < 0.0
            hx = jnp.where(neg_o, -hx, hx)
            hy = jnp.where(neg_o, -hy, hy)
            hz = jnp.where(neg_o, -hz, hz)
            d = wol_x * hx + wol_y * hy + wol_z * hz
            rx = 2.0 * d * hx - wol_x
            ry = 2.0 * d * hy - wol_y
            rz = 2.0 * d * hz - wol_z
            eta_rel_in = jnp.where(wol_z > 0.0, 1.0 / eta_t, eta_t)
            negd = d < 0.0
            thx = jnp.where(negd, -hx, hx)
            thy = jnp.where(negd, -hy, hy)
            thz = jnp.where(negd, -hz, hz)
            ok_t, (ttx, tty, ttz) = fb.refract_c(
                wol_x, wol_y, wol_z, thx, thy, thz, eta_rel_in
            )
            wx = jnp.where(pick_refl, rx, ttx)
            wy = jnp.where(pick_refl, ry, tty)
            wz = jnp.where(pick_refl, rz, ttz)
            event = jnp.where(
                pick_refl,
                float(fb.EVENT_REFLECT),
                jnp.where(
                    wol_z > 0.0, float(fb.EVENT_ENTER), float(fb.EVENT_EXIT)
                ),
            )
            eta = jnp.zeros_like(wol_x) + ic["p0"]
            # i1 selects crash Mosaic; express the bool select logically
            valid = pick_refl | ok_t
            return (wx, wy, wz), event, eta, valid
        if t == fb.ST_DISNEY:
            # lobe CDF over normalized (w_diff, w_spec, w_cc)
            # (surfaces/disney.py sample; transmission folds require 0)
            w_diff = ic["d3"]
            w_spec = ic["d4"]
            pick_diff = u_lobe < w_diff
            pick_spec = (~pick_diff) & (u_lobe < w_diff + w_spec)
            sign = jnp.where(wol_z < 0.0, -1.0, 1.0)
            # diffuse: cosine hemisphere on wo's side
            ddx, ddy = _concentric_disk(u0, u1)
            dz_l = jnp.sqrt(jnp.maximum(0.0, 1.0 - ddx * ddx - ddy * ddy))
            # specular: GGX VNDF reflect about wh flipped to wo's side
            hx, hy, hz = fb.ggx_sample_wh(
                wol_x, wol_y, wol_z, u0, u1, ic["ax"], ic["ay"]
            )
            neg_o = wol_z < 0.0
            shx = jnp.where(neg_o, -hx, hx)
            shy = jnp.where(neg_o, -hy, hy)
            shz = jnp.where(neg_o, -hz, hz)
            d_s = wol_x * shx + wol_y * shy + wol_z * shz
            sx_ = 2.0 * d_s * shx - wol_x
            sy_ = 2.0 * d_s * shy - wol_y
            sz_ = 2.0 * d_s * shz - wol_z
            # clearcoat: GTR1 wh sampling
            a_cc = ic["d1"]
            a2 = a_cc * a_cc
            cos_h = jnp.sqrt(
                jnp.maximum(
                    (1.0 - jnp.power(jnp.maximum(a2, 1e-12), 1.0 - u0))
                    / jnp.maximum(1.0 - a2, 1e-6),
                    0.0,
                )
            )
            sin_h = jnp.sqrt(jnp.maximum(1.0 - cos_h * cos_h, 0.0))
            phi = jnp.float32(2.0 * np.pi) * u1
            chx = sin_h * jnp.cos(phi)
            chy = sin_h * jnp.sin(phi)
            chz = cos_h * sign
            d_c = wol_x * chx + wol_y * chy + wol_z * chz
            cx_ = 2.0 * d_c * chx - wol_x
            cy_ = 2.0 * d_c * chy - wol_y
            cz_ = 2.0 * d_c * chz - wol_z
            wx = jnp.where(pick_diff, ddx, jnp.where(pick_spec, sx_, cx_))
            wy = jnp.where(pick_diff, ddy, jnp.where(pick_spec, sy_, cy_))
            wz = jnp.where(
                pick_diff, dz_l * sign, jnp.where(pick_spec, sz_, cz_)
            )
            eta = zero + ic["p0"]
            return (wx, wy, wz), event, eta, valid
        raise AssertionError(t)

    if len(stypes) == 1:
        return one(stypes[0])
    zero = jnp.zeros_like(wol_x)
    out_wi = [zero, zero, zero + 1.0]
    out_ev = zero
    out_eta = zero + 1.0
    out_valid = zero < 1.0
    for t in stypes:
        (wx, wy, wz), ev, eta, valid = one(t)
        m = stype_f == float(t)
        out_wi = [
            jnp.where(m, wx, out_wi[0]),
            jnp.where(m, wy, out_wi[1]),
            jnp.where(m, wz, out_wi[2]),
        ]
        out_ev = jnp.where(m, ev, out_ev)
        out_eta = jnp.where(m, eta, out_eta)
        out_valid = (m & valid) | (~m & out_valid)
    return tuple(out_wi), out_ev, out_eta, out_valid


def _glass_present(stypes):
    return fb.ST_GLASS in stypes


def _no_validate(stypes):
    """Types whose unfused closures SKIP validate_sides: glass (transmissive)
    and disney (surfaces/disney.py evaluate has no validate call)."""
    return [t for t in stypes if t in (fb.ST_GLASS, fb.ST_DISNEY)]


def _sin_cos_phi(x, y, sin_theta):
    inv = 1.0 / jnp.maximum(sin_theta, 1e-20)
    return x * inv, y * inv


def _fused_kernel(
    *refs,
    tables, stypes, n_tri, n_sph, n_inst, n_entry, n_light_tri, max_depth,
    rr_depth, rr_threshold, p_light, unroll, cam=None, persist_spp=0,
    p_env=0.0, env_distance=0.0, has_env=False,
):
    if cam is None:
        (ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, tmin_r, tmax_r, beta0_r, st_r,
         *rest) = refs
    else:
        (px_r, py_r, si_r, *rest) = refs
    if has_env:
        # environment support: the kernel never touches env tables — NEE
        # candidates arrive PRE-SAMPLED per (lane, bounce) (env_ref holds
        # [wi.xyz, pdf*p_env, L.rgb] x max_depth), and escaped rays write
        # (beta, pdf_bsdf, dir) for a deferred dense miss pass outside.
        # This is the TPU shape of "bindless env sampling": hoist every
        # table-dependent draw out of the VMEM-resident loop.
        assert persist_spp == 0, "persistent mode is env-free (draw offsets)"
        (env_ref, lr_o, lg_o, lb_o, nrays_o,
         mbr_o, mbg_o, mbb_o, mpdf_o, mdx_o, mdy_o, mdz_o) = rest
    else:
        (lr_o, lg_o, lb_o, nrays_o) = rest
    # Scene-static tables baked as HOST numpy: every tri[j, c] below becomes
    # a float literal in the traced kernel (a vector immediate for Mosaic)
    # instead of a VMEM scalar load + lane broadcast. This is per-scene
    # kernel specialization — exactly the reference's LuisaCompute JIT model.
    tri = tables["tri"]  # (P, 16) np
    sph = tables["sph"]  # (S, 16) np (analytic spheres; may be empty)
    flat_normals = bool(tables.get("flat_normals", False))
    shade = tables["shade"]  # (P, 40) np
    inst_t = tables["inst"]  # (NI, 16) np
    entry_t = tables["entry"]  # (NL, 8) np
    light_t = tables["light"]  # (LT, 24) np

    if cam is None:
        st = st_r[0]
        ox, oy, oz = ox_r[0], oy_r[0], oz_r[0]
        dx, dy, dz = dx_r[0], dy_r[0], dz_r[0]
        tmin = tmin_r[0]
        tmax = jnp.minimum(tmax_r[0], _F32_BIG)
        beta_r = beta0_r[0]
        beta_g = beta0_r[0]
        beta_b = beta0_r[0]
        zero = jnp.zeros_like(ox)
    else:
        # in-kernel camera generation (pinhole + box filter): mirrors
        # sampler.generate_pixel_2d -> BoxFilter.sample -> pinhole
        # _generate_ray_in_camera_space -> camera_to_world, bit-for-bit
        # per-(pixel, sample) seed computed in-kernel (rng.seed_pixels):
        # the pixel-id inputs are sample-invariant, so XLA hoists their
        # upload out of the per-sample loop entirely
        si = si_r[0, 0]
        px_i = px_r[0]
        py_i = py_r[0]
        px_f = px_i.astype(jnp.float32)
        py_f = py_i.astype(jnp.float32)
        zero = jnp.zeros_like(px_f)

        def gen_from_cam(si_lane):
            """Seed + camera ray for per-lane sample index si_lane (i32)."""
            st = _xxhash32_4(
                jax.lax.bitcast_convert_type(
                    jnp.zeros_like(px_i) + si_lane, jnp.uint32
                ),
                jax.lax.bitcast_convert_type(px_i, jnp.uint32),
                jax.lax.bitcast_convert_type(py_i, jnp.uint32),
                jnp.uint32(cam["sampler_seed"]),
            )
            st, u0 = _lcg(st)
            st, u1 = _lcg(st)
            fx = px_f + 0.5 + (u0 * 2.0 - 1.0) * jnp.float32(cam["radius"])
            fy = py_f + 0.5 + (u1 * 2.0 - 1.0) * jnp.float32(cam["radius"])
            pcx = (fx * 2.0 - jnp.float32(cam["resx"])) * jnp.float32(cam["s"])
            pcy = (fy * 2.0 - jnp.float32(cam["resy"])) * jnp.float32(cam["s"])
            dcx, dcy, dcz = _normalize3(pcx, -pcy, zero - 1.0)
            wdx = (jnp.float32(cam["c00"]) * dcx + jnp.float32(cam["c01"]) * dcy
                   + jnp.float32(cam["c02"]) * dcz)
            wdy = (jnp.float32(cam["c10"]) * dcx + jnp.float32(cam["c11"]) * dcy
                   + jnp.float32(cam["c12"]) * dcz)
            wdz = (jnp.float32(cam["c20"]) * dcx + jnp.float32(cam["c21"]) * dcy
                   + jnp.float32(cam["c22"]) * dcz)
            dx, dy, dz = _normalize3(wdx, wdy, wdz)
            ox = zero + jnp.float32(cam["c03"])
            oy = zero + jnp.float32(cam["c13"])
            oz = zero + jnp.float32(cam["c23"])
            return st, ox, oy, oz, dx, dy, dz

        st, ox, oy, oz, dx, dy, dz = gen_from_cam(jnp.zeros_like(px_i) + si)
        tmin = zero
        tmax = zero + jnp.float32(_F32_BIG)
        beta_r = zero + 1.0
        beta_g = zero + 1.0
        beta_b = zero + 1.0
    L_r = zero
    L_g = zero
    L_b = zero
    active_f = zero + 1.0  # carried as f32: Mosaic rejects i1 vector carries
    pdf_bsdf = zero + 1e16
    eta_scale = zero + 1.0
    nrays = jnp.zeros(ox.shape, jnp.int32)
    if has_env:
        mbr_o[0] = zero
        mbg_o[0] = zero
        mbb_o[0] = zero
        mpdf_o[0] = zero
        mdx_o[0] = zero
        mdy_o[0] = zero
        mdz_o[0] = zero + 1.0

    def bounce(dep, carry, dep_i=None):
        # dep: per-lane f32 bounce depth (a constant vector in the unrolled
        # megapath; a live carry in the persistent megawave mode)
        (ox, oy, oz, dx, dy, dz, tmin, tmax, st,
         beta_r, beta_g, beta_b, L_r, L_g, L_b, active_f, pdf_bsdf,
         eta_scale, nrays) = carry
        active = active_f > 0.5
        nrays = nrays + active.astype(jnp.int32)

        # --- closest trace + fused shade-row select -----------------------
        best_t = tmax
        best_u = zero
        best_v = zero
        hitv = zero > 1.0
        ngx = zero; ngy = zero; ngz = zero
        n0x = zero; n0y = zero; n0z = zero
        n1x = zero; n1y = zero; n1z = zero
        n2x = zero; n2y = zero; n2z = zero
        tgx = zero; tgy = zero; tgz = zero
        v0x = zero; v0y = zero; v0z = zero
        e1x = zero; e1y = zero; e1z = zero
        e2x = zero; e2y = zero; e2z = zero
        inst_f = zero
        for j in range(n_tri):
            if float(tri[j, 9]) == 0.0:
                continue  # padding row: skipped at trace time, zero cost
            ok, t, u, v = _moller_trumbore_row(tri, j, ox, oy, oz, dx, dy, dz)
            ok &= (t > tmin) & (t < best_t)
            best_t = jnp.where(ok, t, best_t)
            best_u = jnp.where(ok, u, best_u)
            best_v = jnp.where(ok, v, best_v)
            hitv = hitv | ok
            ngx = jnp.where(ok, float(shade[j, 9]), ngx)
            ngy = jnp.where(ok, float(shade[j, 10]), ngy)
            ngz = jnp.where(ok, float(shade[j, 11]), ngz)
            if not flat_normals:
                n0x = jnp.where(ok, float(shade[j, 13]), n0x)
                n0y = jnp.where(ok, float(shade[j, 14]), n0y)
                n0z = jnp.where(ok, float(shade[j, 15]), n0z)
                n1x = jnp.where(ok, float(shade[j, 16]), n1x)
                n1y = jnp.where(ok, float(shade[j, 17]), n1y)
                n1z = jnp.where(ok, float(shade[j, 18]), n1z)
                n2x = jnp.where(ok, float(shade[j, 19]), n2x)
                n2y = jnp.where(ok, float(shade[j, 20]), n2y)
                n2z = jnp.where(ok, float(shade[j, 21]), n2z)
            tgx = jnp.where(ok, float(shade[j, 28]), tgx)
            tgy = jnp.where(ok, float(shade[j, 29]), tgy)
            tgz = jnp.where(ok, float(shade[j, 30]), tgz)
            v0x = jnp.where(ok, float(tri[j, 0]), v0x)
            v0y = jnp.where(ok, float(tri[j, 1]), v0y)
            v0z = jnp.where(ok, float(tri[j, 2]), v0z)
            e1x = jnp.where(ok, float(tri[j, 3]), e1x)
            e1y = jnp.where(ok, float(tri[j, 4]), e1y)
            e1z = jnp.where(ok, float(tri[j, 5]), e1z)
            e2x = jnp.where(ok, float(tri[j, 6]), e2x)
            e2y = jnp.where(ok, float(tri[j, 7]), e2y)
            e2z = jnp.where(ok, float(tri[j, 8]), e2z)
            inst_f = jnp.where(ok, float(shade[j, 31]), inst_f)

        # --- analytic spheres (exact quadric; scene/compiler.py table) ----
        sph_hit = zero > 1.0
        if n_sph:
            scx = zero; scy = zero; scz = zero; sr = zero + 1.0
            for sj in range(n_sph):
                cx, cy, cz = float(sph[sj, 0]), float(sph[sj, 1]), float(sph[sj, 2])
                r = float(sph[sj, 3])
                ocx = ox - cx
                ocy = oy - cy
                ocz = oz - cz
                b = ocx * dx + ocy * dy + ocz * dz
                c2 = ocx * ocx + ocy * ocy + ocz * ocz - r * r
                disc = b * b - c2
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t0 = -b - sq
                t1 = -b + sq
                t = jnp.where((t0 > tmin) & (t0 < best_t), t0, t1)
                ok = (disc > 0.0) & (t > tmin) & (t < best_t)
                best_t = jnp.where(ok, t, best_t)
                hitv = hitv | ok
                # a later TRIANGLE can't win (tris already tested); a
                # later sphere only wins with a strictly smaller t
                sph_hit = sph_hit | ok
                scx = jnp.where(ok, cx, scx)
                scy = jnp.where(ok, cy, scy)
                scz = jnp.where(ok, cz, scz)
                sr = jnp.where(ok, r, sr)
                inst_f = jnp.where(ok, float(sph[sj, 13]), inst_f)

        # interaction reconstruction (scene/geometry.py surface_interaction)
        u_b = best_u
        v_b = best_v
        w_b = 1.0 - u_b - v_b
        px = v0x + u_b * e1x + v_b * e2x
        py = v0y + u_b * e1y + v_b * e2y
        pz = v0z + u_b * e1z + v_b * e2z
        if flat_normals:
            # authored normals == geometric normals everywhere (host check):
            # the interpolate+normalize+guard+flip chain is the identity
            nsx, nsy, nsz = ngx, ngy, ngz
        else:
            nsx = w_b * n0x + u_b * n1x + v_b * n2x
            nsy = w_b * n0y + u_b * n1y + v_b * n2y
            nsz = w_b * n0z + u_b * n1z + v_b * n2z
            ns_len2 = nsx * nsx + nsy * nsy + nsz * nsz
            inv_ns = 1.0 / jnp.maximum(
                jnp.sqrt(jnp.maximum(ns_len2, 0.0)), 1e-20
            )
            nsx = nsx * inv_ns
            nsy = nsy * inv_ns
            nsz = nsz * inv_ns
            ns_ok = (ns_len2 > 0.25) & jnp.isfinite(nsx) & jnp.isfinite(
                nsy
            ) & jnp.isfinite(nsz)
            nsx = jnp.where(ns_ok, nsx, ngx)
            nsy = jnp.where(ns_ok, nsy, ngy)
            nsz = jnp.where(ns_ok, nsz, ngz)
            flip_ns = _dot(nsx, nsy, nsz, ngx, ngy, ngz) < 0.0
            nsx = jnp.where(flip_ns, -nsx, nsx)
            nsy = jnp.where(flip_ns, -nsy, nsy)
            nsz = jnp.where(flip_ns, -nsz, nsz)

        if n_sph:
            # sphere lanes: p = c + r*n (matches surface_interaction's
            # exact reconstruction), ns = ng = n, tangent = dpdu direction
            # (R is identity-or-uniform here; non-identity rotations only
            # rotate the uv seam, irrelevant without textures)
            n_rx = (ox + best_t * dx - scx) / jnp.maximum(sr, 1e-20)
            n_ry = (oy + best_t * dy - scy) / jnp.maximum(sr, 1e-20)
            n_rz = (oz + best_t * dz - scz) / jnp.maximum(sr, 1e-20)
            n_rx, n_ry, n_rz = _normalize3(n_rx, n_ry, n_rz)
            sp_x = scx + sr * n_rx
            sp_y = scy + sr * n_ry
            sp_z = scz + sr * n_rz
            px = jnp.where(sph_hit, sp_x, px)
            py = jnp.where(sph_hit, sp_y, py)
            pz = jnp.where(sph_hit, sp_z, pz)
            ngx = jnp.where(sph_hit, n_rx, ngx)
            ngy = jnp.where(sph_hit, n_ry, ngy)
            ngz = jnp.where(sph_hit, n_rz, ngz)
            nsx = jnp.where(sph_hit, n_rx, nsx)
            nsy = jnp.where(sph_hit, n_ry, nsy)
            nsz = jnp.where(sph_hit, n_rz, nsz)
            tgx = jnp.where(sph_hit, -n_ry, tgx)
            tgy = jnp.where(sph_hit, n_rx, tgy)
            tgz = jnp.where(sph_hit, 0.0, tgz)

        wox = -dx
        woy = -dy
        woz = -dz
        valid = hitv & active
        if has_env:
            # latch escape state for the deferred miss pass (a lane escapes
            # at most once in the unrolled megapath: it goes inactive here)
            miss_now = active & ~hitv
            mbr_o[0] = jnp.where(miss_now, beta_r, mbr_o[0])
            mbg_o[0] = jnp.where(miss_now, beta_g, mbg_o[0])
            mbb_o[0] = jnp.where(miss_now, beta_b, mbb_o[0])
            mpdf_o[0] = jnp.where(miss_now, pdf_bsdf, mpdf_o[0])
            mdx_o[0] = jnp.where(miss_now, dx, mdx_o[0])
            mdy_o[0] = jnp.where(miss_now, dy, mdy_o[0])
            mdz_o[0] = jnp.where(miss_now, dz, mdz_o[0])

        # per-instance constants (v2 layout; only the columns the present
        # surface types need are selected)
        sel_idx = jnp.where(valid, inst_f, -1.0)
        base_cols = (0, 17, 18, 19, 20, 21, 22, 23, 24, 1, 2, 3)
        (stype_f, s2s, has_surf, has_light, em_r, em_g, em_b, l2s, l_area,
         c0r, c0g, c0b) = _select_row(inst_t, sel_idx, base_cols, n_inst)
        ic = {"c0r": c0r, "c0g": c0g, "c0b": c0b}
        if any(
            t in stypes
            for t in (fb.ST_MATTE, fb.ST_PLASTIC, fb.ST_GLASS, fb.ST_DISNEY)
        ):
            ic["p0"], ic["p1"] = _select_row(inst_t, sel_idx, (13, 14), n_inst)
        if any(t != fb.ST_MATTE for t in stypes):
            ic["ax"], ic["ay"] = _select_row(inst_t, sel_idx, (15, 16), n_inst)
        if fb.ST_PLASTIC in stypes or fb.ST_GLASS in stypes:
            ic["c1r"], ic["c1g"], ic["c1b"] = _select_row(
                inst_t, sel_idx, (4, 5, 6), n_inst
            )
        if fb.ST_METAL in stypes:
            (ic["c2r"], ic["c2g"], ic["c2b"], ic["c3r"], ic["c3g"],
             ic["c3b"]) = _select_row(
                inst_t, sel_idx, (7, 8, 9, 10, 11, 12), n_inst
            )
        if fb.ST_DISNEY in stypes:
            if fb.ST_METAL not in stypes:
                (ic["c2r"], ic["c2g"], ic["c2b"], ic["c3r"], ic["c3g"],
                 ic["c3b"]) = _select_row(
                    inst_t, sel_idx, (7, 8, 9, 10, 11, 12), n_inst
                )
            if fb.ST_PLASTIC not in stypes and fb.ST_GLASS not in stypes:
                ic["c1r"], ic["c1g"], ic["c1b"] = _select_row(
                    inst_t, sel_idx, (4, 5, 6), n_inst
                )
            (ic["d0"], ic["d1"], ic["d2"], ic["d3"], ic["d4"],
             ic["d5"]) = _select_row(
                inst_t, sel_idx, (25, 26, 27, 28, 29, 30), n_inst
            )

        # --- emissive hit (bounce_step "hit an emissive instance") --------
        is_light = valid & (has_light > 0.5)
        cos_l = _dot(wox, woy, woz, ngx, ngy, ngz)
        lit = (cos_l > 1e-6) | ((l2s > 0.5) & (jnp.abs(cos_l) > 1e-6))
        dlx = ox - px
        dly = oy - py
        dlz = oz - pz
        d2 = dlx * dlx + dly * dly + dlz * dlz
        pdf_hit = jnp.where(
            lit, d2 / jnp.maximum(jnp.abs(cos_l) * l_area, 1e-12), 0.0
        ) * jnp.float32(p_light)
        w_mis_hit = _balance(pdf_bsdf, pdf_hit)
        add = is_light & lit
        L_r = jnp.where(add, L_r + beta_r * em_r * w_mis_hit, L_r)
        L_g = jnp.where(add, L_g + beta_g * em_g * w_mis_hit, L_g)
        L_b = jnp.where(add, L_b + beta_b * em_b * w_mis_hit, L_b)

        active = valid & (has_surf > 0.5)

        # --- uniform draws (order matches common.bounce_step) -------------
        st, u_sel = _lcg(st)
        st, u_l0 = _lcg(st)
        st, u_l1 = _lcg(st)
        st, u_lobe = _lcg(st)
        st, u_b0 = _lcg(st)
        st, u_b1 = _lcg(st)
        st, u_rr = _lcg(st)

        # --- shading frame (oriented, two-sided aware) --------------------
        fr = _frame_from_z_and_hint(nsx, nsy, nsz, tgx, tgy, tgz)
        sx, sy, sz, tx, ty, tz = fr
        fnx, fny, fnz = nsx, nsy, nsz
        flip2 = (_dot(wox, woy, woz, fnx, fny, fnz) < 0.0) & (s2s > 0.5)
        tx = jnp.where(flip2, -tx, tx)
        ty = jnp.where(flip2, -ty, ty)
        tz = jnp.where(flip2, -tz, tz)
        fnx = jnp.where(flip2, -fnx, fnx)
        fny = jnp.where(flip2, -fny, fny)
        fnz = jnp.where(flip2, -fnz, fnz)
        wol_x = _dot(wox, woy, woz, sx, sy, sz)
        wol_y = _dot(wox, woy, woz, tx, ty, tz)
        wol_z = _dot(wox, woy, woz, fnx, fny, fnz)
        wo_dot_ng = _dot(wox, woy, woz, ngx, ngy, ngz)
        wo_dot_ns = _dot(wox, woy, woz, fnx, fny, fnz)

        # --- NEE ----------------------------------------------------------
        if n_entry > 0 or has_env:
            if has_env:
                # pre-sampled env candidate for THIS bounce (see module doc)
                if isinstance(dep_i, int):
                    ev = [env_ref[0, dep_i * 7 + k] for k in range(7)]
                else:  # interpret-mode fori_loop: dynamic depth index
                    eb = env_ref[0]
                    ev = [
                        jax.lax.dynamic_index_in_dim(
                            eb, dep_i * 7 + k, 0, keepdims=False
                        )
                        for k in range(7)
                    ]
                evx, evy, evz, ev_pdf, evl_r, evl_g, evl_b = ev
                pick_env = u_sel < jnp.float32(p_env)
            if n_entry > 0:
                u_area = u_sel
                if has_env:
                    # uniform.py: map u in [p_env, 1) to light entries
                    u_area = (u_sel - jnp.float32(p_env)) * jnp.float32(
                        1.0 / max(1.0 - p_env, 1e-8)
                    )
                u_rel = jnp.clip(u_area, 0.0, _ONE_MINUS_EPS)
                entry_f = jnp.minimum(
                    jnp.floor(u_rel * float(n_entry)), float(n_entry - 1)
                )
                al_off, tri_cnt, tot_area, el_r, el_g, el_b, el_2s = _select_row(
                    entry_t, entry_f, (0, 1, 2, 4, 5, 6, 7), n_entry)
                # alias-table triangle pick (lights/diffuse.py _pick_triangle)
                ux = u_l0 * tri_cnt
                i0 = jnp.minimum(jnp.floor(ux), tri_cnt - 1.0)
                i0 = jnp.maximum(i0, 0.0)
                up = ux - i0
                g0 = al_off + i0
                prob0, alias0 = _select_row(light_t, g0, (18, 19), n_light_tri)
                take_alias = up >= prob0
                g = jnp.where(take_alias, al_off + alias0, g0)
                (lv0x, lv0y, lv0z, le1x, le1y, le1z, le2x, le2y, le2z,
                 lngx, lngy, lngz) = _select_row(
                    light_t, g, (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11),
                    n_light_tri)
                su = jnp.sqrt(jnp.maximum(up, 0.0))
                b0 = 1.0 - su
                b1 = u_l1 * su
                b2 = 1.0 - b0 - b1
                lpx = lv0x + b1 * le1x + b2 * le2x
                lpy = lv0y + b1 * le1y + b2 * le2y
                lpz = lv0z + b1 * le1z + b2 * le2z
            else:
                lngx = zero; lngy = zero; lngz = zero + 1.0
                lpx = px; lpy = py; lpz = pz
            if has_env:
                # env target: far point along the candidate direction with
                # ng = -wi (uniform.py sample: p = it.p + wi*env_distance)
                lpx = jnp.where(
                    pick_env, px + evx * jnp.float32(env_distance), lpx
                )
                lpy = jnp.where(
                    pick_env, py + evy * jnp.float32(env_distance), lpy
                )
                lpz = jnp.where(
                    pick_env, pz + evz * jnp.float32(env_distance), lpz
                )
                lngx = jnp.where(pick_env, -evx, lngx)
                lngy = jnp.where(pick_env, -evy, lngy)
                lngz = jnp.where(pick_env, -evz, lngz)
            # direction & pdf (lights/diffuse.py sample)
            wlx = lpx - px
            wly = lpy - py
            wlz = lpz - pz
            wl_len = jnp.sqrt(
                jnp.maximum(wlx * wlx + wly * wly + wlz * wlz, 0.0)
            )
            inv_wl = 1.0 / jnp.maximum(wl_len, 1e-12)
            wix = wlx * inv_wl
            wiy = wly * inv_wl
            wiz = wlz * inv_wl
            if n_entry > 0:
                cos_ll = _dot(-wix, -wiy, -wiz, lngx, lngy, lngz)
                lit_l = (cos_ll > 1e-6) | (
                    (el_2s > 0.5) & (jnp.abs(cos_ll) > 1e-6)
                )
                d2l = wlx * wlx + wly * wly + wlz * wlz
                pdf_nee = jnp.where(
                    lit_l,
                    d2l / jnp.maximum(jnp.abs(cos_ll) * tot_area, 1e-12),
                    0.0,
                ) * jnp.float32(p_light)
                Ln_r = jnp.where(lit_l, el_r, 0.0)
                Ln_g = jnp.where(lit_l, el_g, 0.0)
                Ln_b = jnp.where(lit_l, el_b, 0.0)
            else:
                lit_l = zero > 1.0
                pdf_nee = zero
                Ln_r = zero; Ln_g = zero; Ln_b = zero
            if has_env:
                pdf_nee = jnp.where(pick_env, ev_pdf, pdf_nee)
                Ln_r = jnp.where(pick_env, evl_r, Ln_r)
                Ln_g = jnp.where(pick_env, evl_g, Ln_g)
                Ln_b = jnp.where(pick_env, evl_b, Ln_b)
            pending = active & (pdf_nee > 0.0)
            nrays = nrays + pending.astype(jnp.int32)

            # shadow ray (core/types.py spawn_ray_to)
            sgn_f = jnp.where(
                _dot(ngx, ngy, ngz, wlx, wly, wlz) >= 0.0, 1.0, -1.0
            )
            sox = _offset1(px, sgn_f * ngx)
            soy = _offset1(py, sgn_f * ngy)
            soz = _offset1(pz, sgn_f * ngz)
            bx = sox - lpx
            by = soy - lpy
            bz = soz - lpz
            sgn_t = jnp.where(
                _dot(lngx, lngy, lngz, bx, by, bz) >= 0.0, 1.0, -1.0
            )
            sex = _offset1(lpx, sgn_t * lngx)
            sey = _offset1(lpy, sgn_t * lngy)
            sez = _offset1(lpz, sgn_t * lngz)
            sdx = sex - sox
            sdy = sey - soy
            sdz = sez - soz
            s_len = jnp.sqrt(
                jnp.maximum(sdx * sdx + sdy * sdy + sdz * sdz, 0.0)
            )
            inv_s = 1.0 / jnp.maximum(s_len, 1e-20)
            sdx = sdx * inv_s
            sdy = sdy * inv_s
            sdz = sdz * inv_s
            s_tmax = jnp.where(pending, s_len * (1.0 - 1e-3), 0.0)

            # surface evaluate at wi_nee (surfaces/base.py dispatch)
            wil_x = _dot(wix, wiy, wiz, sx, sy, sz)
            wil_y = _dot(wix, wiy, wiz, tx, ty, tz)
            wil_z = _dot(wix, wiy, wiz, fnx, fny, fnz)
            fe_r, fe_g, fe_b, fe_pdf = _dispatch_eval(
                stypes, ic, stype_f, (wol_x, wol_y, wol_z),
                (wil_x, wil_y, wil_z),
            )
            # validate_sides (surfaces/base.py) — glass closures skip it
            wi_dot_ng = _dot(wix, wiy, wiz, ngx, ngy, ngz)
            wi_dot_ns = _dot(wix, wiy, wiz, fnx, fny, fnz)
            side_ok = (wo_dot_ng * wi_dot_ng > 0.0) == (
                wo_dot_ns * wi_dot_ns > 0.0
            )
            for t_nv in _no_validate(stypes):
                side_ok = side_ok | (stype_f == float(t_nv))
            fe_r = jnp.where(side_ok, fe_r, 0.0)
            fe_g = jnp.where(side_ok, fe_g, 0.0)
            fe_b = jnp.where(side_ok, fe_b, 0.0)
            fe_pdf = jnp.where(side_ok, fe_pdf, 0.0)
            w_mis = _safe_div(_balance(pdf_nee, fe_pdf), pdf_nee)

            # occlusion (trace_any over opaque rows)
            occ = zero > 1.0
            for j in range(n_tri):
                if float(tri[j, 9]) == 0.0 or float(tri[j, 10]) == 0.0:
                    continue  # padding / shadow-transparent: static skip
                okq, tq, _, _ = _moller_trumbore_row(
                    tri, j, sox, soy, soz, sdx, sdy, sdz
                )
                occ |= okq & (tq > 0.0) & (tq < s_tmax)
            for sj in range(n_sph):
                if float(sph[sj, 14]) == 0.0:
                    continue  # shadow-transparent sphere: static skip
                cx, cy, cz = float(sph[sj, 0]), float(sph[sj, 1]), float(sph[sj, 2])
                r = float(sph[sj, 3])
                ocx = sox - cx
                ocy = soy - cy
                ocz = soz - cz
                b = ocx * sdx + ocy * sdy + ocz * sdz
                c2 = ocx * ocx + ocy * ocy + ocz * ocz - r * r
                disc = b * b - c2
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t0 = -b - sq
                t1 = -b + sq
                occ |= (disc > 0.0) & (
                    ((t0 > 0.0) & (t0 < s_tmax)) | ((t1 > 0.0) & (t1 < s_tmax))
                )
            nee_ok = pending & ~occ
            cb_r = beta_r * fe_r * Ln_r * w_mis
            cb_g = beta_g * fe_g * Ln_g * w_mis
            cb_b = beta_b * fe_b * Ln_b * w_mis
            L_r = jnp.where(nee_ok, L_r + cb_r, L_r)
            L_g = jnp.where(nee_ok, L_g + cb_g, L_g)
            L_b = jnp.where(nee_ok, L_b + cb_b, L_b)

        # --- BSDF sampling (per-type lobe sampling + shared eval) ---------
        (smp_x, smp_y, smp_z), ev_f, eta_smp, samp_ok = _dispatch_sample_wi(
            stypes, ic, stype_f, (wol_x, wol_y, wol_z), u_lobe, u_b0, u_b1
        )
        fs_r, fs_g, fs_b, fs_pdf = _dispatch_eval(
            stypes, ic, stype_f, (wol_x, wol_y, wol_z),
            (smp_x, smp_y, smp_z),
        )
        fs_pdf = jnp.where(samp_ok, fs_pdf, 0.0)
        nwx = smp_x * sx + smp_y * tx + smp_z * fnx
        nwy = smp_x * sy + smp_y * ty + smp_z * fny
        nwz = smp_x * sz + smp_y * tz + smp_z * fnz
        wi_dot_ng_s = _dot(nwx, nwy, nwz, ngx, ngy, ngz)
        wi_dot_ns_s = _dot(nwx, nwy, nwz, fnx, fny, fnz)
        side_ok_s = (wo_dot_ng * wi_dot_ng_s > 0.0) == (
            wo_dot_ns * wi_dot_ns_s > 0.0
        )
        for t_nv in _no_validate(stypes):
            side_ok_s = side_ok_s | (stype_f == float(t_nv))
        fs_r = jnp.where(side_ok_s, fs_r, 0.0)
        fs_g = jnp.where(side_ok_s, fs_g, 0.0)
        fs_b = jnp.where(side_ok_s, fs_b, 0.0)
        fs_pdf = jnp.where(side_ok_s, fs_pdf, 0.0)

        # spawn the continuation ray (core/types.py spawn_ray)
        sgn_r = jnp.where(_dot(ngx, ngy, ngz, nwx, nwy, nwz) >= 0.0, 1.0, -1.0)
        rox = _offset1(px, sgn_r * ngx)
        roy = _offset1(py, sgn_r * ngy)
        roz = _offset1(pz, sgn_r * ngz)
        ox = jnp.where(active, rox, ox)
        oy = jnp.where(active, roy, oy)
        oz = jnp.where(active, roz, oz)
        dx = jnp.where(active, nwx, dx)
        dy = jnp.where(active, nwy, dy)
        dz = jnp.where(active, nwz, dz)
        tmin = jnp.where(active, 0.0, tmin)
        tmax = jnp.where(active, _F32_BIG, tmax)
        pdf_bsdf = jnp.where(active, fs_pdf, pdf_bsdf)
        nb_r = beta_r * _safe_div(fs_r, fs_pdf)
        nb_g = beta_g * _safe_div(fs_g, fs_pdf)
        nb_b = beta_b * _safe_div(fs_b, fs_pdf)
        nb_r = jnp.where(jnp.isfinite(nb_r), nb_r, 0.0)
        nb_g = jnp.where(jnp.isfinite(nb_g), nb_g, 0.0)
        nb_b = jnp.where(jnp.isfinite(nb_b), nb_b, 0.0)
        beta_r = jnp.where(active, nb_r, beta_r)
        beta_g = jnp.where(active, nb_g, beta_g)
        beta_b = jnp.where(active, nb_b, beta_b)
        beta_max = jnp.maximum(beta_r, jnp.maximum(beta_g, beta_b))
        if _glass_present(stypes):
            es_new = jnp.where(
                ev_f == float(fb.EVENT_ENTER),
                eta_scale * eta_smp * eta_smp,
                jnp.where(
                    ev_f == float(fb.EVENT_EXIT),
                    eta_scale / jnp.maximum(eta_smp * eta_smp, 1e-12),
                    eta_scale,
                ),
            )
            eta_scale = jnp.where(active, es_new, eta_scale)
        active = active & (fs_pdf > 0.0) & (beta_max > 0.0)

        # --- Russian roulette (bounce_step) -------------------------------
        q = jnp.maximum(beta_max * eta_scale, 0.05)
        do_rr = ((dep + 1.0) >= float(rr_depth)) & active
        small_q = q < jnp.float32(rr_threshold)
        kill = do_rr & small_q & (u_rr >= q)
        boost = jnp.where(
            do_rr & small_q, 1.0 / jnp.maximum(q, 1e-6), 1.0
        )
        beta_r = beta_r * boost
        beta_g = beta_g * boost
        beta_b = beta_b * boost
        active = active & ~kill & ((dep + 1.0) < float(max_depth))
        active_f = jnp.where(active, 1.0, 0.0)

        return (ox, oy, oz, dx, dy, dz, tmin, tmax, st,
                beta_r, beta_g, beta_b, L_r, L_g, L_b, active_f, pdf_bsdf,
                eta_scale, nrays)

    carry = (ox, oy, oz, dx, dy, dz, tmin, tmax, st,
             beta_r, beta_g, beta_b, L_r, L_g, L_b, active_f, pdf_bsdf,
             eta_scale, nrays)
    if persist_spp:
        # --- persistent megawave mode (megawave.cpp:300-470 re-imagined):
        # each lane owns its pixel and runs ALL persist_spp samples inside
        # ONE kernel; when a path dies its radiance is splatted to a lane
        # accumulator and the lane immediately regenerates its pixel's next
        # sample in-kernel — no lane ever idles at a path boundary (the
        # unrolled megapath pays the dead tail of every bounce). The
        # while_loop runs until every lane exhausted its samples; a hard
        # iteration cap guards against pathological RR sequences.
        assert cam is not None, "persistent mode requires in-kernel camgen"
        samp = jnp.zeros(zero.shape, jnp.int32)
        dep = zero
        acc_r = zero
        acc_g = zero
        acc_b = zero
        max_iters = persist_spp * max_depth + 8

        def p_cond(state):
            it_ctr = state[0]
            active_f = state[2][15]
            return (it_ctr < max_iters) & jnp.any(active_f > 0.5)

        def p_body(state):
            it_ctr, (samp, dep, acc_r, acc_g, acc_b), carry = state
            was_active = carry[15] > 0.5
            carry = bounce(dep, carry)
            (ox, oy, oz, dx, dy, dz, tmin, tmax, st,
             beta_r, beta_g, beta_b, L_r, L_g, L_b, active_f, pdf_bsdf,
             eta_scale, nrays) = carry
            now_active = active_f > 0.5
            died = was_active & ~now_active
            # splat the finished path
            acc_r = acc_r + jnp.where(died, L_r, 0.0)
            acc_g = acc_g + jnp.where(died, L_g, 0.0)
            acc_b = acc_b + jnp.where(died, L_b, 0.0)
            samp = samp + died.astype(jnp.int32)
            regen = died & (samp < persist_spp)
            st_n, ox_n, oy_n, oz_n, dx_n, dy_n, dz_n = gen_from_cam(
                jnp.zeros_like(samp) + si + samp
            )
            sel = lambda a, b: jnp.where(regen, a, b)
            ox = sel(ox_n, ox)
            oy = sel(oy_n, oy)
            oz = sel(oz_n, oz)
            dx = sel(dx_n, dx)
            dy = sel(dy_n, dy)
            dz = sel(dz_n, dz)
            st = jnp.where(regen, st_n, st)
            tmin = sel(zero, tmin)
            tmax = sel(zero + jnp.float32(_F32_BIG), tmax)
            beta_r = sel(zero + 1.0, beta_r)
            beta_g = sel(zero + 1.0, beta_g)
            beta_b = sel(zero + 1.0, beta_b)
            L_r = sel(zero, L_r)
            L_g = sel(zero, L_g)
            L_b = sel(zero, L_b)
            pdf_bsdf = sel(zero + 1e16, pdf_bsdf)
            eta_scale = sel(zero + 1.0, eta_scale)
            dep = jnp.where(regen, 0.0, dep + jnp.where(now_active, 1.0, 0.0))
            active_f = jnp.where(regen, 1.0, active_f)
            carry = (ox, oy, oz, dx, dy, dz, tmin, tmax, st,
                     beta_r, beta_g, beta_b, L_r, L_g, L_b, active_f,
                     pdf_bsdf, eta_scale, nrays)
            return it_ctr + 1, (samp, dep, acc_r, acc_g, acc_b), carry

        _, (samp, dep, acc_r, acc_g, acc_b), carry = jax.lax.while_loop(
            p_cond, p_body, (jnp.int32(0), (samp, dep, acc_r, acc_g, acc_b),
                             carry)
        )
        # a lane can exit the cap-bound loop mid-path only in pathological
        # cases; its partial L is dropped (bounded bias guard, never hit in
        # practice: the cap is spp*max_depth+8 and a path takes <= max_depth)
        lr_o[0] = acc_r
        lg_o[0] = acc_g
        lb_o[0] = acc_b
        nrays_o[0] = carry[18]
        return
    if unroll:
        # static unroll: no loop-carried vregs to spill, and Mosaic hoists
        # the scalar triangle-table loads across bounces (238 vs 224 Mray/s)
        for i in range(max_depth):
            carry = bounce(zero + float(i), carry, dep_i=i)
    else:
        # interpret mode traces the body once; unrolling would make the
        # CPU-interpret tests intractably slow
        carry = jax.lax.fori_loop(
            0, max_depth,
            lambda i, c: bounce(zero + i.astype(jnp.float32), c, dep_i=i),
            carry,
        )
    (_, _, _, _, _, _, _, _, _,
     _, _, _, L_r, L_g, L_b, _, _, _, nrays) = carry
    lr_o[0] = L_r
    lg_o[0] = L_g
    lb_o[0] = L_b
    nrays_o[0] = nrays


_ray_spec = pl.BlockSpec(
    (1, SUB, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
)
_table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)


def camgen_params(camera, time=0.0):
    """Static in-kernel camera-generation parameters, or None when the
    camera/filter combination needs the general outside path. Covers pinhole
    (no lens sampling) + box filter (analytic offsets) + no clip planes."""
    if type(camera).__name__ != "PinholeCamera":
        return None
    if type(camera.filter).__name__ != "BoxFilter":
        return None
    if camera.clip_plane is not None:
        return None
    c2w = np.asarray(camera.camera_to_world(float(time)), np.float32)
    resx, resy = camera.film.resolution
    tan_half = float(np.tan(np.deg2rad(camera.fov) * 0.5))
    p = {
        "radius": float(camera.filter.radius),
        "resx": float(resx),
        "resy": float(resy),
        "s": float(tan_half / resy),
    }
    for r in range(3):
        for c in range(4):
            p[f"c{r}{c}"] = float(c2w[r, c])
    return p


def _host_tables(compiled):
    """Scene-static tables snapshotted to HOST numpy, cached per compiled
    scene. Read from compiled.arrays (the concrete originals), so this works
    even while the caller is being jit-traced with a donated arrays pytree.
    The kernel bakes these as float literals — per-scene specialization, so
    scene edits require recompiling the scene (exactly the reference's
    LuisaCompute JIT contract)."""
    cached = getattr(compiled, "_fused_host_tables", None)
    if cached is None:
        # pure-numpy table build: jnp ops here would be captured by any
        # enclosing jit trace (ops trace even on concrete inputs)
        tr = compiled.arrays["trace"]
        v0 = np.asarray(tr["tri_v0"])
        e1 = np.asarray(tr["tri_e1"])
        e2 = np.asarray(tr["tri_e2"])
        valid = (np.asarray(tr["prim_index"]) >= 0).astype(np.float32)
        opaque = np.asarray(tr["tri_opaque"]).astype(np.float32)
        pcount = v0.shape[0]
        tri = np.zeros((pcount, 16), np.float32)
        tri[:, 0:3] = v0
        tri[:, 3:6] = e1
        tri[:, 6:9] = e2
        tri[:, 9] = valid
        tri[:, 10] = opaque
        shade_np = np.asarray(tr["shade_table"])
        v_rows = valid > 0.0
        flat = bool(
            np.all(
                np.abs(
                    shade_np[v_rows, 13:22]
                    - np.tile(shade_np[v_rows, 9:12], 3)
                )
                < 1e-7
            )
        ) if v_rows.any() else True
        inst_np = np.asarray(compiled.arrays["fused"]["inst_table"])
        has_surf = inst_np[:, 18] > 0.5
        stypes = sorted(set(int(t) for t in inst_np[has_surf, 0]))
        sph = compiled.arrays["trace"].get("sph")
        sph_np = (
            np.asarray(sph) if sph is not None else np.zeros((0, 16), np.float32)
        )
        cached = {
            "tri": tri,
            "sph": sph_np,
            "flat_normals": flat,
            "shade": shade_np,
            "inst": inst_np,
            "entry": np.asarray(compiled.arrays["fused"]["entry_table"]),
            "light": np.asarray(compiled.arrays["light_tri_rows"]),
            "stypes": stypes or [fb.ST_MATTE],
        }
        compiled._fused_host_tables = cached
    return cached


def _selection_p_env(compiled, light_sampler):
    """Static env selection probability — uniform.py _selection_probs."""
    if not getattr(compiled.plan, "has_environment", False):
        return 0.0
    if compiled.plan.num_lights > 0:
        ep = float(getattr(light_sampler, "env_prob", 0.5))
        return min(max(ep, 0.0), 1.0)
    return 1.0


def _env_nee_candidates(compiled, arrays, state, n, max_depth, p_env):
    """Pre-sampled env NEE candidates: max_depth*7 arrays of (N,) f32
    [wi.xyz, pdf*p_env, L.rgb] per bounce.

    The kernel's LCG draw order is 7 per bounce (u_sel, u_light.xy, u_lobe,
    u_bsdf.xy, u_rr), unconditionally — so the env sample each bounce WOULD
    draw can be reproduced here from the same per-lane state and handed to
    the kernel as plain inputs. The environment's direction distribution is
    position-independent (base/environment.h sample(p, u) ignores p except
    for shape), which is what makes the hoist exact."""
    ctx = compiled.context(arrays)
    env_obj = ctx.environment
    swl = compiled.spectrum.sample_wavelengths(jnp.zeros((n, 1), jnp.float32))
    p_dummy = jnp.zeros((n, 3), jnp.float32)
    out = []
    for _d in range(max_depth):
        state, _u_sel = _lcg(state)
        state, u_l0 = _lcg(state)
        state, u_l1 = _lcg(state)
        s = env_obj.sample(ctx, p_dummy, jnp.stack([u_l0, u_l1], -1), swl)
        out += [s["wi"][:, 0], s["wi"][:, 1], s["wi"][:, 2],
                s["pdf"] * jnp.float32(p_env),
                s["L"][:, 0], s["L"][:, 1], s["L"][:, 2]]
        for _k in range(4):
            state, _ = _lcg(state)
    return out


def _run_kernel(compiled, arrays, comps, n, nb, in_specs, *, cam,
                max_depth, rr_depth, rr_threshold, interpret,
                persist_spp=0, env_chunks=None, p_env=0.0):
    tables = _host_tables(compiled)
    n_entry = compiled.plan.num_lights
    has_env = env_chunks is not None
    env_distance = float(compiled.plan.env_distance) if has_env else 0.0
    kernel = partial(
        _fused_kernel,
        tables=tables,
        stypes=tuple(tables["stypes"]),
        n_tri=int(tables["tri"].shape[0]),
        n_sph=int(tables["sph"].shape[0]),
        n_inst=int(tables["inst"].shape[0]),
        n_entry=int(n_entry),
        n_light_tri=int(tables["light"].shape[0]),
        max_depth=int(max_depth),
        rr_depth=int(rr_depth),
        rr_threshold=float(rr_threshold),
        p_light=(1.0 - p_env) / max(n_entry, 1),
        unroll=UNROLL_DEPTH and not interpret,
        cam=cam,
        persist_spp=int(persist_spp),
        p_env=float(p_env),
        env_distance=env_distance,
        has_env=has_env,
    )
    n_out = 11 if has_env else 4
    if has_env:
        pad = nb * BLK - n
        d7 = len(env_chunks)
        envb = jnp.stack(
            [_blocked(c, pad, nb) for c in env_chunks], axis=1
        )  # (nb, depth*7, SUB, 128)
        comps = list(comps) + [envb]
        in_specs = list(in_specs) + [
            pl.BlockSpec(
                (1, d7, SUB, 128), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[_ray_spec] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct((nb, SUB, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb, SUB, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb, SUB, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb, SUB, 128), jnp.int32),
        ] + [
            jax.ShapeDtypeStruct((nb, SUB, 128), jnp.float32)
        ] * (n_out - 4),
        interpret=interpret,
    )(*comps)
    lr, lg, lb, nrays = outs[:4]
    rgb = jnp.stack(
        [lr.reshape(-1)[:n], lg.reshape(-1)[:n], lb.reshape(-1)[:n]], axis=-1
    )
    if has_env:
        # deferred miss pass (dense XLA): env radiance + MIS for escaped
        # rays; mirrors common.bounce_step's evaluate_miss contribution
        mbr, mbg, mbb, mpdf, mdx, mdy, mdz = (
            o.reshape(-1)[:n] for o in outs[4:]
        )
        ctx = compiled.context(arrays)
        env_obj = ctx.environment
        swl = compiled.spectrum.sample_wavelengths(
            jnp.zeros((n, 1), jnp.float32)
        )
        dirs = jnp.stack([mdx, mdy, mdz], axis=-1)
        ev = env_obj.evaluate(ctx, dirs, swl)
        pdf_env = ev["pdf"] * jnp.float32(p_env)
        w = _balance(mpdf, pdf_env)
        mb = jnp.stack([mbr, mbg, mbb], axis=-1)
        rgb = rgb + mb * ev["L"] * w[..., None]
    return rgb, jnp.sum(nrays.reshape(-1)[:n])


def _blocked(x, pad, nb, fill=0.0):
    return jnp.pad(x, (0, pad), constant_values=fill).reshape(nb, SUB, 128)


def trace_paths_fused(
    compiled, arrays, rays, cam_weight, state0, *, max_depth, rr_depth,
    rr_threshold, interpret=False, light_sampler=None,
):
    """Run the fused whole-path kernel on pre-generated camera rays.
    Returns (rgb (N, 3), n_rays scalar).

    rays: camera rays (core/types.py Ray, (N,) batch); cam_weight (N,);
    state0 (N,) uint32 independent-sampler state ALREADY advanced past the
    pixel-filter (and lens) draws, exactly as the unfused path's state is
    when entering the bounce loop."""
    n = rays.origin.shape[0]
    pad = (-n) % BLK
    nb = (n + pad) // BLK
    comps = [
        _blocked(rays.origin[:, 0], pad, nb),
        _blocked(rays.origin[:, 1], pad, nb),
        _blocked(rays.origin[:, 2], pad, nb),
        _blocked(rays.direction[:, 0], pad, nb),
        _blocked(rays.direction[:, 1], pad, nb, 1.0),
        _blocked(rays.direction[:, 2], pad, nb),
        _blocked(rays.t_min, pad, nb),
        _blocked(rays.t_max, pad, nb, -1.0),
        _blocked(cam_weight, pad, nb),
        _blocked(state0, pad, nb),
    ]
    p_env = _selection_p_env(compiled, light_sampler)
    env_chunks = None
    if getattr(compiled.plan, "has_environment", False):
        env_chunks = _env_nee_candidates(
            compiled, arrays, state0, n, max_depth, p_env
        )
    return _run_kernel(
        compiled, arrays, comps, n, nb, [_ray_spec] * 10, cam=None,
        max_depth=max_depth, rr_depth=rr_depth, rr_threshold=rr_threshold,
        interpret=interpret, env_chunks=env_chunks, p_env=p_env,
    )


_smem_spec = pl.BlockSpec(
    (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
)


def trace_paths_fused_camgen(
    compiled, arrays, cam, pixel_xy, sample_index, *, max_depth, rr_depth,
    rr_threshold, interpret=False, light_sampler=None,
):
    """Fused kernel with IN-KERNEL camera-ray generation AND sampler
    seeding: per-lane inputs are just the pixel ids (sample-invariant, so
    XLA hoists their upload out of the per-sample loop); the sample index
    rides in as one SMEM scalar. The kernel mirrors rng.seed_pixels ->
    generate_pixel_2d -> box filter -> pinhole -> camera_to_world."""
    n = pixel_xy.shape[0]
    pad = (-n) % BLK
    nb = (n + pad) // BLK
    comps = [
        _blocked(pixel_xy[..., 0], pad, nb),
        _blocked(pixel_xy[..., 1], pad, nb),
        jnp.reshape(jnp.asarray(sample_index, jnp.int32), (1, 1)),
    ]
    p_env = _selection_p_env(compiled, light_sampler)
    env_chunks = None
    if getattr(compiled.plan, "has_environment", False):
        # reproduce the kernel's per-lane seed + the 2 camera-filter draws,
        # then pre-sample the per-bounce env candidates from the same stream
        px_i = pixel_xy[..., 0].astype(jnp.int32)
        py_i = pixel_xy[..., 1].astype(jnp.int32)
        si = jnp.zeros_like(px_i) + jnp.asarray(sample_index, jnp.int32)
        st0 = _xxhash32_4(
            jax.lax.bitcast_convert_type(si, jnp.uint32),
            jax.lax.bitcast_convert_type(px_i, jnp.uint32),
            jax.lax.bitcast_convert_type(py_i, jnp.uint32),
            jnp.uint32(cam["sampler_seed"]),
        )
        st0, _ = _lcg(st0)
        st0, _ = _lcg(st0)
        env_chunks = _env_nee_candidates(
            compiled, arrays, st0, n, max_depth, p_env
        )
    return _run_kernel(
        compiled, arrays, comps, n, nb,
        [_ray_spec, _ray_spec, _smem_spec], cam=cam, max_depth=max_depth,
        rr_depth=rr_depth, rr_threshold=rr_threshold, interpret=interpret,
        env_chunks=env_chunks, p_env=p_env,
    )


def trace_paths_fused_persistent(
    compiled, arrays, cam, pixel_xy, sample_index0, n_samples, *, max_depth,
    rr_depth, rr_threshold, interpret=False,
):
    """Persistent megawave kernel: runs n_samples samples per pixel inside
    ONE launch with in-kernel path regeneration (no per-sample dead tail).
    Returns (rgb_sum (N, 3) — the SUM over n_samples — and n_rays).

    Env scenes are excluded: regeneration makes per-lane draw offsets
    path-length-dependent, so the pre-sampled env candidates (see
    _env_nee_candidates) cannot be aligned; callers route env scenes to the
    per-pass megapath instead."""
    assert not getattr(compiled.plan, "has_environment", False), (
        "persistent fused mode does not support environments"
    )
    n = pixel_xy.shape[0]
    pad = (-n) % BLK
    nb = (n + pad) // BLK
    comps = [
        _blocked(pixel_xy[..., 0], pad, nb),
        _blocked(pixel_xy[..., 1], pad, nb),
        jnp.reshape(jnp.asarray(sample_index0, jnp.int32), (1, 1)),
    ]
    return _run_kernel(
        compiled, arrays, comps, n, nb,
        [_ray_spec, _ray_spec, _smem_spec], cam=cam, max_depth=max_depth,
        rr_depth=rr_depth, rr_threshold=rr_threshold, interpret=interpret,
        persist_spp=n_samples,
    )


# Test hook: run the kernel in interpret mode on CPU (tests/test_fused_path.py)
FORCE_INTERPRET = False


def use_fused(compiled, sampler, light_sampler) -> bool:
    """Runtime eligibility: compile-time plan flag + node types + backend.

    Env scenes are eligible (round 5): NEE candidates are pre-sampled
    outside the kernel and misses are evaluated in a deferred dense pass;
    the uniform light sampler's env_prob rides in as the static p_env."""
    if os.environ.get("LUISARENDER_TPU_NO_FUSED"):
        return False
    if not getattr(compiled.plan, "fused_path", False):
        return False
    if type(sampler).__name__ != "IndependentSampler":
        return False
    if type(light_sampler).__name__ != "UniformLightSampler":
        return False
    return FORCE_INTERPRET or jax.default_backend() == "tpu"
