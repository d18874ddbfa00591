"""Component-wise BSDF closures for the fused whole-path kernel.

Mirrors core/microfacet.py and the surface closures (surfaces/{matte,mirror,
metal,plastic,glass}.py) on scalar lane blocks — every vector is a tuple of
(SUB, 128) components, and every material parameter arrives as a Python
float baked from the per-instance constant fold (ops/fused_path.py
inst_table). Algebraic simplifications vs the batched originals (e.g. the
GGX `e` term) are exact except at measure-zero guard boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_PI = float(np.pi)
INV_PI = 1.0 / _PI

# surface-type tags in the fused inst_table (col 0)
ST_MATTE = 0
ST_MIRROR = 1
ST_METAL = 2
ST_PLASTIC = 3
ST_GLASS = 4
ST_NULL = 5
ST_DISNEY = 6

EVENT_REFLECT = 0
EVENT_ENTER = 1
EVENT_EXIT = 2


def _normalize3(x, y, z, eps=1e-20):
    inv = 1.0 / jnp.maximum(jnp.sqrt(x * x + y * y + z * z), eps)
    return x * inv, y * inv, z * inv


# ---------------------------------------------------------------------------
# GGX (Trowbridge-Reitz), anisotropic; ax/ay per-lane arrays or floats
# ---------------------------------------------------------------------------


def ggx_d(hx, hy, hz, ax, ay):
    cos2 = hz * hz
    cos4 = cos2 * cos2
    # tan2 * ((cos_phi/ax)^2 + (sin_phi/ay)^2) == (hx^2/ax^2 + hy^2/ay^2)/cos2
    e = (hx * hx / (ax * ax) + hy * hy / (ay * ay)) / jnp.maximum(cos2, 1e-12)
    d = 1.0 / (_PI * ax * ay * jnp.maximum(cos4, 1e-12) * (1.0 + e) ** 2)
    return jnp.where(cos2 > 1e-12, d, 0.0)


def ggx_lambda(wx, wy, wz, ax, ay):
    cos2 = wz * wz
    a2tan2 = (wx * wx * ax * ax + wy * wy * ay * ay) / jnp.maximum(cos2, 1e-12)
    lam = 0.5 * (-1.0 + jnp.sqrt(jnp.maximum(1.0 + a2tan2, 0.0)))
    return jnp.where(cos2 > 1e-12, lam, 0.0)


def ggx_g(wox, woy, woz, wix, wiy, wiz, ax, ay):
    return 1.0 / (
        1.0
        + ggx_lambda(wox, woy, woz, ax, ay)
        + ggx_lambda(wix, wiy, wiz, ax, ay)
    )


def ggx_g1(wx, wy, wz, ax, ay):
    return 1.0 / (1.0 + ggx_lambda(wx, wy, wz, ax, ay))


def ggx_sample_wh(wox, woy, woz, u0, u1, ax, ay):
    flip = woz < 0.0
    ux = jnp.where(flip, -wox, wox)
    uy = jnp.where(flip, -woy, woy)
    uz = jnp.where(flip, -woz, woz)
    vx, vy, vz = _normalize3(ax * ux, ay * uy, uz)
    lensq = vx * vx + vy * vy
    ok = lensq > 1e-12
    inv_l = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-12))
    t1x = jnp.where(ok, -vy * inv_l, 1.0)
    t1y = jnp.where(ok, vx * inv_l, 0.0)
    t1z = jnp.zeros_like(vx)
    t2x = vy * t1z - vz * t1y
    t2y = vz * t1x - vx * t1z
    t2z = vx * t1y - vy * t1x
    r = jnp.sqrt(jnp.maximum(u0, 0.0))
    phi = 2.0 * _PI * u1
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    sc = 0.5 * (1.0 + vz)
    p2 = (1.0 - sc) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + sc * p2
    pz = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nhx = p1 * t1x + p2 * t2x + pz * vx
    nhy = p1 * t1y + p2 * t2y + pz * vy
    nhz = p1 * t1z + p2 * t2z + pz * vz
    return _normalize3(ax * nhx, ay * nhy, jnp.maximum(nhz, 1e-6))


def ggx_pdf(wox, woy, woz, hx, hy, hz, ax, ay):
    flip = woz < 0.0
    ux = jnp.where(flip, -wox, wox)
    uy = jnp.where(flip, -woy, woy)
    uz = jnp.where(flip, -woz, woz)
    return (
        ggx_d(hx, hy, hz, ax, ay)
        * ggx_g1(ux, uy, uz, ax, ay)
        * jnp.maximum(ux * hx + uy * hy + uz * hz, 0.0)
        / jnp.maximum(jnp.abs(uz), 1e-8)
    )


# ---------------------------------------------------------------------------
# Fresnel
# ---------------------------------------------------------------------------


def fres_dielectric(cos_i, eta_t):
    """Unpolarized dielectric Fresnel with eta_i = 1."""
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    entering = cos_i > 0.0
    ei = jnp.where(entering, 1.0, eta_t)
    et = jnp.where(entering, eta_t, 1.0)
    ci = jnp.abs(cos_i)
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - ci * ci))
    sin_t = ei / et * sin_i
    tir = sin_t >= 1.0
    ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))
    r_par = (et * ci - ei * ct) / jnp.maximum(et * ci + ei * ct, 1e-8)
    r_perp = (ei * ci - et * ct) / jnp.maximum(ei * ci + et * ct, 1e-8)
    f = 0.5 * (r_par * r_par + r_perp * r_perp)
    return jnp.where(tir, 1.0, f)


def fres_conductor_1(cos_i, eta, k):
    """Conductor Fresnel, one channel; eta/k per-lane arrays or floats."""
    ci = jnp.clip(jnp.abs(cos_i), 0.0, 1.0)
    ci2 = ci * ci
    si2 = 1.0 - ci2
    eta2 = eta * eta
    k2 = k * k
    t0 = eta2 - k2 - si2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * k2, 0.0))
    t1 = a2b2 + ci2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * ci
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-8)
    t3 = ci2 * a2b2 + si2 * si2
    t4 = t2 * si2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-8)
    return 0.5 * (rp + rs)


def fres_schlick_1(cos_i, f0):
    m = jnp.clip(1.0 - jnp.abs(cos_i), 0.0, 1.0)
    w = (m * m) * (m * m) * m
    return f0 + (1.0 - f0) * w


# ---------------------------------------------------------------------------
# Per-type (f, pdf) evaluation at a given local wi. Each returns
# (f_r, f_g, f_b, pdf) WITHOUT side validation (caller applies it where the
# unfused surface does). `ic` holds per-lane selected instance constants.
# ---------------------------------------------------------------------------


def eval_matte(ic, wol, wil):
    wol_x, wol_y, wol_z = wol
    wil_x, wil_y, wil_z = wil
    cos_o = jnp.abs(wol_z)
    cos_i = jnp.abs(wil_z)
    sin2_o = jnp.maximum(1.0 - wol_z * wol_z, 0.0)
    sin2_i = jnp.maximum(1.0 - wil_z * wil_z, 0.0)
    sin_o = jnp.sqrt(sin2_o)
    sin_i = jnp.sqrt(sin2_i)
    inv_so = 1.0 / jnp.maximum(sin_o, 1e-20)
    inv_si = 1.0 / jnp.maximum(sin_i, 1e-20)
    cos_d_phi = (wil_x * inv_si) * (wol_x * inv_so) + (
        wil_y * inv_si
    ) * (wol_y * inv_so)
    max_cos = jnp.where(
        (sin_i > 1e-4) & (sin_o > 1e-4), jnp.maximum(cos_d_phi, 0.0), 0.0
    )
    o_gt_i = cos_o > cos_i
    sin_alpha = jnp.where(o_gt_i, sin_i, sin_o)
    tan_beta = jnp.where(
        o_gt_i,
        sin_o / jnp.maximum(cos_o, 1e-6),
        sin_i / jnp.maximum(cos_i, 1e-6),
    )
    on = ic["p0"] + ic["p1"] * max_cos * sin_alpha * tan_beta
    same = wol_z * wil_z > 0.0
    scale = jnp.where(same, INV_PI * on * cos_i, 0.0)
    pdf = jnp.where(same, cos_i * INV_PI, 0.0)
    return ic["c0r"] * scale, ic["c0g"] * scale, ic["c0b"] * scale, pdf


def eval_mirror_metal(ic, wol, wil, metal):
    """Shared GGX reflection body: mirror (Schlick F0 = c0) and metal
    (conductor fresnel with per-channel n=c2/k=c3, tint c0)."""
    wol_x, wol_y, wol_z = wol
    wil_x, wil_y, wil_z = wil
    ax, ay = ic["ax"], ic["ay"]
    hx, hy, hz = _normalize3(wol_x + wil_x, wol_y + wil_y, wol_z + wil_z)
    same = wol_z * wil_z > 0.0
    cos_o = jnp.abs(wol_z)
    cos_i = jnp.abs(wil_z)
    d = ggx_d(hx, hy, hz, ax, ay)
    g = ggx_g(wol_x, wol_y, wol_z, wil_x, wil_y, wil_z, ax, ay)
    dot_ih = wil_x * hx + wil_y * hy + wil_z * hz
    scale = d * g / jnp.maximum(4.0 * cos_o, 1e-8)
    if metal:
        fr = fres_conductor_1(dot_ih, ic["c2r"], ic["c3r"])
        fg = fres_conductor_1(dot_ih, ic["c2g"], ic["c3g"])
        fb = fres_conductor_1(dot_ih, ic["c2b"], ic["c3b"])
    else:
        fr = fres_schlick_1(dot_ih, ic["c0r"])
        fg = fres_schlick_1(dot_ih, ic["c0g"])
        fb = fres_schlick_1(dot_ih, ic["c0b"])
    dot_oh = wol_x * hx + wol_y * hy + wol_z * hz
    pdf = ggx_pdf(wol_x, wol_y, wol_z, hx, hy, hz, ax, ay) / jnp.maximum(
        4.0 * jnp.abs(dot_oh), 1e-8
    )
    valid = same & (cos_o > 1e-6) & (cos_i > 1e-6)
    zed = jnp.where(valid, scale, 0.0)
    pdf = jnp.where(valid, pdf, 0.0)
    if metal:
        return ic["c0r"] * fr * zed, ic["c0g"] * fg * zed, ic["c0b"] * fb * zed, pdf
    return fr * zed, fg * zed, fb * zed, pdf


def _plastic_flip(wol, wil):
    """Plastic's implicit two-sidedness: flip local z when wo is below."""
    wol_x, wol_y, wol_z = wol
    wil_x, wil_y, wil_z = wil
    neg = wol_z < 0.0
    return (
        (wol_x, wol_y, jnp.where(neg, -wol_z, wol_z)),
        (wil_x, wil_y, jnp.where(neg, -wil_z, wil_z)),
    )


def plastic_substrate_weight(ic, f_o):
    w = ic["p1"] * (1.0 - f_o)  # p1 = kd luminance
    return jnp.where(w <= 0.0, 0.0, w / jnp.maximum(w + f_o, 1e-8))


def eval_plastic(ic, wol, wil):
    wol, wil = _plastic_flip(wol, wil)
    wol_x, wol_y, wol_z = wol
    wil_x, wil_y, wil_z = wil
    eta = ic["p0"]
    ax, ay = ic["ax"], ic["ay"]
    cos_o = jnp.abs(wol_z)
    cos_i = jnp.abs(wil_z)
    same = wol_z * wil_z > 0.0
    hx, hy, hz = _normalize3(wol_x + wil_x, wol_y + wil_y, wol_z + wil_z)
    d = ggx_d(hx, hy, hz, ax, ay)
    g = ggx_g(wol_x, wol_y, wol_z, wil_x, wil_y, wil_z, ax, ay)
    dot_ih = wil_x * hx + wil_y * hy + wil_z * hz
    f_h = fres_dielectric(dot_ih, eta)
    f_coat = f_h * d * g / jnp.maximum(4.0 * cos_o * cos_i, 1e-8)
    dot_oh = wol_x * hx + wol_y * hy + wol_z * hz
    pdf_coat = ggx_pdf(wol_x, wol_y, wol_z, hx, hy, hz, ax, ay) / jnp.maximum(
        4.0 * jnp.abs(dot_oh), 1e-8
    )
    f_i = fres_dielectric(cos_i, eta)
    f_o = fres_dielectric(cos_o, eta)
    a_exp = -(1.0 / jnp.maximum(cos_i, 1e-6) + 1.0 / jnp.maximum(cos_o, 1e-6))
    diff_base = (1.0 - f_i) * (1.0 - f_o) / jnp.maximum(eta * eta, 1e-8) * INV_PI
    fd_r = diff_base * jnp.exp(a_exp * ic["c1r"]) * ic["c0r"]
    fd_g = diff_base * jnp.exp(a_exp * ic["c1g"]) * ic["c0g"]
    fd_b = diff_base * jnp.exp(a_exp * ic["c1b"]) * ic["c0b"]
    pdf_diffuse = cos_i * INV_PI
    w = plastic_substrate_weight(ic, f_o)
    f_r = (f_coat + fd_r) * cos_i
    f_g = (f_coat + fd_g) * cos_i
    f_b = (f_coat + fd_b) * cos_i
    pdf = (1.0 - w) * pdf_coat + w * pdf_diffuse
    f_r = jnp.where(same, f_r, 0.0)
    f_g = jnp.where(same, f_g, 0.0)
    f_b = jnp.where(same, f_b, 0.0)
    pdf = jnp.where(same, pdf, 0.0)
    return f_r, f_g, f_b, pdf


def glass_refl_prob(ic, f_wo):
    r = ic["p1"] * f_wo  # p1 = kr luminance ratio
    t = (1.0 - ic["p1"]) * (1.0 - f_wo)
    return jnp.where(r <= 0.0, 0.0, r / jnp.maximum(r + t, 1e-8))


def eval_glass(ic, wol, wil):
    """surfaces/glass.py _eval_local: |cos_i| folded into f, pdf includes
    lobe-selection ratio."""
    wol_x, wol_y, wol_z = wol
    wil_x, wil_y, wil_z = wil
    eta_t = ic["p0"]
    ax, ay = ic["ax"], ic["ay"]
    cos_o = wol_z
    cos_i = wil_z
    same = cos_o * cos_i > 0.0
    f_wo = fres_dielectric(cos_o, eta_t)
    ratio = glass_refl_prob(ic, f_wo)

    # reflection lobe
    hx, hy, hz = _normalize3(wol_x + wil_x, wol_y + wil_y, wol_z + wil_z)
    neg = hz < 0.0
    hx = jnp.where(neg, -hx, hx)
    hy = jnp.where(neg, -hy, hy)
    hz = jnp.where(neg, -hz, hz)
    d_r = ggx_d(hx, hy, hz, ax, ay)
    g_r = ggx_g(wol_x, wol_y, wol_z, wil_x, wil_y, wil_z, ax, ay)
    dot_oh = wol_x * hx + wol_y * hy + wol_z * hz
    f_h = fres_dielectric(dot_oh, eta_t)
    refl_scale = f_h * d_r * g_r / jnp.maximum(4.0 * jnp.abs(cos_o), 1e-8)
    pdf_refl = ggx_pdf(wol_x, wol_y, wol_z, hx, hy, hz, ax, ay) / jnp.maximum(
        4.0 * jnp.abs(dot_oh), 1e-8
    ) * ratio

    # transmission lobe
    eta_rel = jnp.where(cos_o > 0.0, eta_t, 1.0 / eta_t)
    tx, ty, tz = _normalize3(
        wol_x + wil_x * eta_rel, wol_y + wil_y * eta_rel, wol_z + wil_z * eta_rel
    )
    negt = tz < 0.0
    tx = jnp.where(negt, -tx, tx)
    ty = jnp.where(negt, -ty, ty)
    tz = jnp.where(negt, -tz, tz)
    dot_o = wol_x * tx + wol_y * ty + wol_z * tz
    dot_i = wil_x * tx + wil_y * ty + wil_z * tz
    trans_ok = (~same) & (dot_o * dot_i < 0.0) & (
        jnp.abs(cos_o) > 1e-6
    ) & (jnp.abs(cos_i) > 1e-6)
    g_t = ggx_g(wol_x, wol_y, wol_z, wil_x, wil_y, wil_z, ax, ay)
    d_t = ggx_d(tx, ty, tz, ax, ay)
    f_ht = fres_dielectric(dot_o, eta_t)
    denom = dot_o + eta_rel * dot_i
    trans_scale = (
        (1.0 - f_ht)
        * d_t
        * g_t
        * jnp.abs(dot_i * dot_o)
        / jnp.maximum(jnp.abs(cos_i * cos_o) * denom * denom, 1e-10)
    )
    dwh_dwi = (eta_rel / jnp.maximum(jnp.abs(denom), 1e-8)) ** 2 * jnp.abs(dot_i)
    pdf_trans = ggx_pdf(wol_x, wol_y, wol_z, tx, ty, tz, ax, ay) * dwh_dwi * (
        1.0 - ratio
    )

    abs_ci = jnp.abs(cos_i)
    refl_f = refl_scale * abs_ci
    trans_f = trans_scale * abs_ci
    f_r = jnp.where(same, ic["c0r"] * refl_f,
                    jnp.where(trans_ok, ic["c1r"] * trans_f, 0.0))
    f_g = jnp.where(same, ic["c0g"] * refl_f,
                    jnp.where(trans_ok, ic["c1g"] * trans_f, 0.0))
    f_b = jnp.where(same, ic["c0b"] * refl_f,
                    jnp.where(trans_ok, ic["c1b"] * trans_f, 0.0))
    pdf = jnp.where(same, pdf_refl, jnp.where(trans_ok, pdf_trans, 0.0))
    return f_r, f_g, f_b, pdf


def refract_c(wix, wiy, wiz, nx, ny, nz, eta):
    """fr.refract on components: eta = eta_i/eta_t; returns (valid, wt)."""
    cos_i = nx * wix + ny * wiy + nz * wiz
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta * eta * sin2_i
    valid = sin2_t < 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    coef = eta * cos_i - cos_t
    return valid, (
        eta * -wix + coef * nx,
        eta * -wiy + coef * ny,
        eta * -wiz + coef * nz,
    )


# ---------------------------------------------------------------------------
# Disney principled BSDF (surfaces/disney.py, reflective lobe set).
# Fold restrictions (ops/fused_path.py): thin = 0, specular_trans = 0,
# diffuse_trans = 0 — the diffuse+retro+sheen / specular / clearcoat mixture.
# ic fields: c0 = color, c1 = sheen * csheen, c2 = cspec0, c3 = ctint_mix
# (= (1-spec_tint) + spec_tint*tint), p0 = eta, p1 = roughness, ax/ay,
# d0 = metallic, d1 = alpha_cc, d2 = clearcoat, d3/d4/d5 = normalized lobe
# weights w_diff / w_spec / w_cc (host-precomputed, disney.cpp:542-556).
# ---------------------------------------------------------------------------


def _schlick_w(cos_t):
    m = jnp.clip(1.0 - cos_t, 0.0, 1.0)
    return (m * m) * (m * m) * m


def gtr1(cos_h, alpha):
    a2 = alpha * alpha
    denom = _PI * jnp.log(jnp.maximum(a2, 1e-8)) * (
        1.0 + (a2 - 1.0) * cos_h * cos_h
    )
    return (a2 - 1.0) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)


def _smith_g_sep_z(wz, alpha):
    c2 = wz * wz
    t2 = jnp.maximum(1.0 - c2, 0.0) / jnp.maximum(c2, 1e-9)
    return 2.0 / (1.0 + jnp.sqrt(1.0 + alpha * alpha * t2))


def eval_disney(ic, wol, wil):
    wol_x, wol_y, wol_z = wol
    wil_x, wil_y, wil_z = wil
    ax, ay = ic["ax"], ic["ay"]
    met = ic["d0"]
    rough = ic["p1"]
    eta = ic["p0"]
    same = wol_z * wil_z > 0.0
    cos_o = jnp.abs(wol_z)
    cos_i = jnp.abs(wil_z)
    hx, hy, hz = _normalize3(wol_x + wil_x, wol_y + wil_y, wol_z + wil_z)
    neg_h = hz < 0.0
    hx = jnp.where(neg_h, -hx, hx)
    hy = jnp.where(neg_h, -hy, hy)
    hz = jnp.where(neg_h, -hz, hz)
    cos_d = wil_x * hx + wil_y * hy + wil_z * hz

    fo = _schlick_w(cos_o)
    fi = _schlick_w(cos_i)
    # diffuse + retro (disney.cpp:392-415)
    f_diffuse_s = (1.0 - 0.5 * fo) * (1.0 - 0.5 * fi)
    rr = 2.0 * rough * cos_d * cos_d
    f_retro_s = rr * (fo + fi + fo * fi * (rr - 1.0))
    dw = 1.0 - met  # diffuse_weight with spec_trans = 0
    diff_s = INV_PI * (f_diffuse_s + f_retro_s) * dw
    sheen_s = _schlick_w(jnp.abs(cos_d)) * dw

    # specular (GGX, disney fresnel mix)
    d = ggx_d(hx, hy, hz, ax, ay)
    g = ggx_g(wol_x, wol_y, wol_z, wil_x, wil_y, wil_z, ax, ay)
    f_diel = fres_dielectric(cos_d, eta)
    spec_s = d * g / jnp.maximum(4.0 * cos_o * cos_i, 1e-6)

    # clearcoat (GTR1, fixed .25 smith alpha)
    a_cc = ic["d1"]
    d_cc = gtr1(jnp.abs(hz), a_cc)
    f_cc_s = 0.04 + 0.96 * _schlick_w(cos_d)
    g_cc = _smith_g_sep_z(wol_z, 0.25) * _smith_g_sep_z(wil_z, 0.25)
    cc = ic["d2"] * 0.25 * d_cc * f_cc_s * g_cc / jnp.maximum(
        4.0 * cos_o * cos_i, 1e-6
    )

    valid_r = same & (cos_i > 1e-6) & (cos_o > 1e-6)

    def chan(color, sheen_c, cspec0, tint_mix):
        fres = (1.0 - met) * f_diel * tint_mix + met * fres_schlick_1(
            cos_d, cspec0
        )
        f = color * diff_s + sheen_c * sheen_s + fres * spec_s + cc
        return jnp.where(valid_r, f * cos_i, 0.0)

    f_r = chan(ic["c0r"], ic["c1r"], ic["c2r"], ic["c3r"])
    f_g = chan(ic["c0g"], ic["c1g"], ic["c2g"], ic["c3g"])
    f_b = chan(ic["c0b"], ic["c1b"], ic["c2b"], ic["c3b"])

    dot_oh = wol_x * hx + wol_y * hy + wol_z * hz
    pdf_diff = cos_i * INV_PI
    pdf_spec = ggx_pdf(wol_x, wol_y, wol_z, hx, hy, hz, ax, ay) / jnp.maximum(
        4.0 * jnp.abs(dot_oh), 1e-6
    )
    pdf_cc = d_cc * jnp.abs(hz) / jnp.maximum(4.0 * jnp.abs(dot_oh), 1e-6)
    pdf = ic["d3"] * pdf_diff + ic["d4"] * pdf_spec + ic["d5"] * pdf_cc
    pdf = jnp.where(same & (cos_o > 1e-6), pdf, 0.0)
    return f_r, f_g, f_b, pdf
