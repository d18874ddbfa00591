"""Microfacet distributions and Fresnel terms (the shared BxDF math library).

TPU-native equivalent of /root/reference/src/util/scattering.h/.cpp:
anisotropic Trowbridge-Reitz (GGX) with Smith masking and visible-normal
sampling (Heitz, JCGT 2018), dielectric/conductor Fresnel, and the reference's
roughness remap alpha = roughness^2 clamped at 1e-4 (scattering.cpp:129-131 —
note: the clamp means even "smooth" lobes stay finite, so no delta-lobe
special cases are needed anywhere). All functions batched, local shading
space (z-up), wh = half vector.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import frame as fr

PI = float(np.pi)


def roughness_to_alpha(roughness):
    return jnp.maximum(roughness * roughness, 1e-4)


def alpha_to_roughness(alpha):
    return jnp.sqrt(jnp.maximum(alpha, 1e-4))


# ---------------------------------------------------------------------------
# Trowbridge-Reitz (GGX), anisotropic. alpha: (..., 2)
# ---------------------------------------------------------------------------


def ggx_d(wh, alpha):
    """Normal distribution function D(wh)."""
    ax, ay = alpha[..., 0], alpha[..., 1]
    cos2 = fr.cos2_theta(wh)
    cos4 = cos2 * cos2
    tan2 = fr.sin2_theta(wh) / jnp.maximum(cos2, 1e-12)
    e = tan2 * (
        (fr.cos_phi(wh) / ax) ** 2 + (fr.sin_phi(wh) / ay) ** 2
    )
    d = 1.0 / (PI * ax * ay * jnp.maximum(cos4, 1e-12) * (1.0 + e) ** 2)
    return jnp.where(cos2 > 1e-12, d, 0.0)


def ggx_lambda(w, alpha):
    ax, ay = alpha[..., 0], alpha[..., 1]
    cos2 = fr.cos2_theta(w)
    tan2 = fr.sin2_theta(w) / jnp.maximum(cos2, 1e-12)
    a2 = fr.cos_phi(w) ** 2 * ax * ax + fr.sin_phi(w) ** 2 * ay * ay
    lam = 0.5 * (-1.0 + jnp.sqrt(1.0 + a2 * tan2))
    return jnp.where(cos2 > 1e-12, lam, 0.0)


def ggx_g1(w, alpha):
    return 1.0 / (1.0 + ggx_lambda(w, alpha))


def ggx_g(wo, wi, alpha):
    return 1.0 / (1.0 + ggx_lambda(wo, alpha) + ggx_lambda(wi, alpha))


def ggx_sample_wh(wo, u, alpha):
    """Sample a visible normal (Heitz 2018 sphere-cap method). wo may be in
    either hemisphere; wh is returned in the upper hemisphere."""
    flip = wo[..., 2] < 0.0
    wo_u = jnp.where(flip[..., None], -wo, wo)
    ax, ay = alpha[..., 0], alpha[..., 1]
    vh = fr.normalize(
        jnp.stack([ax * wo_u[..., 0], ay * wo_u[..., 1], wo_u[..., 2]], axis=-1)
    )
    # orthonormal basis around vh
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    t1 = jnp.where(
        (lensq > 1e-12)[..., None],
        jnp.stack([-vh[..., 1], vh[..., 0], jnp.zeros_like(lensq)], axis=-1)
        / jnp.sqrt(jnp.maximum(lensq, 1e-12))[..., None],
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), vh.shape),
    )
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(jnp.maximum(u[..., 0], 0.0))
    phi = 2.0 * PI * u[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    nh = (
        p1[..., None] * t1
        + p2[..., None] * t2
        + jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))[..., None] * vh
    )
    wh = fr.normalize(
        jnp.stack(
            [
                ax * nh[..., 0],
                ay * nh[..., 1],
                jnp.maximum(nh[..., 2], 1e-6),
            ],
            axis=-1,
        )
    )
    return wh


def ggx_pdf(wo, wh, alpha):
    """pdf of sample_wh (visible-normal measure, over wh solid angle)."""
    wo_u = jnp.where((wo[..., 2] < 0.0)[..., None], -wo, wo)
    return (
        ggx_d(wh, alpha)
        * ggx_g1(wo_u, alpha)
        * jnp.maximum(fr.dot(wo_u, wh), 0.0)
        / jnp.maximum(fr.abs_cos_theta(wo_u), 1e-8)
    )


# ---------------------------------------------------------------------------
# Fresnel
# ---------------------------------------------------------------------------


def fresnel_dielectric(cos_i, eta_i, eta_t):
    """Unpolarized dielectric Fresnel (scattering.cpp:30-55). cos_i signed;
    indices swap for back-side incidence."""
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    entering = cos_i > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    ci = jnp.abs(cos_i)
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - ci * ci))
    sin_t = ei / et * sin_i
    tir = sin_t >= 1.0
    ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))
    r_par = (et * ci - ei * ct) / jnp.maximum(et * ci + ei * ct, 1e-8)
    r_perp = (ei * ci - et * ct) / jnp.maximum(ei * ci + et * ct, 1e-8)
    f = 0.5 * (r_par * r_par + r_perp * r_perp)
    return jnp.where(tir, 1.0, f)


def fresnel_conductor(cos_i, eta, k):
    """Conductor Fresnel; eta/k may be spectral (..., C), cos_i (...,)."""
    ci = jnp.clip(jnp.abs(cos_i), 0.0, 1.0)[..., None]
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


def fresnel_schlick(cos_i, f0):
    """Schlick approximation; f0 may be spectral (..., C)."""
    m = jnp.clip(1.0 - jnp.abs(cos_i), 0.0, 1.0)
    w = (m * m) * (m * m) * m
    return f0 + (1.0 - f0) * w[..., None]


def fresnel_dielectric_integral(eta):
    """Approximate hemispherical integral of Fr(cos) * 2cos d(cos) — the
    diffuse Fresnel reflectance used by plastic-style coats. Rational fits
    from Egan & Hilgeman / d'Eon (the same quantity the reference
    approximates, scattering.h:61-67)."""
    eta = jnp.asarray(eta)
    inv = 1.0 / eta
    f_lt1 = (
        -0.4399
        + 0.7099 * inv
        - 0.3319 * inv * inv
        + 0.0636 * inv * inv * inv
    )
    e2 = eta * eta
    e3 = e2 * eta
    f_ge1 = (
        -1.4399 / e2 + 0.7099 / eta + 0.6681 + 0.0636 * eta
    )
    return jnp.where(eta < 1.0, f_lt1, f_ge1)
