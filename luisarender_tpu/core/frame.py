"""Orthonormal shading frames and local trigonometry.

TPU-native equivalent of /root/reference/src/util/frame.h:17-60 (Frame) and the
cos/tan helper family used by the BxDF library. All functions are batched:
vectors are (..., 3) float32 arrays, frames are dicts of three such arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def length(v):
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v, eps=1e-20):
    return v / jnp.maximum(length(v), eps)[..., None]


def cross(a, b):
    return jnp.cross(a, b)


def face_forward(v, ref):
    """Flip v so it lies in the hemisphere of ref (sign of dot)."""
    return jnp.where(dot(v, ref)[..., None] < 0.0, -v, v)


def reflect(wo, n):
    return -wo + 2.0 * dot(wo, n)[..., None] * n


def refract(wi, n, eta):
    """Refract wi about n with relative IOR eta; returns (valid, wt).

    Follows PBRT convention used by util/scattering.cpp: eta = eta_i/eta_t.
    """
    cos_i = dot(n, wi)
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta * eta * sin2_i
    valid = sin2_t < 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wt = eta[..., None] * -wi + (eta * cos_i - cos_t)[..., None] * n
    return valid, wt


def make_frame(n):
    """Build an orthonormal frame around unit normal n (Duff et al. 2017 /
    frame.h:27-34 branchless construction)."""
    nz = n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = n[..., 0] * n[..., 1] * a
    s = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]], axis=-1
    )
    t = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return {"s": s, "t": t, "n": n}


def frame_from_z_and_hint(n, tangent_hint):
    """Frame with s aligned (Gram-Schmidt) to a dpdu tangent hint."""
    s = tangent_hint - dot(tangent_hint, n)[..., None] * n
    s_len = length(s)
    fallback = make_frame(n)
    ok = (s_len > 1e-8)[..., None]
    s = jnp.where(ok, s / jnp.maximum(s_len, 1e-20)[..., None], fallback["s"])
    t = jnp.where(ok, cross(n, s), fallback["t"])
    return {"s": s, "t": t, "n": n}


def to_local(frame, v):
    return jnp.stack(
        [dot(v, frame["s"]), dot(v, frame["t"]), dot(v, frame["n"])], axis=-1
    )


def to_world(frame, v):
    return (
        v[..., 0:1] * frame["s"] + v[..., 1:2] * frame["t"] + v[..., 2:3] * frame["n"]
    )


def flip_frame(frame):
    return {"s": -frame["s"], "t": frame["t"], "n": -frame["n"]}


# --- local-space trig (z-up shading space), mirrors util/scattering.h helpers ---


def cos_theta(w):
    return w[..., 2]


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def cos2_theta(w):
    return w[..., 2] * w[..., 2]


def sin2_theta(w):
    return jnp.maximum(0.0, 1.0 - cos2_theta(w))


def sin_theta(w):
    return jnp.sqrt(sin2_theta(w))


def tan_theta(w):
    return sin_theta(w) / w[..., 2]


def tan2_theta(w):
    return sin2_theta(w) / cos2_theta(w)


def cos_phi(w):
    s = sin_theta(w)
    return jnp.where(s == 0.0, 1.0, jnp.clip(w[..., 0] / jnp.maximum(s, 1e-20), -1.0, 1.0))


def sin_phi(w):
    s = sin_theta(w)
    return jnp.where(s == 0.0, 0.0, jnp.clip(w[..., 1] / jnp.maximum(s, 1e-20), -1.0, 1.0))


def same_hemisphere(a, b):
    return a[..., 2] * b[..., 2] > 0.0


def spherical_direction(sin_t, cos_t, phi):
    return jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1
    )
