"""Color space conversions and tone mapping operators.

TPU-native equivalent of /root/reference/src/util/colorspace.h (CIE XYZ <->
linear sRGB) and films/display.cpp:16-95 (tonemap operators none/uncharted2/
aces). Batched over leading dims; color vectors are (..., 3).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Column-major in math terms: out = M @ rgb. Standard Rec.709/sRGB primaries, D65.
XYZ_FROM_SRGB = np.array(
    [
        [0.4123908, 0.35758434, 0.18048079],
        [0.21263901, 0.71516868, 0.07219232],
        [0.01933082, 0.11919478, 0.95053215],
    ],
    dtype=np.float32,
)
SRGB_FROM_XYZ = np.linalg.inv(XYZ_FROM_SRGB.astype(np.float64)).astype(np.float32)


def _apply_mat3(m, v):
    """Unrolled 3x3 transform. NEVER use einsum/dot for 3-wide vectors on
    TPU: tiny matmuls waste the MXU and default-precision matmuls run in
    bfloat16 passes, wrecking color accuracy. Elementwise FMAs are exact
    f32 on the VPU and fuse with neighbors."""
    m = np.asarray(m)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [
            m[0, 0] * x + m[0, 1] * y + m[0, 2] * z,
            m[1, 0] * x + m[1, 1] * y + m[1, 2] * z,
            m[2, 0] * x + m[2, 1] * y + m[2, 2] * z,
        ],
        axis=-1,
    )


def cie_xyz_to_linear_srgb(xyz):
    return _apply_mat3(SRGB_FROM_XYZ, xyz)


def linear_srgb_to_cie_xyz(rgb):
    return _apply_mat3(XYZ_FROM_SRGB, rgb)


def cie_y_of_srgb(rgb):
    """Luminance of a linear-sRGB triple."""
    w = jnp.asarray(XYZ_FROM_SRGB[1])
    return jnp.sum(rgb * w, axis=-1)


def srgb_encode(linear):
    """Linear -> sRGB gamma (EOTF^-1)."""
    linear = jnp.maximum(linear, 0.0)
    return jnp.where(
        linear <= 0.0031308,
        12.92 * linear,
        1.055 * jnp.power(jnp.maximum(linear, 1e-10), 1.0 / 2.4) - 0.055,
    )


def srgb_decode(encoded):
    """sRGB gamma -> linear (EOTF)."""
    encoded = jnp.maximum(encoded, 0.0)
    return jnp.where(
        encoded <= 0.04045,
        encoded / 12.92,
        jnp.power((encoded + 0.055) / 1.055, 2.4),
    )


# --- tone mapping (films/display.cpp:121-156) ---


def tonemap_none(x):
    return x


def tonemap_uncharted2(x):
    a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    white = 11.2

    def _curve(v):
        return ((v * (a * v + c * b) + d * e) / (v * (a * v + b) + d * f)) - e / f

    exposure_bias = 2.0
    return _curve(x * exposure_bias) / _curve(jnp.float32(white))


def tonemap_aces(x):
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


TONEMAP_OPERATORS = {
    "none": tonemap_none,
    "uncharted2": tonemap_uncharted2,
    "aces": tonemap_aces,
}
