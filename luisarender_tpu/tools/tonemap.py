"""Tonemap an HDR image (EXR/PFM/HDR) to PNG or EXR.

Counterpart of the reference's tools/tonemap.py utility
(/root/reference/tools/tonemap.py): exposure scale + tone mapping operator
(none / uncharted2 / aces, the same set the display film offers) + sRGB
encode. Uses this package's own image IO — no external deps.

Usage:
    python -m luisarender_tpu.tools.tonemap in.exr out.png \
        [--tonemap aces] [--exposure 0.0] [--hdr]
"""

from __future__ import annotations

import argparse

import numpy as np


def tonemap_image(
    image: np.ndarray, operator: str = "aces", exposure: float = 0.0
) -> np.ndarray:
    """image: (H, W, 3) linear float. Returns tone-mapped LINEAR values."""
    import jax.numpy as jnp

    from ..core import colorspace

    if operator not in colorspace.TONEMAP_OPERATORS:
        raise ValueError(
            f"unknown tone mapping '{operator}'; "
            f"choose {sorted(colorspace.TONEMAP_OPERATORS)}"
        )
    scaled = jnp.asarray(image, jnp.float32) * (2.0 ** exposure)
    return np.asarray(colorspace.TONEMAP_OPERATORS[operator](scaled))


def load_any(path: str) -> np.ndarray:
    from ..utils import imageio

    lower = path.lower()
    if lower.endswith(".exr"):
        return imageio.load_exr(path)
    return imageio.load_image(path)


def main(argv=None):
    from ..core import colorspace
    from ..utils import imageio

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--tonemap", default="aces")
    ap.add_argument("--exposure", type=float, default=0.0)
    ap.add_argument(
        "--hdr", action="store_true",
        help="write linear EXR instead of sRGB-encoded PNG",
    )
    args = ap.parse_args(argv)

    img = np.asarray(load_any(args.input), np.float32)[..., :3]
    mapped = tonemap_image(img, args.tonemap, args.exposure)
    if args.hdr or args.output.lower().endswith(".exr"):
        imageio.save_exr(args.output, mapped)
    else:
        import jax.numpy as jnp

        imageio.save_png(
            args.output,
            np.asarray(colorspace.srgb_encode(jnp.asarray(mapped))),
        )
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
