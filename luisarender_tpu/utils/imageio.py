"""Image IO: OpenEXR (scanline, uncompressed) write/read, PNG write, PFM/NPY.

TPU-native equivalent of /root/reference/src/util/imageio.h/.cpp (tinyexr/stb
backed there). Self-contained: the EXR writer emits minimal spec-compliant
uncompressed scanline files (FLOAT or HALF); PNG uses zlib from the stdlib.
PNG/JPG *reading* for textures uses Pillow if present (it is a transitive
dependency of the baked-in stack) with a pure-numpy PNG fallback.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np


# ---------------------------------------------------------------------------
# EXR
# ---------------------------------------------------------------------------

_EXR_MAGIC = 20000630
_PIXEL_HALF = 1
_PIXEL_FLOAT = 2


def _exr_attr(name: str, type_name: str, data: bytes) -> bytes:
    return (
        name.encode() + b"\x00" + type_name.encode() + b"\x00"
        + struct.pack("<i", len(data)) + data
    )


def save_exr(path, image: np.ndarray, half: bool = False):
    """Write an RGB(A) float image as uncompressed scanline EXR."""
    image = np.asarray(image, dtype=np.float32)
    if image.ndim == 2:
        image = image[..., None]
    h, w, c = image.shape
    names = ["R", "G", "B", "A"][:c] if c <= 4 else [f"C{i}" for i in range(c)]
    # channels are stored alphabetically in EXR
    chan_order = sorted(range(c), key=lambda i: names[i])
    pix_type = _PIXEL_HALF if half else _PIXEL_FLOAT
    dtype = np.float16 if half else np.float32

    chlist = b""
    for i in chan_order:
        chlist += (
            names[i].encode() + b"\x00"
            + struct.pack("<i", pix_type)
            + struct.pack("<i", 0)  # pLinear + reserved
            + struct.pack("<ii", 1, 1)  # x/y sampling
        )
    chlist += b"\x00"

    header = b""
    header += _exr_attr("channels", "chlist", chlist)
    header += _exr_attr("compression", "compression", b"\x00")  # none
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header += _exr_attr("dataWindow", "box2i", box)
    header += _exr_attr("displayWindow", "box2i", box)
    header += _exr_attr("lineOrder", "lineOrder", b"\x00")
    header += _exr_attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _exr_attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    header += _exr_attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"

    bytes_per_px = 2 if half else 4
    line_size = w * c * bytes_per_px
    offset_table_size = 8 * h
    data_start = 8 + len(header) + offset_table_size

    with open(path, "wb") as f:
        f.write(struct.pack("<I", _EXR_MAGIC))
        f.write(struct.pack("<I", 2))  # version 2, scanline
        f.write(header)
        line_bytes = 8 + line_size  # y + pixel data per scanline chunk
        for y in range(h):
            f.write(struct.pack("<Q", data_start + y * line_bytes))
        for y in range(h):
            f.write(struct.pack("<ii", y, line_size))
            row = image[y]
            for i in chan_order:
                f.write(row[:, i].astype(dtype).tobytes())


def load_exr(path):
    """Minimal reader for the files save_exr writes (uncompressed scanline)."""
    with open(path, "rb") as f:
        data = f.read()
    magic, version = struct.unpack_from("<II", data, 0)
    if magic != _EXR_MAGIC:
        raise ValueError("not an EXR file")
    pos = 8
    channels = []
    data_window = None
    compression = 0
    while True:
        if data[pos] == 0:
            pos += 1
            break
        end = data.index(b"\x00", pos)
        name = data[pos:end].decode()
        pos = end + 1
        end = data.index(b"\x00", pos)
        type_name = data[pos:end].decode()
        pos = end + 1
        (size,) = struct.unpack_from("<i", data, pos)
        pos += 4
        payload = data[pos : pos + size]
        pos += size
        if name == "channels":
            cp = 0
            while payload[cp] != 0:
                ce = payload.index(b"\x00", cp)
                cname = payload[cp:ce].decode()
                cp = ce + 1
                (ptype,) = struct.unpack_from("<i", payload, cp)
                cp += 16
                channels.append((cname, ptype))
        elif name == "dataWindow":
            data_window = struct.unpack("<iiii", payload)
        elif name == "compression":
            compression = payload[0]
    if compression != 0:
        raise ValueError("load_exr supports only uncompressed files")
    x0, y0, x1, y1 = data_window
    w, h = x1 - x0 + 1, y1 - y0 + 1
    c = len(channels)
    pos += 8 * h  # offset table
    out = np.zeros((h, w, c), np.float32)
    for y in range(h):
        _, line_size = struct.unpack_from("<ii", data, pos)
        pos += 8
        off = 0
        for i, (cname, ptype) in enumerate(channels):
            dt = np.float16 if ptype == _PIXEL_HALF else np.float32
            n = w * np.dtype(dt).itemsize
            out[y, :, i] = np.frombuffer(data[pos + off : pos + off + n], dt)
            off += n
        pos += line_size
    # reorder alphabetical channel order back to RGBA when applicable
    names = [cn for cn, _ in channels]
    want = [n for n in ["R", "G", "B", "A"] if n in names]
    if len(want) == c:
        out = out[..., [names.index(n) for n in want]]
    return out


# ---------------------------------------------------------------------------
# PNG (write; 8-bit sRGB)
# ---------------------------------------------------------------------------


def png_bytes(image: np.ndarray) -> bytes:
    """Encode (H, W, 1|3|4) [0,1] to an in-memory 8-bit PNG (own writer —
    also feeds the display film's HTTP live viewer, films/live_server.py)."""
    img = np.clip(np.asarray(image), 0.0, 1.0)
    img8 = (img * 255.0 + 0.5).astype(np.uint8)
    h, w, c = img8.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + img8[y].tobytes() for y in range(h))

    def chunk(tag, payload):
        body = tag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def save_png(path, image: np.ndarray):
    """image: (H, W, 3|4) in [0, 1] linear-encoded already (caller applies
    tonemap/sRGB encode); writes 8-bit PNG."""
    with open(path, "wb") as f:
        f.write(png_bytes(image))


# ---------------------------------------------------------------------------
# Generic entry points
# ---------------------------------------------------------------------------


def save_image(path, image: np.ndarray):
    """Dispatch on extension; linear images for EXR/PFM/NPY, sRGB-encoded PNG."""
    from ..core import colorspace
    import jax.numpy as jnp

    path = Path(path)
    image = np.asarray(image)
    suffix = path.suffix.lower()
    if suffix == ".exr":
        save_exr(path, image)
    elif suffix == ".png":
        encoded = np.asarray(colorspace.srgb_encode(jnp.asarray(image)))
        save_png(path, encoded)
    elif suffix == ".npy":
        np.save(path, image)
    elif suffix == ".pfm":
        save_pfm(path, image)
    else:
        raise ValueError(f"unsupported image format: {suffix}")


def save_pfm(path, image: np.ndarray):
    image = np.asarray(image, np.float32)
    h, w = image.shape[:2]
    with open(path, "wb") as f:
        f.write(b"PF\n" if image.ndim == 3 else b"Pf\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")  # little endian
        f.write(np.flipud(image).tobytes())


def load_image(path):
    """Load an image as float32 (H, W, C); LDR formats are sRGB-decoded to
    linear (textures/image.cpp:49-108 encoding semantics)."""
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".exr":
        return load_exr(path)
    if suffix == ".npy":
        return np.load(path).astype(np.float32)
    if suffix == ".pfm":
        return load_pfm(path)
    if suffix == ".hdr":
        return load_hdr(path)
    try:
        from PIL import Image  # type: ignore

        img = np.asarray(Image.open(path).convert("RGBA"), np.float32) / 255.0
    except ImportError as e:
        raise RuntimeError(f"cannot load {suffix} without Pillow") from e
    rgb = img[..., :3]
    # sRGB EOTF decode to linear
    lin = np.where(rgb <= 0.04045, rgb / 12.92, ((rgb + 0.055) / 1.055) ** 2.4)
    return np.concatenate([lin, img[..., 3:4]], axis=-1).astype(np.float32)


def load_pfm(path):
    with open(path, "rb") as f:
        header = f.readline().strip()
        ch = 3 if header == b"PF" else 1
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(
            f.read(), "<f4" if scale < 0 else ">f4"
        ).reshape(h, w, ch)
        return np.flipud(data).astype(np.float32)


def load_hdr(path):
    """Radiance RGBE (.hdr) reader (both RLE and flat scanlines)."""
    with open(path, "rb") as f:
        if not f.readline().startswith(b"#?"):
            raise ValueError("not a Radiance HDR file")
        while True:
            line = f.readline().strip()
            if not line:
                break
        dims = f.readline().split()
        h, w = int(dims[1]), int(dims[3])
        data = f.read()
    rgbe = np.zeros((h, w, 4), np.uint8)
    pos = 0
    for y in range(h):
        if (
            pos + 4 <= len(data)
            and data[pos] == 2
            and data[pos + 1] == 2
            and (data[pos + 2] << 8 | data[pos + 3]) == w
        ):
            pos += 4
            for c in range(4):
                x = 0
                while x < w:
                    count = data[pos]
                    pos += 1
                    if count > 128:
                        rgbe[y, x : x + count - 128, c] = data[pos]
                        pos += 1
                        x += count - 128
                    else:
                        rgbe[y, x : x + count, c] = np.frombuffer(
                            data[pos : pos + count], np.uint8
                        )
                        pos += count
                        x += count
        else:
            row = np.frombuffer(data[pos : pos + 4 * w], np.uint8).reshape(w, 4)
            rgbe[y] = row
            pos += 4 * w
    exp = rgbe[..., 3].astype(np.int32) - 136
    scale = np.ldexp(1.0, exp).astype(np.float32)
    rgb = rgbe[..., :3].astype(np.float32) * scale[..., None]
    rgb[rgbe[..., 3] == 0] = 0.0
    return rgb
