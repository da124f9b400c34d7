"""L4 image handling: colour→packed-pixel quantization and PPM I/O.

Pixel packing follows futhark/ray.fut:156-162: each channel is
``int(255.99 * c)`` (truncation, NO clamp — colours in this renderer are
always in [0,1]) packed as ``(r<<16)|(g<<8)|b`` in one int32.

The PPM writer produces the plain-text "P3" format of the reference driver
(futhark/main.c:10-24): header ``P3\n<w> <h>\n255\n`` then one ``r g b`` line
per pixel in row-major order.  A fast native (C) writer is used when the
bundled extension is available; the pure-Python fallback is identical.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def colour_to_pixel(c):
    """(..., 3) float colour -> (...) int32 packed 0x00RRGGBB."""
    q = (255.99 * c).astype(jnp.int32)
    return (q[..., 0] << 16) | (q[..., 1] << 8) | q[..., 2]


def pixel_to_rgb(p):
    """(...) int32 packed -> (..., 3) uint8."""
    p = np.asarray(p)
    return np.stack([(p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF],
                    axis=-1).astype(np.uint8)


def image_to_ppm_bytes(img) -> bytes:
    """Packed int32 (h, w) image -> P3 PPM file contents."""
    img = np.asarray(img)
    h, w = img.shape
    rgb = pixel_to_rgb(img.reshape(-1))
    try:
        from . import native
        return native.ppm_bytes(rgb, h, w)
    except Exception:
        pass
    header = f"P3\n{w} {h}\n255\n"
    body = "\n".join(f"{r} {g} {b}" for r, g, b in rgb) + "\n"
    return (header + body).encode()


def write_ppm(path: str, img) -> None:
    with open(path, "wb") as f:
        f.write(image_to_ppm_bytes(img))


def write_png(path: str, img) -> None:
    """PNG output (the reference's Haskell variant writes PNG,
    haskell/ray.hs:25); requires PIL."""
    from PIL import Image
    Image.fromarray(pixel_to_rgb(np.asarray(img))).save(path)


def write_image(path: str, img) -> None:
    """Write PPM or PNG based on the file extension."""
    if path.lower().endswith(".png"):
        write_png(path, img)
    else:
        write_ppm(path, img)


def read_ppm(path: str) -> np.ndarray:
    """Read a P3 PPM into an (h, w) packed-int32 image (for golden tests)."""
    with open(path, "rb") as f:
        tokens = f.read().split()
    assert tokens[0] == b"P3", "only plain P3 PPM supported"
    w, h, maxv = int(tokens[1]), int(tokens[2]), int(tokens[3])
    assert maxv == 255
    vals = np.array(tokens[4:4 + 3 * w * h], dtype=np.int64).astype(np.int32)
    rgb = vals.reshape(h, w, 3)
    return (rgb[..., 0] << 16) | (rgb[..., 1] << 8) | rgb[..., 2]
