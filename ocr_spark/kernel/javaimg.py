"""Bit-exact NumPy model of the Java2D raster ops the reference relies on.

The reference normalizes each glyph crop with ImageTools.resize
(/root/reference/src/org/terifan/ocr/ImageTools.java:11-68): repeated
half-scaling down to the target then a single bilinear upscale, each step a
Java2D ``drawImage``. Calibrated against the compiled reference
(tests/goldens/resize_probes.json, gray_getrgb_lut.json), OpenJDK's software
bilinear transform behaves exactly as:

  pos(k)  = trunc(k * sx * 65536) + (trunc(sx * 65536) >> 1) - 32768
  i0      = pos >> 16            (sample index, edge-clamped with i0+1)
  w8      = (pos >> 8) & 0xFF    (8-bit interpolation weight)
  out     = (a*(256-wx)*(256-wy) + b*wx*(256-wy)
             + c*(256-wx)*wy + d*wx*wy + 32768) >> 16

One quirk: when the crop is already exactly matrix-sized, ImageTools.resize
is a no-op and the caller's ``getRGB`` on the TYPE_BYTE_GRAY image applies
the linear-gray -> sRGB curve (CurvatureClassifier.java:100-110); otherwise
values pass through identity. ``java_resize`` reproduces both paths.
"""

from __future__ import annotations

import numpy as np


def _srgb_lut() -> np.ndarray:
    """linear gray -> sRGB, as BufferedImage.getRGB on TYPE_BYTE_GRAY."""
    x = np.arange(256) / 255.0
    y = np.where(x <= 0.0031308, 12.92 * x, 1.055 * x ** (1 / 2.4) - 0.055)
    # Java rounds half away from zero here; values are positive so +0.5/floor.
    return np.floor(y * 255.0 + 0.5).astype(np.int64)


SRGB_LUT = _srgb_lut()


import functools


@functools.lru_cache(maxsize=4096)
def _axis(d: int, s: int):
    sx = s / d
    k = np.arange(d, dtype=np.float64)
    incr = np.int64(int(sx * 65536.0))
    pos = np.trunc(k * sx * 65536.0).astype(np.int64) + (incr >> 1) - 32768
    return pos >> 16, (pos >> 8) & 0xFF


def java_bilinear(src: np.ndarray, dw: int, dh: int) -> np.ndarray:
    """One Java2D bilinear drawImage scale step on a single-channel raster."""
    sh, sw = src.shape
    src = src.astype(np.int64, copy=False)

    xi, wx = _axis(dw, sw)
    yi, wy = _axis(dh, sh)
    x0 = np.clip(xi, 0, sw - 1)
    x1 = np.clip(xi + 1, 0, sw - 1)
    y0 = np.clip(yi, 0, sh - 1)
    y1 = np.clip(yi + 1, 0, sh - 1)
    a = src[np.ix_(y0, x0)]
    b = src[np.ix_(y0, x1)]
    c = src[np.ix_(y1, x0)]
    d = src[np.ix_(y1, x1)]
    wx = wx[None, :]
    wy = wy[:, None]
    acc = (
        a * (256 - wx) * (256 - wy)
        + b * wx * (256 - wy)
        + c * (256 - wx) * wy
        + d * wx * wy
    )
    return (acc + 32768) >> 16


def java_resize(src: np.ndarray, tw: int, th: int) -> np.ndarray:
    """ImageTools.resize parity: mip-chain halving then bilinear upscale.

    Returns the post-``getRGB`` gray values (identity for scaled output,
    sRGB curve when the input passes through untouched).
    """
    h, w = src.shape
    img = src.astype(np.int64, copy=False)
    scaled = False
    if tw < w or th < h:
        t2w, t2h = min(tw, w), min(th, h)
        while True:
            nw, nh = w, h
            if nw > t2w:
                nw = max(nw // 2, t2w)
            if nh > t2h:
                nh = max(nh // 2, t2h)
            img = java_bilinear(img, nw, nh)
            scaled = True
            w, h = nw, nh
            if w == t2w and h == t2h:
                break
    if tw > img.shape[1] or th > img.shape[0]:
        img = java_bilinear(img, tw, th)
        scaled = True
    if not scaled:
        img = SRGB_LUT[img]
    return img
