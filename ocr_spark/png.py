"""Minimal 8-bit grayscale PNG codec (NumPy + stdlib zlib).

The container ships no imaging library, so media blobs are encoded/decoded
here. Only what the pipeline needs: 8-bit grayscale (color type 0), all five
scanline filters on read, filter 0 on write. Color inputs are out of scope —
reference assets are pre-converted to gray by the Java oracle
(tools/java_oracle/GoldenDump.java, mode "gray") and committed under
tests/goldens/, so both sides consume identical rasters.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def decode_gray(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale PNG to a (h, w) uint8 array."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    idat = b""
    w = h = bit_depth = color_type = None
    while pos < len(data):
        (length, ctype) = struct.unpack(">I4s", data[pos : pos + 8])
        pos += 8
        chunk = data[pos : pos + length]
        pos += length + 4  # skip CRC
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if color_type != 0 or bit_depth != 8:
        raise ValueError(f"only 8-bit grayscale supported, got ct={color_type} bd={bit_depth}")
    raw = zlib.decompress(idat)
    img = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int32)
    pos = 0
    for y in range(h):
        f = raw[pos]
        pos += 1
        row = np.frombuffer(raw[pos : pos + w], dtype=np.uint8).astype(np.int32)
        pos += w
        if f == 0:
            pass
        elif f == 2:  # up
            row = (row + prev) & 0xFF
        elif f == 1:  # sub
            row = row.copy()
            for x in range(1, w):
                row[x] = (row[x] + row[x - 1]) & 0xFF
        elif f == 3:  # average
            row = row.copy()
            left = 0
            for x in range(w):
                row[x] = (row[x] + ((left + int(prev[x])) >> 1)) & 0xFF
                left = row[x]
        elif f == 4:  # paeth
            row = row.copy()
            left = 0
            ul = 0
            for x in range(w):
                a, b, c = left, int(prev[x]), ul
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pr) & 0xFF
                ul = int(prev[x])
                left = row[x]
        else:
            raise ValueError(f"bad filter {f}")
        img[y] = row
        prev = row.astype(np.int32)
    return img


def encode_gray(img: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode a (h, w) uint8 array as an 8-bit grayscale PNG (filter 0)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, compress_level))
        + chunk(b"IEND", b"")
    )
