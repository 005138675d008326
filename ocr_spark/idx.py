"""idx1/idx3 (MNIST-style) tensor file codec — pure NumPy, no Spark.

Covers S5 of the operator inventory (SURVEY.md §2.1): the reference's
commented-out idx reader (`/root/reference/src/org/terifan/ocr2/
ConvolutionalClassifier.java:123-158`) parses the same public format —
big-endian int32 header (magic encoding dtype+ndim, then one int32 per
dimension) followed by the raw ubyte tensor. The reference's bundled data
files are stripped from its repo, so fixtures here are synthesized
deterministically (`build_idx` is the writer twin, same pattern as
ocr_spark.pdf.build_pdf).

Only the ubyte dtype (0x08) is implemented — the one both MNIST and the
reference use; other dtype codes raise.
"""

from __future__ import annotations

import struct

import numpy as np

_DTYPE_UBYTE = 0x08


def parse_idx(data: bytes) -> np.ndarray:
    """Parse an idx byte string into an ndarray (ubyte dtype only).

    Header: two zero bytes, dtype code, ndim; then ndim big-endian int32
    dimension sizes; then the row-major tensor data.
    """
    if len(data) < 4:
        raise ValueError("idx: truncated header")
    zero0, zero1, dtype, ndim = data[0], data[1], data[2], data[3]
    if zero0 != 0 or zero1 != 0:
        raise ValueError("idx: bad magic (first two bytes must be zero)")
    if dtype != _DTYPE_UBYTE:
        raise ValueError(f"idx: unsupported dtype code 0x{dtype:02x} (only ubyte)")
    if len(data) < 4 + 4 * ndim:
        raise ValueError("idx: truncated dimension header")
    dims = struct.unpack(f">{ndim}i", data[4 : 4 + 4 * ndim])
    if any(d < 0 for d in dims):
        raise ValueError("idx: negative dimension")
    n = int(np.prod(dims)) if dims else 1
    body = data[4 + 4 * ndim :]
    if len(body) < n:
        raise ValueError(f"idx: body holds {len(body)} bytes, header promises {n}")
    return np.frombuffer(body[:n], dtype=np.uint8).reshape(dims)


def build_idx(arr: np.ndarray) -> bytes:
    """Serialize a uint8 ndarray to idx bytes (writer twin of parse_idx).

    np.asarray, NOT np.ascontiguousarray: the latter promotes a 0-d array
    to 1-d (it guarantees ndim>=1), which would silently mislabel a scalar
    tensor's header (found by tests/test_parser_fuzz.py). tobytes() already
    emits C-order bytes for any input layout."""
    a = np.asarray(arr, dtype=np.uint8)
    header = struct.pack(">BBBB", 0, 0, _DTYPE_UBYTE, a.ndim)
    header += struct.pack(f">{a.ndim}i", *a.shape)
    return header + a.tobytes()
