"""F8 debug curvature render parity vs the Java reference.

Goldens: tests/goldens/debugbmp/[{font}_]debugbmp_{si}_{x}_{y}.png are the
reference's own per-symbol debug sheets, dumped by `GoldenDump debugbmp` from
CurvatureClassifier.learn() (12 structurally diverse arial glyphs + 2
courier + 2 arial at matrix size 16, prefix ms16 — the full 73-glyph
arial sheets at BOTH sizes and the 66-glyph courier sheet were verified
the same way before committing this subset). debugscan_{x}_{y}_{w}_{h}.png
are the sheets classifySymbol attaches to char TextBoxes while scanning
scan_string_3 (GoldenDump debugscan, same pad=10/spacing=8 protocol as the
scan goldens; all 16 were verified, 4 diverse ones committed) — this covers
the classify path: segmentation-derived boxes, tiny crops, page coordinates.
tests/goldens/aaprobe.png calibrates Java2D SrcOver blending and
normalized stroke geometry (GoldenDump aaprobe).

Contract (ocr_spark/kernel/debug_render.py docstring): bit-exact everywhere
except the geometric divergence mask (antialiased slanted-segment bands +
text boxes), which the renderer itself reports. The mask must stay a minority
of the canvas — the exact region is asserted to cover >= 60% of all pixels —
and masked pixels are sanity-bounded so the mask cannot silently hide a
broken render.
"""

import glob
import os
import re

import numpy as np
import pytest

from ocr_spark.kernel.bitmap import extract_matrix
from ocr_spark.kernel.debug_render import (
    _blend,
    render_curvature_debug,
)
from ocr_spark.png import decode_gray, decode_rgb

GOLD = os.path.join(os.path.dirname(__file__), "goldens")

_GOLDENS = sorted(glob.glob(os.path.join(GOLD, "debugbmp", "*debugbmp_*.png")))


_SHEETS = {}


def _sheet_gray(name):
    if name not in _SHEETS:
        with open(os.path.join(GOLD, f"{name}.gray.png"), "rb") as f:
            _SHEETS[name] = decode_gray(f.read())
    return _SHEETS[name]


_SCAN_GOLDENS = sorted(glob.glob(os.path.join(GOLD, "debugbmp", "debugscan_*.png")))


def test_goldens_present():
    assert len(_GOLDENS) == 16
    assert len(_SCAN_GOLDENS) == 4


@pytest.mark.parametrize("path", _SCAN_GOLDENS, ids=lambda p: os.path.basename(p))
def test_debug_render_classify_path_parity(path):
    """Classify-path sheets: boxes come from the reference's own scan of
    scan_string_3, so this exercises border-trimmed tiny crops and real page
    coordinates through render_region_debug."""
    from ocr_spark.kernel.debug_render import render_region_debug

    x, y, w, h = map(int, re.match(r"debugscan_(\d+)_(\d+)_(\d+)_(\d+)\.png",
                                   os.path.basename(path)).groups())
    img, mask = render_region_debug(_sheet_gray("scan_string_3"), x, y, w, h)
    with open(path, "rb") as f:
        gold = decode_rgb(f.read())
    assert img.shape == gold.shape
    stray = (img != gold).any(axis=2) & ~mask
    assert stray.sum() == 0, f"{stray.sum()} px differ outside the divergence mask"


@pytest.mark.parametrize("path", _GOLDENS, ids=lambda p: os.path.basename(p))
def test_debug_render_parity(path):
    m = re.match(r"(?:(\w+)_)?debugbmp_(\d+)_(\d+)_(\d+)\.png", os.path.basename(path))
    prefix = m.group(1)
    # prefix encodes the variant: a font name (courier) or a non-default
    # matrix size (ms16 — OCREngine(16), exercising the n-generic geometry)
    n = 16 if prefix == "ms16" else 9
    sheet = prefix if prefix in ("courier",) else "arial"
    si, bx, by = int(m.group(2)), int(m.group(3)), int(m.group(4))
    # learn-grid cell geometry (CurvatureClassifier.learn, :56-66)
    matrix, _ = extract_matrix(_sheet_gray(sheet), bx, by, 69, 67, n)
    img, mask = render_curvature_debug(matrix, (bx, by))
    with open(path, "rb") as f:
        gold = decode_rgb(f.read())
    assert img.shape == gold.shape == (8 * (8 * n + 64) + 10, 40 + 8 * n + 42, 3)
    diff = (img.astype(int) - gold.astype(int))
    mismatch = (diff != 0).any(axis=2)
    # bit-exact outside the declared divergence mask
    stray = mismatch & ~mask
    assert stray.sum() == 0, f"{stray.sum()} px differ outside the divergence mask"
    # the mask must not swallow the render: >= 60% of the canvas is exact
    assert 1.0 - mask.mean() >= 0.60
    # masked divergence is AA quantization + font-shape differences only:
    # bounded mean error, and at most a small fraction of masked px differ
    masked_err = np.abs(diff)[mask].mean()
    assert masked_err < 40.0
    assert (mismatch & mask).sum() / mask.sum() < 0.30


def test_blend_matches_java_probe():
    """The committed aaprobe golden pins the SrcOver formula and the crisp
    normalized-stroke geometry (see GoldenDump.dumpAaProbe for layout)."""
    with open(os.path.join(GOLD, "aaprobe.png"), "rb") as f:
        probe = decode_rgb(f.read())
    bgs = [(0, 0, 0), (64, 64, 64), (128, 128, 128), (192, 192, 192), (255, 255, 255), (30, 60, 100)]
    strips = [((255, 255, 255), 240), ((255, 255, 255), 64), ((0, 0, 0), 16),
              ((255, 0, 0), 128), ((0, 255, 255), 128)]
    for j, bg in enumerate(bgs):
        for i, (src, a) in enumerate(strips):
            got = probe[j * 10 + 5, 12 + 15 * i]
            want = _blend(np.array(bg, dtype=np.uint8).reshape(1, 1, 3), src, a)[0, 0]
            assert tuple(got) == tuple(want), (bg, src, a)
    g = probe[:, :, 0].astype(int)
    # 1 px normalized stroke: drawLine(10,70,40,70) covers exactly x 10..40, y 70
    assert (g[70, 10:41] == 0).all() and (g[69, 8:44] == 255).all() and (g[71, 8:44] == 255).all()
    assert g[70, 9] == 255 and g[70, 41] == 255
    # 3 px normalized stroke: drawLine(10,80,40,80) covers y 79..81, x 9..41
    for y in (79, 80, 81):
        assert (g[y, 9:42] == 0).all() and g[y, 8] == 255 and g[y, 42] == 255
    assert (g[78, 8:44] == 255).all() and (g[82, 8:44] == 255).all()


def test_render_deterministic():
    matrix, _ = extract_matrix(_sheet_gray("arial"), 1, 1, 69, 67, 9)
    a, ma = render_curvature_debug(matrix, (1, 1))
    b, mb = render_curvature_debug(matrix, (1, 1))
    assert np.array_equal(a, b) and np.array_equal(ma, mb)


def test_cli_debug_render(tmp_path):
    """`ocr_spark.cli debug-render` writes the sheet PNG without a Spark
    session, matching the library render for the same region."""
    from ocr_spark.cli import main
    from ocr_spark.kernel.debug_render import render_region_debug

    out = tmp_path / "sheet.png"
    main(["debug-render", "--page", os.path.join(GOLD, "arial.gray.png"),
          "--box", "1", "1", "69", "67", "--out", str(out)])
    with open(out, "rb") as f:
        img = decode_rgb(f.read())
    want, _ = render_region_debug(_sheet_gray("arial"), 1, 1, 69, 67)
    assert np.array_equal(img, want)


def test_header_mask_covers_large_coordinates():
    """The header divergence box must scale with the coordinate digits: every
    non-white pixel in the header rows stays inside the mask."""
    matrix, _ = extract_matrix(_sheet_gray("arial"), 1, 1, 69, 67, 9)
    img, mask = render_curvature_debug(matrix, (12345, 67890))
    header_text = (img[0:14] != 255).any(axis=2)
    assert not (header_text & ~mask[0:14]).any()
