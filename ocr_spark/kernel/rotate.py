"""P8/P9: quadrant and arbitrary-angle (three-shear) rotation, bit-exact
with the reference's ImageRotator (ImageRotator.java:100-168 driver,
:275-470 shear kernels, :170-270 quadrant paths).

The reference routes every rotation through an ARGB int buffer:

  gray raster --getRGB--> sRGB ints --shears--> ints --drawImage--> gray

Both conversions are calibrated against the compiled reference:
  * gray -> channel value: the linear-gray->sRGB curve (javaimg.SRGB_LUT,
    golden gray_getrgb_lut.json)
  * ints -> gray: integer luma (r*77 + g*150 + b*29 + 128) >> 8, recovered
    exactly from tests/goldens/rgb2gray_probe.json (4096-point RGB lattice)

The shear kernels reproduce the reference's int32 arithmetic verbatim,
including its quirks: truncating (toward-zero) division in the weight
blend, and the channel-bleeding pack `(a<<24)|((r<<16)+(g<<8)+b)` where
out-of-range leftovers carry into neighboring channels.

Reference-bug note (documented, not replicated here): `Bitmap.rotate`
(Bitmap.java:96-109) never refreshes `mRaster` after an arbitrary-angle
rotation and discards the quadrant-rotation result entirely, so in the
reference the *recognition* path always sees the unrotated raster. These
kernels implement the image operators themselves (what `getImage()`
returns); the extraction pipeline applies them for real when deskew is
requested.
"""

from __future__ import annotations

import math

import numpy as np

from .javaimg import SRGB_LUT

I32 = np.int32


def _i32(v: int) -> np.int32:
    """Java int literal: wrap an unsigned 32-bit value into int32."""
    return np.int32(np.array(v & 0xFFFFFFFF, dtype=np.uint32))


def _luma(r, g, b):
    """INT_RGB -> TYPE_BYTE_GRAY drawImage conversion (calibrated probe)."""
    return (r * 77 + g * 150 + b * 29 + 128) >> 8


def gray_to_buffer(gray: np.ndarray) -> np.ndarray:
    """ImageRotatorBuffer(BufferedImage) on a TYPE_BYTE_GRAY image: getRGB
    applies the gray->sRGB curve and packs alpha=255 ARGB ints."""
    v = SRGB_LUT[gray].astype(np.int64)
    packed = (0xFF << 24) | (v << 16) | (v << 8) | v
    return (packed & 0xFFFFFFFF).astype(np.uint32).astype(I32)


def buffer_to_gray(buf: np.ndarray) -> np.ndarray:
    """new Bitmap(INT_RGB image): getRGB drops alpha, drawImage -> gray."""
    v = buf.astype(I32)
    r = (v >> 16) & 0xFF
    g = (v >> 8) & 0xFF
    b = v & 0xFF
    return _luma(r, g, b).astype(np.uint8)


def _unpack(row: np.ndarray):
    """Java channel extraction: 255&(v>>>24), 255&(v>>16), 255&(v>>8), 255&v."""
    u = row.astype(np.uint32)
    a = ((u >> 24) & 0xFF).astype(np.int64)
    v = row.astype(I32).astype(np.int64)
    r = (v >> 16) & 0xFF
    g = (v >> 8) & 0xFF
    b = v & 0xFF
    return a, r, g, b


def _pack(a, r, g, b) -> np.ndarray:
    """The reference's mixed-operator pack: (a<<24)|((r<<16)+(g<<8)+b) in
    int32 — out-of-range channels deliberately bleed via the additions."""
    total = (r << 16) + (g << 8) + b
    packed = ((a << 24) | total) & 0xFFFFFFFF
    return packed.astype(np.uint32).astype(I32)


def _trunc_div256(p: np.ndarray) -> np.ndarray:
    """Java integer division by 256 (truncates toward zero)."""
    return np.where(p >= 0, p >> 8, -((-p) >> 8))


def _blend_weight(ch: np.ndarray, weight: int) -> np.ndarray:
    return np.clip(_trunc_div256(ch * weight), 0, 255)


def _skew_row(src_row: np.ndarray, dst_row: np.ndarray, offset: int, weight: int, bg: int):
    """horizontalSkew (ImageRotator.java:373-470) on one row of packed ints.
    verticalSkew (:472-578) is this function applied to a column view."""
    sw = src_row.shape[0]
    dw = dst_row.shape[0]
    bg_ch = np.array(
        [(bg >> 24) & 0xFF, (bg >> 16) & 0xFF, (bg >> 8) & 0xFF, bg & 0xFF], dtype=np.int64
    )

    if offset > 0:
        dst_row[: min(offset, dw)] = _i32(bg)

    a, r, g, b = _unpack(src_row)
    chans = [a, r, g, b]
    outs = []
    for j, ch in enumerate(chans):
        left = _blend_weight(ch, weight)
        prev = np.empty_like(left)
        prev[0] = min(max((int(bg_ch[j]) * weight) // 256 if int(bg_ch[j]) * weight >= 0 else -((-int(bg_ch[j]) * weight) // 256), 0), 255)
        prev[1:] = left[:-1]
        outs.append(ch - (left - prev))
    packed = _pack(outs[0], outs[1], outs[2], outs[3])

    xs = np.arange(sw) + offset
    valid = (xs >= 0) & (xs < dw)
    dst_row[xs[valid]] = packed[valid]

    # rightmost leftover pixel + background fill to the right
    xpos = sw + offset
    if xpos < dw:
        last_left = [int(_blend_weight(np.array([ch[-1]]), weight)[0]) for ch in chans]
        vals = []
        for j in range(4):
            bgl = int(np.clip(_trunc_div256(np.array([bg_ch[j] * weight])), 0, 255)[0])
            vals.append(int(bg_ch[j]) - (bgl - last_left[j]))
        dst_row[xpos] = _pack(*[np.array([v], dtype=np.int64) for v in vals])[0]
        if xpos + 1 < dw:
            dst_row[xpos + 1 :] = _i32(bg)


def _rotate_fast(buf: np.ndarray, angle: int) -> np.ndarray:
    """ImageRotator.rotateFast (Java2D quadrant rotate, :49-58 call sites
    :28-41): for ODD dimensions the integer centers shift the result by one
    pixel and clip one row/column, leaving an uninitialized BLACK stripe —
    replicated exactly (validated against rot_fixed_{90,180,270} goldens)."""
    sh, sw = buf.shape
    if angle == 90:
        dst = np.zeros((sw, sh), dtype=I32)  # black = uninitialized INT_RGB
        ys = np.arange(sh)
        cols = 2 * (sh // 2) - 1 - ys
        m = (cols >= 0) & (cols < sh)
        dst[:, cols[m]] = buf[ys[m], :].T
        return dst
    if angle == 180:
        dst = np.zeros((sh, sw), dtype=I32)
        ys = np.arange(sh)
        xs = np.arange(sw)
        rows = 2 * (sh // 2) - 1 - ys
        cols = 2 * (sw // 2) - 1 - xs
        my = (rows >= 0) & (rows < sh)
        mx = (cols >= 0) & (cols < sw)
        dst[np.ix_(rows[my], cols[mx])] = buf[np.ix_(ys[my], xs[mx])]
        return dst
    # 270
    dst = np.zeros((sw, sh), dtype=I32)
    xs = np.arange(sw)
    rows = 2 * (sw // 2) - 1 - xs
    m = (rows >= 0) & (rows < sw)
    dst[rows[m], :] = buf[:, xs[m]].T
    return dst


def _rotate45(buf: np.ndarray, angle_deg: float, bg: int) -> np.ndarray:
    """rotate45 (ImageRotator.java:275-370): three shear passes."""
    rad = math.radians(angle_deg)
    sin_e = math.sin(rad)
    tan_h = math.tan(rad / 2)
    sh, sw = buf.shape

    # 1st shear (horizontal)
    w1 = sw + int(sh * abs(tan_h) + 0.5)
    h1 = sh
    dst1 = np.full((h1, w1), _i32(bg), dtype=I32)
    for u in range(h1):
        if tan_h >= 0:
            shear = (u + 0.5) * tan_h
        else:
            shear = (u - h1 + 0.5) * tan_h
        ishear = int(shear)  # trunc toward zero
        weight = int(255 * (shear - ishear) + 1)
        _skew_row(buf[u], dst1[u], ishear, weight, bg)

    # 2nd shear (vertical)
    w2 = w1
    h2 = int(sw * abs(sin_e) + sh * math.cos(rad) + 0.5) + 1
    dst2 = np.full((h2, w2), _i32(bg), dtype=I32)
    if sin_e > 0:
        offset = (sw - 1) * sin_e
    else:
        offset = -sin_e * (sw - w2)
    for u in range(w2):
        ishear = int(offset)
        weight = int(255 * (offset - ishear) + 1)
        _skew_row(dst1[:, u], dst2[:, u], ishear, weight, bg)
        offset -= sin_e

    # 3rd shear (horizontal)
    w3 = int(sh * abs(sin_e) + sw * math.cos(rad) + 0.5) + 1
    h3 = h2
    dst3 = np.full((h3, w3), _i32(bg), dtype=I32)
    if sin_e >= 0:
        offset = (sw - 1) * sin_e * -tan_h
    else:
        offset = tan_h * ((sw - 1) * -sin_e + (1 - h3))
    for u in range(h3):
        ishear = int(offset)
        weight = int(255 * (offset - ishear) + 1)
        _skew_row(dst2[u], dst3[u], ishear, weight, bg)
        offset += tan_h

    return dst3


def rotate_gray(gray: np.ndarray, angle_deg: float, bg: int = 0xFFFFFFFF) -> np.ndarray:
    """ImageRotator.rotate(img, angle, quality=1, bg) on a gray raster,
    returning the gray result (through the calibrated conversions).

    Quadrant angles use the rotateFast path (pure permutation of the int
    buffer); anything else folds into (-45, 45] with pre-quadrant rotation
    and runs the three shears. Angle must be in [0, 360) like the reference.
    """
    if angle_deg < 0 or angle_deg >= 360:
        raise ValueError(f"Angle not supported: {angle_deg}")
    if angle_deg == 0:
        return gray.copy()
    buf = gray_to_buffer(gray)
    if angle_deg in (90, 180, 270):
        return buffer_to_gray(_rotate_fast(buf, int(angle_deg)))

    # Reference quirks replicated exactly (ImageRotator.java:1086-1092 and
    # :100-168): quality-1 dispatch NEGATES the angle (rotateByShears(-a)),
    # renormalizes to [0,360), and an angle that lands in (315,360) is fed
    # to rotate45 un-folded (its half-angle trig makes that equivalent to
    # the negative residual). The pre-rotations here are the in-buffer
    # rotate90/270, which spin OPPOSITE to the Java2D quadrant path above.
    angle = -angle_deg
    while angle >= 360:
        angle -= 360
    while angle < 0:
        angle += 360
    if 45 < angle <= 135:
        buf = np.rot90(buf, k=1)
        angle -= 90
    elif 135 < angle <= 225:
        buf = np.rot90(buf, k=2)
        angle -= 180
    elif 225 < angle <= 315:
        buf = np.rot90(buf, k=-1)
        angle -= 270
    if angle != 0:
        buf = _rotate45(buf, angle, bg)
    return buffer_to_gray(buf)


# --------------------------------------------------------------------------
# P10: quality 2-5 B-spline rotation (the FreeImage port at
# ImageRotator.java:590-1002,1086-1120). Off the engine's default path
# (Bitmap.rotate always passes quality 1) but part of the reference's
# operator surface. The recursions run vectorized across lines; the inverse
# mapping and mirror indexing run vectorized across all output pixels.
# --------------------------------------------------------------------------

def _spline_poles(degree: int):
    if degree == 2:
        return [math.sqrt(8.0) - 3.0]
    if degree == 3:
        return [math.sqrt(3.0) - 2.0]
    if degree == 4:
        return [
            math.sqrt(664.0 - math.sqrt(438976.0)) + math.sqrt(304.0) - 19.0,
            math.sqrt(664.0 + math.sqrt(438976.0)) - math.sqrt(304.0) - 19.0,
        ]
    if degree == 5:
        return [
            math.sqrt(135.0 / 2.0 - math.sqrt(17745.0 / 4.0)) + math.sqrt(105.0 / 4.0) - 13.0 / 2.0,
            math.sqrt(135.0 / 2.0 + math.sqrt(17745.0 / 4.0)) - math.sqrt(105.0 / 4.0) - 13.0 / 2.0,
        ]
    raise ValueError("Invalid spline degree")


def _coeffs_along_rows(c: np.ndarray, poles) -> None:
    """convertToInterpolationCoefficients (:590-627) on every row at once."""
    N = c.shape[1]
    if N == 1:
        return
    lam = 1.0
    for z in poles:
        lam *= (1.0 - z) * (1.0 - 1.0 / z)
    c *= lam
    tol = 1e-9
    for z in poles:
        horizon = int(math.ceil(math.log(tol) / math.log(abs(z))))
        if horizon < N:
            zn = z
            s = c[:, 0].copy()
            for n in range(1, horizon):
                s += zn * c[:, n]
                zn *= z
            c[:, 0] = s
        else:
            zn = z
            iz = 1.0 / z
            z2n = z ** (N - 1)
            s = c[:, 0] + z2n * c[:, N - 1]
            z2n *= z2n * iz
            for n in range(1, N - 1):
                s += (zn + z2n) * c[:, n]
                zn *= z
                z2n *= iz
            c[:, 0] = s / (1.0 - zn * zn)
        for n in range(1, N):
            c[:, n] += z * c[:, n - 1]
        c[:, N - 1] = (z / (z * z - 1.0)) * (z * c[:, N - 2] + c[:, N - 1])
        for n in range(N - 2, -1, -1):
            c[:, n] = z * (c[:, n + 1] - c[:, n])


def _samples_to_coefficients(img: np.ndarray, degree: int) -> None:
    poles = _spline_poles(degree)
    _coeffs_along_rows(img, poles)          # along x
    t = np.ascontiguousarray(img.T)
    _coeffs_along_rows(t, poles)            # along y
    img[:] = t.T


def _bspline_weights(frac: np.ndarray, degree: int):
    """Interpolation weights per pixel; frac = coord - center index."""
    w = frac
    W = [None] * (degree + 1)
    if degree == 2:
        W[1] = 3.0 / 4.0 - w * w
        W[2] = 0.5 * (w - W[1] + 1.0)
        W[0] = 1.0 - W[1] - W[2]
    elif degree == 3:
        W[3] = (1.0 / 6.0) * w * w * w
        W[0] = (1.0 / 6.0) + 0.5 * w * (w - 1.0) - W[3]
        W[2] = w + W[0] - 2.0 * W[3]
        W[1] = 1.0 - W[0] - W[2] - W[3]
    elif degree == 4:
        w2 = w * w
        t = (1.0 / 6.0) * w2
        W0 = 0.5 - w
        W0 = W0 * W0
        W0 = W0 * (1.0 / 24.0) * W0
        t0 = w * (t - 11.0 / 24.0)
        t1 = 19.0 / 96.0 + w2 * (0.25 - t)
        W[0] = W0
        W[1] = t1 + t0
        W[3] = t1 - t0
        W[4] = W0 + t0 + 0.5 * w
        W[2] = 1.0 - W[0] - W[1] - W[3] - W[4]
    elif degree == 5:
        w2 = w * w
        W[5] = (1.0 / 120.0) * w * w2 * w2
        w2m = w2 - w
        w4 = w2m * w2m
        wh = w - 0.5
        t = w2m * (w2m - 3.0)
        W[0] = (1.0 / 24.0) * (1.0 / 5.0 + w2m + w4) - W[5]
        t0 = (1.0 / 24.0) * (w2m * (w2m - 5.0) + 46.0 / 5.0)
        t1 = (-1.0 / 12.0) * wh * (t + 4.0)
        W[2] = t0 + t1
        W[3] = t0 - t1
        t0 = (1.0 / 16.0) * (9.0 / 5.0 - t)
        t1 = (1.0 / 24.0) * wh * (w4 - w2m - 5.0)
        W[1] = t0 + t1
        W[4] = t0 - t1
    else:
        raise ValueError("Invalid spline degree")
    return W


def _mirror_index(idx: np.ndarray, n: int) -> np.ndarray:
    """Mirror boundary folding (:898-910), Java truncating int division."""
    if n == 1:
        return np.zeros_like(idx)
    n2 = 2 * n - 2
    neg = idx < 0
    folded = np.where(neg, -idx - n2 * ((-idx) // n2), idx - n2 * (idx // n2))
    return np.where(folded >= n, n2 - folded, folded)


def _interpolate_grid(coeff: np.ndarray, xs: np.ndarray, ys: np.ndarray, degree: int) -> np.ndarray:
    """InterpolatedValue (:768-926) for arrays of sample coordinates."""
    H, W = coeff.shape
    if degree & 1:
        xi0 = np.floor(xs).astype(np.int64) - degree // 2
        yi0 = np.floor(ys).astype(np.int64) - degree // 2
    else:
        xi0 = np.floor(xs + 0.5).astype(np.int64) - degree // 2
        yi0 = np.floor(ys + 0.5).astype(np.int64) - degree // 2
    cx = degree // 2 if degree & 1 else degree // 2
    # weight center: index[1] for deg 2/3, index[2] for deg 4/5
    ctr = 1 if degree in (2, 3) else 2
    xw = _bspline_weights(xs - (xi0 + ctr), degree)
    yw = _bspline_weights(ys - (yi0 + ctr), degree)
    out = np.zeros_like(xs)
    for j in range(degree + 1):
        yj = _mirror_index(yi0 + j, H)
        row_acc = np.zeros_like(xs)
        for i in range(degree + 1):
            xi = _mirror_index(xi0 + i, W)
            row_acc += xw[i] * coeff[yj, xi]
        out += yw[j] * row_acc
    return out


def _rotate8(src: np.ndarray, angle_deg: float, x_origin: float, y_origin: float,
             degree: int, bg_channel: int) -> np.ndarray:
    """Rotate8Bit (:928-1002): one channel, bottom-up buffer convention."""
    H, W = src.shape
    img = np.flipud(src).astype(np.float64)
    _samples_to_coefficients(img, degree)

    a = math.radians(angle_deg)
    a11, a12, a21, a22 = math.cos(a), -math.sin(a), math.sin(a), math.cos(a)
    x0 = a11 * x_origin + a12 * y_origin
    y0 = a21 * x_origin + a22 * y_origin
    xs_shift = x_origin - x0
    ys_shift = y_origin - y0

    yy, xx = np.meshgrid(np.arange(H, dtype=np.float64), np.arange(W, dtype=np.float64),
                         indexing="ij")
    x1 = a12 * yy + xs_shift + a11 * xx
    y1 = a22 * yy + ys_shift + a21 * xx
    inside = (x1 > -0.5) & (x1 < W - 0.5) & (y1 > -0.5) & (y1 < H - 0.5)
    p = np.full((H, W), float(bg_channel))
    p[inside] = _interpolate_grid(img, x1[inside], y1[inside], degree)
    vals = np.clip(np.trunc(p + 0.5), 0, 255).astype(np.uint8)
    return np.flipud(vals)


def rotate_gray_spline(gray: np.ndarray, angle_deg: float, quality: int,
                       bg: int = 0xFFFFFFFF) -> np.ndarray:
    """ImageRotatorBuffer.rotate quality 2-5 (:1086-1120): pad to the
    rotation bounding box with the BACKGROUND color (Arrays.fill), rotate
    about the padded center, return the whole buffer through the calibrated
    gray conversions (the post-rotation crop is a no-op for |angle|<90 since
    both getBoundingBox calls yield the padded dimensions). Gray input means
    all three RGB channels are identical, so one channel pass suffices."""
    if quality < 2 or quality > 5:
        raise ValueError("quality must be 2..5")
    h, w = gray.shape
    rad = abs(math.cos(math.radians(angle_deg))), abs(math.sin(math.radians(angle_deg)))
    if angle_deg in (0, 180):
        bw, bh = w, h
    elif angle_deg in (90, 270):
        bw, bh = h, w
    else:
        bw = int(math.ceil(rad[0] * w + rad[1] * h))
        bh = int(math.ceil(rad[1] * w + rad[0] * h))
    bw, bh = max(w, bw), max(h, bh)

    bg_ch = (bg >> 8) & 0xFF
    chan = SRGB_LUT[gray].astype(np.int64)
    padded = np.full((bh, bw), bg_ch, dtype=np.int64)  # Arrays.fill(tmp, bg)
    oy, ox = (bh - h) // 2, (bw - w) // 2
    padded[oy : oy + h, ox : ox + w] = chan

    out = _rotate8(padded.astype(np.float64), angle_deg, bw / 2.0 - 0.5, bh / 2.0 - 0.5,
                   quality, bg_ch)
    v = out.astype(np.int64)
    return _luma(v, v, v).astype(np.uint8)
