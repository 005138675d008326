#!/usr/bin/env python3
"""Train the glyph MLP for the multiclassifier vote slot (SURVEY.md T7).

The reference's gen-2 "neural" classifier never got a training loop
(ocr2/ConvolutionalClassifier.java is feature extraction only, MNIST images
stripped from the repo), so this is the from-scratch realization of that
slot: a small 2-layer MLP over the same 9x9 binarized glyph matrices the
curvature classifier consumes, trained on the learned alphabet glyphs plus
+-1px shift augmentation.

Fully deterministic (fixed seed, full-batch GD, no wall-clock): rerunning
this script reproduces ocr_spark/data/glyph_mlp.npz byte-for-byte, so the
committed weights are auditable. Usage:

    python3 tools/train_glyph_mlp.py          # writes ocr_spark/data/glyph_mlp.npz
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ocr_spark.kernel.bitmap import extract_matrix  # noqa: E402
from ocr_spark.kernel.classify import DEFAULT_ALPHABET, DEFAULT_MATRIX_SIZE  # noqa: E402
from ocr_spark.png import decode_gray  # noqa: E402

SEED = 20260817
HIDDEN = 64
EPOCHS = 800
LR = 0.5


def alphabet_matrices():
    """The same grid crops learn_sheet uses (CurvatureClassifier.java:56-66)."""
    with open(os.path.join(REPO, "ocr_spark", "data", "arial.gray.png"), "rb") as f:
        sheet = decode_gray(f.read())
    mats, chars = [], []
    for gy in range(6):
        for gx in range(13):
            bx, by = 71 * gx + 1, 69 * gy + 1
            m, _ = extract_matrix(sheet, bx, by, 69, 67, DEFAULT_MATRIX_SIZE)
            if not m.any():
                continue
            mats.append(m)
            chars.append(DEFAULT_ALPHABET[13 * gy + gx])
    return mats, chars


def augment(m: np.ndarray):
    """Identity + 8 one-pixel shifts (zero-padded, matching how a slightly
    off-center crop binarizes)."""
    out = [m]
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            s = np.zeros_like(m)
            ys, ye = max(0, dy), m.shape[0] + min(0, dy)
            xs, xe = max(0, dx), m.shape[1] + min(0, dx)
            s[ys:ye, xs:xe] = m[ys - dy : ye - dy, xs - dx : xe - dx]
            out.append(s)
    return out


def main():
    mats, chars = alphabet_matrices()
    n_cls = len(mats)  # class = symbol index (mirrors the 1-NN index space)
    X, y = [], []
    for i, m in enumerate(mats):
        for v in augment(m):
            X.append(v.reshape(-1).astype(np.float64))
            y.append(i)
    X = np.stack(X)
    y = np.array(y)

    rng = np.random.default_rng(SEED)
    d = X.shape[1]
    W1 = rng.normal(0, 0.2, (d, HIDDEN))
    b1 = np.zeros(HIDDEN)
    W2 = rng.normal(0, 0.2, (HIDDEN, n_cls))
    b2 = np.zeros(n_cls)

    onehot = np.eye(n_cls)[y]
    for epoch in range(EPOCHS):
        h = np.tanh(X @ W1 + b1)
        logits = h @ W2 + b2
        logits -= logits.max(axis=1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(axis=1, keepdims=True)
        g = (p - onehot) / len(X)
        gW2 = h.T @ g
        gb2 = g.sum(0)
        gh = g @ W2.T * (1 - h * h)
        gW1 = X.T @ gh
        gb1 = gh.sum(0)
        W1 -= LR * gW1
        b1 -= LR * gb1
        W2 -= LR * gW2
        b2 -= LR * gb2
    acc = (p.argmax(1) == y).mean()
    print(f"train acc over {len(X)} samples / {n_cls} classes: {acc:.4f}")

    out = os.path.join(REPO, "ocr_spark", "data", "glyph_mlp.npz")
    np.savez(out, W1=W1, b1=b1, W2=W2, b2=b2, chars=np.array(chars), n=DEFAULT_MATRIX_SIZE)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
