#!/usr/bin/env python3
"""CLI wrapper over ocr_spark.fixtures — deterministic synthetic corpus
generator (FIXTURES.md). The synthesis logic lives in the package so the
Spark entry point and bench harness can call it without external tooling.

Usage: python3 tools/synth.py --scale tiny|small|bench --out DIR [--skew]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ocr_spark.fixtures import SCALES, SEED, write_corpus  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=list(SCALES), default="tiny")
    ap.add_argument("--out", required=True)
    ap.add_argument("--skew", action="store_true")
    ap.add_argument("--n-docs", type=int)
    ap.add_argument("--n-pages", type=int)
    ap.add_argument("--seed", type=int, default=SEED)
    args = ap.parse_args()

    cfg = dict(SCALES[args.scale])
    if args.n_docs:
        cfg["n_docs"] = args.n_docs
    if args.n_pages:
        cfg["n_pages"] = args.n_pages

    n_docs, n_pages, n_spans = write_corpus(args.out, skew=args.skew, seed=args.seed, **cfg)
    print(f"wrote {n_docs} docs, {n_pages} pages, {n_spans} expected spans to {args.out}")


if __name__ == "__main__":
    main()
