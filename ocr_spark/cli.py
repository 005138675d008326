"""spark-submit entry point.

  spark-submit --py-files dist/ocr_spark.zip ocr_spark/cli.py extract \
      --input /data/corpus --output /data/out --buckets 64

Also runnable as `python3 -m ocr_spark.cli ...` for local smoke runs.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="ocr_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("extract", help="run the extraction pipeline")
    ex.add_argument("--input", required=True)
    ex.add_argument("--output", required=True)
    ex.add_argument("--run-id", default="run-0")
    ex.add_argument("--buckets", type=int, default=8)
    ex.add_argument("--no-resume", action="store_true")
    ex.add_argument("--no-salt", action="store_true")
    ex.add_argument("--character-spacing", type=float, default=8.0)
    ex.add_argument("--master", default=None, help="override master (default: from spark-submit)")
    ex.add_argument("--shuffle-partitions", type=int, default=None)

    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from .pipeline.job import configure, extract

    builder = SparkSession.builder.appName("ocr_spark.extract")
    if args.master:
        builder = builder.master(args.master)
    builder = configure(builder, args.shuffle_partitions)
    spark = builder.getOrCreate()
    try:
        metrics = extract(
            spark,
            args.input,
            args.output,
            run_id=args.run_id,
            buckets=args.buckets,
            resume=not args.no_resume,
            character_spacing=args.character_spacing,
            salt=not args.no_salt,
        )
        print(json.dumps(metrics))
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
