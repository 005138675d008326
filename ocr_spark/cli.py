"""spark-submit entry point (absolute imports: spark-submit runs this file
as a top-level script, with the package supplied via --py-files).

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
    ex.add_argument(
        "--fonts", default="arial",
        help="comma list of bundled font sheets to learn (arial,courier); "
             "multiple fonts accumulate into one template set",
    )
    ex.add_argument("--master", default=None, help="override master (default: from spark-submit)")
    ex.add_argument("--shuffle-partitions", type=int, default=None)
    ex.add_argument(
        "--catalog", choices=("parquet", "iceberg"), default="parquet",
        help="commit substrate: parquet (default; manifest-log substitute) "
             "or iceberg (requires the iceberg-spark-runtime jar — the CLI "
             "fails fast with exact swap instructions when it is absent)",
    )
    ex.add_argument(
        "--warehouse", default=None,
        help="warehouse URI for --catalog iceberg (default: <output>/warehouse)",
    )
    ex.add_argument(
        "--partitions", type=int, default=None,
        help="salt-shuffle width for the CPU-bound UDF stages (default: one "
             "task per core; raise for straggler hiding / bounded retry "
             "granularity on heterogeneous clusters)",
    )

    st = sub.add_parser("stream", help="streaming extraction over arriving parquet files")
    st.add_argument("--stream-dir", required=True, help="directory watched for documents parquet")
    st.add_argument("--media-dir", required=True)
    st.add_argument("--output", required=True)
    st.add_argument("--checkpoint", required=True)
    st.add_argument("--continuous", action="store_true",
                    help="keep running (default: drain available files and stop)")
    st.add_argument("--character-spacing", type=float, default=8.0)
    st.add_argument(
        "--fonts", default="arial",
        help="comma list of bundled font sheets to learn (arial,courier)",
    )
    st.add_argument("--master", default=None)
    st.add_argument("--shuffle-partitions", type=int, default=None)

    dr = sub.add_parser(
        "debug-render",
        help="F8 per-glyph debug curvature sheet for a page region "
             "(driver-side kernel tool, no Spark session)",
    )
    dr.add_argument("--page", required=True, help="8-bit grayscale PNG (page raster)")
    dr.add_argument("--box", required=True, nargs=4, type=int,
                    metavar=("X", "Y", "W", "H"), help="glyph box on the page")
    dr.add_argument("--out", required=True, help="output PNG path")

    args = ap.parse_args(argv)

    if args.cmd == "debug-render":
        from ocr_spark.kernel.debug_render import render_region_debug
        from ocr_spark.png import decode_gray, encode_rgb

        with open(args.page, "rb") as f:
            gray = decode_gray(f.read())
        x, y, w, h = args.box
        img, _mask = render_region_debug(gray, x, y, w, h)
        with open(args.out, "wb") as f:
            f.write(encode_rgb(img))
        print(json.dumps({"out": args.out, "width": img.shape[1], "height": img.shape[0]}))
        return

    from pyspark.sql import SparkSession

    from ocr_spark.pipeline.job import configure, extract

    builder = SparkSession.builder.appName(f"ocr_spark.{args.cmd}")
    if args.master:
        builder = builder.master(args.master)
    builder = configure(builder, args.shuffle_partitions)

    catalog_name = None
    if args.cmd == "extract" and args.catalog == "iceberg":
        # fail fast, BEFORE paying session spin-up: raises IcebergUnavailable
        # with the exact --packages/--conf swap lines when no runtime jar
        from ocr_spark.pipeline.catalog import configure_iceberg, require_iceberg

        catalog_name = "ocr"
        jars = require_iceberg(catalog_name)
        builder = configure_iceberg(
            builder, args.warehouse or f"{args.output}/warehouse", catalog_name,
            jars=jars,
        )

    spark = builder.getOrCreate()
    try:
        if args.cmd == "extract":
            metrics = extract(
                spark,
                args.input,
                args.output,
                run_id=args.run_id,
                buckets=args.buckets,
                resume=not args.no_resume,
                character_spacing=args.character_spacing,
                salt=not args.no_salt,
                partitions=args.partitions,
                fonts=tuple(f for f in args.fonts.split(",") if f),
                catalog=catalog_name,
            )
            print(json.dumps(metrics))
        else:  # stream
            from ocr_spark.streaming.job import stream_extract

            q = stream_extract(
                spark,
                args.stream_dir,
                args.media_dir,
                args.output,
                args.checkpoint,
                character_spacing=args.character_spacing,
                available_now=not args.continuous,
                fonts=tuple(f for f in args.fonts.split(",") if f),
            )
            q.awaitTermination()
            print(json.dumps({"stream": "drained" if not args.continuous else "stopped"}))
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
