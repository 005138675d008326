#!/usr/bin/env python3
"""Bench harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "extract_docs_per_sec": ...}

Each query is forced end-to-end with a noop write (materializes every
column, unlike count()). The flagship extraction pipeline is benched on a
deterministic synthesized interleaved corpus (generation excluded from the
timing; cached under /tmp) and reported as docs/sec alongside the per-query
seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EXTRACT_DOCS = int(os.environ.get("OCR_SPARK_BENCH_DOCS", "4000"))
EXTRACT_PAGES = int(os.environ.get("OCR_SPARK_BENCH_PAGES", "800"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_order_revenue",
    "q5_nation_volume",
    "brand_volume",
    "events_hourly",
    "events_sessionize",
    "doc_quality",
    "doc_fingerprints",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard",
    "simhash_bits",
    "emb_cosine_topk",
    "emb_lsh_topk",
    "winnow_fingerprints",
    "q1_rollup",
    # the three most expensive round-4 TPC-H shapes (VERDICT r04 #3): q9
    # runs 8 broadcasts over the full fact scan, q20 the 8-exchange
    # qualification, q21 the fact self-union + per-order profile agg
    "q9_profit_by_nation",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
]


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from ocr_spark.fixtures import write_corpus
    from ocr_spark.pipeline.job import configure, extract_spans, read_documents, read_media, read_pdfs
    from ocr_spark.procstat import StealMeter

    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ocr_spark-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("OCR_SPARK_DRIVER_MEM", "24g"))
    )
    spark = configure(builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    qmap = entrymod.queries()

    # --- warmup (excluded from timing): measure the steady-state asymptote,
    # not one-time session costs a long-running cluster never re-pays.
    # (1) one cheap scan+agg warms JVM/codegen/parquet-footer paths;
    # (2) one tiny end-to-end extraction (100 docs / 60 pages) spins up the
    #     Python runner pool on every core and warms Arrow + the OCR/strip
    #     kernels, so the timed extraction leg measures throughput, not
    #     worker spin-up.
    from ocr_spark.fixtures import ensure_corpus

    _force(qmap["q6_forecast_revenue"](spark, SF_DIR))
    tiny = ensure_corpus(
        os.path.join(os.environ.get("OCR_SPARK_FIXTURES", "/tmp/ocr_spark_fixtures"), "tiny")
    )
    _force(extract_spans(read_documents(spark, tiny), read_media(spark, tiny)))

    # Per-leg hypervisor-steal telemetry (VERDICT r03 #2): a leg's seconds are
    # only interpretable next to how much CPU the host actually delivered.
    times: dict[str, float] = {}
    steal: dict[str, float | None] = {}
    run_meter = StealMeter()
    from ocr_spark.functions.dedup import release_persisted

    for name in HEADLINE:
        m = StealMeter()
        t0 = time.perf_counter()
        _force(qmap[name](spark, SF_DIR))
        times[name] = round(time.perf_counter() - t0, 3)
        steal[name] = m.pct()
        # drop any persist_if_large caches the leg installed: no later leg
        # reuses them, and leaked InMemoryRelations would skew memory headroom
        release_persisted()

    # flagship extraction throughput (corpus cached; synth excluded from timing)
    corpus = os.path.join(
        os.environ.get("OCR_SPARK_FIXTURES", "/tmp/ocr_spark_fixtures"),
        f"bench_{EXTRACT_DOCS}x{EXTRACT_PAGES}",
    )
    from ocr_spark.fixtures import FIXTURE_VERSION

    # version-keyed marker (not existence-only): a fixture-content change
    # must regenerate a cached corpus, or machines diverge by cache history
    marker = os.path.join(corpus, "_DONE")
    want = f"v{FIXTURE_VERSION} bench corpus\n"
    if not (os.path.exists(marker) and open(marker).read() == want):
        write_corpus(corpus, n_docs=EXTRACT_DOCS, n_pages=EXTRACT_PAGES)
        with open(marker, "w") as f:
            f.write(want)
    docs = read_documents(spark, corpus)
    media = read_media(spark, corpus)
    m = StealMeter()
    t0 = time.perf_counter()
    _force(extract_spans(docs, media, character_spacing=8.0))
    extract_s = time.perf_counter() - t0
    times["extract_spans"] = round(extract_s, 3)
    steal["extract_spans"] = m.pct()

    # three-kind interleave (text + image-OCR + PDF parse): the PDF cost
    # class has its own decode path, so the headline tracks it separately
    corpus3 = os.path.join(
        os.environ.get("OCR_SPARK_FIXTURES", "/tmp/ocr_spark_fixtures"),
        f"bench3_{EXTRACT_DOCS}x{EXTRACT_PAGES}",
    )
    marker3 = os.path.join(corpus3, "_DONE")
    want3 = f"v{FIXTURE_VERSION} bench corpus3\n"
    if not (os.path.exists(marker3) and open(marker3).read() == want3):
        write_corpus(corpus3, n_docs=EXTRACT_DOCS, n_pages=EXTRACT_PAGES, pdf_p=0.25)
        with open(marker3, "w") as f:
            f.write(want3)
    docs3 = read_documents(spark, corpus3)
    media3 = read_media(spark, corpus3)
    pdfs3 = read_pdfs(spark, corpus3)
    m = StealMeter()
    t0 = time.perf_counter()
    _force(extract_spans(docs3, media3, character_spacing=8.0, pdfs=pdfs3))
    extract3_s = time.perf_counter() - t0
    times["extract_interleaved3"] = round(extract3_s, 3)
    steal["extract_interleaved3"] = m.pct()

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": f"headline query wall seconds at {SF_DIR} on local[{CPUS}]",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                "extract_docs": EXTRACT_DOCS,
                "extract_docs_per_sec": round(EXTRACT_DOCS / extract_s, 2),
                "extract3_docs_per_sec": round(EXTRACT_DOCS / extract3_s, 2),
                "steal_pct": run_meter.pct(),
                "steal_pct_per_query": steal,
                # the driver verifies a PREFIX of the registry (50 entries in
                # rounds 3-4); recording the order here makes any sampling
                # change diagnosable from the artifacts alone (VERDICT r04 #7)
                "registry_order": list(qmap),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
