"""The extraction job: read -> explode -> route by cost class -> UDFs ->
reassemble -> bucketed idempotent commit.

Scale design (north rule: 10^12 docs, N vs 4N executors):

* Catalyst does the relational work: posexplode, kind routing, the
  media_ref equi-join (AQE picks broadcast vs shuffle; skew-join enabled).
* Cost classes are routed separately — a media span costs ~100x a text
  span, so they never share a task boundary.
* Skew defusal: after the media join, rows are hash-repartitioned on
  (doc_id, ord); a document with 10^3 media spans spreads over the whole
  cluster instead of stalling one task (explicit salt; AQE skew-join is the
  backstop for the join itself).
* Resume: the doc space is split into `buckets` by crc32(doc_id); each
  bucket writes to its own spans/bucket=K dir with overwrite semantics and
  then commits one manifest row (lineage + metrics + checksum). A rerun
  skips committed buckets and safely rewrites half-written ones — append-only
  Iceberg-style commit protocol on plain parquet.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import DOCUMENTS, MANIFEST, MEDIA
from .udfs import make_ocr_udf, make_strip_udf


def configure(builder_or_spark, shuffle_partitions: int | None = None):
    """Engine defaults: Arrow on, AQE on (coalesce + skew-join), capped
    Arrow batch size so media batches (PNG blobs) bound worker memory."""
    conf = {
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "1024",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    }
    if shuffle_partitions:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if isinstance(builder_or_spark, SparkSession):
        for k, v in conf.items():
            try:
                builder_or_spark.conf.set(k, v)
            except Exception:
                pass  # static conf (e.g. spark.serializer) on a live session
        return builder_or_spark
    for k, v in conf.items():
        builder_or_spark = builder_or_spark.config(k, v)
    return builder_or_spark


def read_documents(spark: SparkSession, input_dir: str) -> DataFrame:
    return spark.read.schema(DOCUMENTS).parquet(f"{input_dir}/documents.parquet")


def read_media(spark: SparkSession, input_dir: str) -> DataFrame:
    # never read the test-only `truth` column: explicit schema prunes it
    return spark.read.schema(MEDIA).parquet(f"{input_dir}/media.parquet").select(
        "media_ref", "png"
    )


def extract_spans(
    docs: DataFrame,
    media: DataFrame,
    character_spacing: float = 8.0,
    salt: bool = True,
) -> DataFrame:
    """Logical plan for one slice of documents -> output span rows."""
    exploded = docs.select(
        "doc_id", F.posexplode("spans").alias("ord", "span")
    ).select(
        "doc_id",
        F.col("ord").cast("int").alias("ord"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
    )

    strip_udf = make_strip_udf()
    text_out = (
        exploded.where(F.col("kind") == "text")
        .withColumn("out_text", strip_udf(F.col("text")))
        .select(
            "doc_id",
            "ord",
            "kind",
            F.col("out_text").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
        )
    )

    media_rows = exploded.where(F.col("kind") == "media").select(
        "doc_id", "ord", "kind", "media_ref"
    )
    joined = media_rows.join(media, "media_ref", "left")
    if salt:
        # spread a media-heavy document across the cluster before the
        # expensive kernel; without this, all spans of one hot doc (or one
        # hot media_ref) land in a single post-join partition
        joined = joined.repartition("doc_id", "ord")
    ocr_udf = make_ocr_udf(character_spacing=character_spacing)
    media_out = joined.withColumn("out_text", ocr_udf(F.col("png"))).select(
        "doc_id",
        "ord",
        "kind",
        F.col("out_text").alias("text"),
        "media_ref",
    )

    return text_out.unionByName(media_out)


def _read_committed(spark: SparkSession, manifest_dir: str) -> set[int]:
    try:
        m = spark.read.schema(MANIFEST).parquet(manifest_dir)
        return {
            r.partition_id
            for r in m.where(F.col("status") == "committed")
            .select("partition_id")
            .distinct()
            .collect()
        }
    except Exception:
        return set()


def extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    run_id: str = "run-0",
    buckets: int = 8,
    resume: bool = True,
    character_spacing: float = 8.0,
    salt: bool = True,
    fail_after: int | None = None,  # test hook: die after K bucket commits
) -> dict:
    """Run the full job with bucketed idempotent commits. Returns metrics."""
    docs = read_documents(spark, input_dir)
    media = read_media(spark, input_dir)
    manifest_dir = f"{output_dir}/_manifest"

    committed = _read_committed(spark, manifest_dir) if resume else set()
    metrics = {"buckets_total": buckets, "buckets_skipped": len(committed), "spans": 0}

    done = 0
    for b in range(buckets):
        if b in committed:
            continue
        subset = docs.where(F.crc32(F.col("doc_id")) % buckets == b)
        out = extract_spans(subset, media, character_spacing, salt=salt).persist()
        out.write.mode("overwrite").parquet(f"{output_dir}/spans/bucket={b}")

        agg = out.agg(
            F.countDistinct("doc_id").alias("docs"),
            F.count(F.lit(1)).alias("spans"),
            F.sum((F.col("kind") == "media").cast("long")).alias("media"),
            F.sum(
                F.crc32(
                    F.concat_ws(
                        "\x1f", "doc_id", F.col("ord").cast("string"), F.coalesce("text", F.lit(""))
                    )
                )
            ).alias("chk"),
        ).collect()[0]
        out.unpersist()

        row = [
            (
                run_id,
                b,
                int(agg["docs"] or 0),
                int(agg["spans"] or 0),
                int(agg["media"] or 0),
                str(agg["chk"] or 0),
                time.strftime("%Y-%m-%dT%H:%M:%S"),
                "committed",
            )
        ]
        spark.createDataFrame(row, MANIFEST).coalesce(1).write.mode("overwrite").parquet(
            f"{manifest_dir}/bucket={b}"
        )
        metrics["spans"] += int(agg["spans"] or 0)
        done += 1
        if fail_after is not None and done >= fail_after:
            raise RuntimeError(f"injected failure after {done} buckets")

    metrics["buckets_done"] = done
    return metrics


def read_output(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(f"{output_dir}/spans")
