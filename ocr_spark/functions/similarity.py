"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — the dot product is a sequential
``aggregate`` fold over ``zip_with`` products in DOUBLE, entirely JVM-side
(whole-stage codegen), so the comparison loop never leaves Tungsten and the
fold order is deterministic (bit-identical across engines/runs).

Scale path: sign-LSH (random-hyperplane with axis-aligned planes = the sign
pattern of the first ``n_bits`` dimensions) buckets vectors so each query
only scans its own bucket — the join becomes an equi-join on the bucket id
instead of a cartesian product. At 100 TB the bucket table would be
bucketed/sorted on ``bucket`` so repeated query batches co-locate without
reshuffling.

Ranking is deterministic: ORDER BY sim DESC, neighbor id ASC; emitted sims
are rounded to 4 decimals so double-fold vs oracle summation agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)"
)
_NORM = "sqrt(aggregate({a}, cast(0.0 as double), (acc, v) -> acc + v * v))"


def with_norms(df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    return df.select(
        F.col(id_col),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("vec"),
    ).withColumn("norm", F.expr(_NORM.format(a="vec")))


def cosine_topk(
    df: DataFrame,
    k: int = 3,
    n_queries: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k: queries = vec_id < n_queries, neighbors =
    every other vector. Output: (query_id, neighbor_id, rnk, sim_r4)."""
    base = with_norms(df, vec_col, id_col)
    q = base.select(
        F.col(id_col).alias("query_id"), F.col("vec").alias("qv"), F.col("norm").alias("qn")
    ).where(F.col("query_id") < n_queries)
    n = base.select(
        F.col(id_col).alias("neighbor_id"), F.col("vec").alias("nv"), F.col("norm").alias("nn")
    )
    pairs = q.join(F.broadcast(n), F.col("query_id") != F.col("neighbor_id"))
    sims = pairs.withColumn(
        "sim", F.expr(_DOT.format(a="qv", b="nv")) / (F.col("qn") * F.col("nn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("sim", 4).alias("sim_r4"))
    )


def sign_buckets(df: DataFrame, n_bits: int = 8, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Sign-LSH bucket id: bit d set iff dimension d+1 is > 0."""
    bucket = F.expr(
        "aggregate(sequence(0, {m}), 0L, (acc, d) -> acc + CASE WHEN element_at({v}, d + 1) > 0 "
        "THEN shiftleft(1L, d) ELSE 0L END)".format(m=n_bits - 1, v=vec_col)
    )
    return df.select(F.col(id_col), bucket.alias("bucket"))


def bucket_histogram(df: DataFrame, n_bits: int = 8, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """LSH bucket occupancy — the skew diagnostic for the ANN index."""
    return (
        sign_buckets(df, n_bits, vec_col, id_col)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
    )


def bucketed_topk(
    df: DataFrame,
    k: int = 3,
    n_queries: int = 8,
    n_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k restricted to the query's own sign-LSH bucket: the
    similarity join becomes an equi-join on bucket. Approximate by design
    (recall < 1 vs cosine_topk); Output: (query_id, neighbor_id, rnk, sim_r4)."""
    base = with_norms(df, vec_col, id_col).join(
        sign_buckets(df, n_bits, vec_col, id_col), id_col
    )
    q = base.select(
        F.col(id_col).alias("query_id"), F.col("vec").alias("qv"), F.col("norm").alias("qn"), "bucket"
    ).where(F.col("query_id") < n_queries)
    n = base.select(
        F.col(id_col).alias("neighbor_id"), F.col("vec").alias("nv"), F.col("norm").alias("nn"), "bucket"
    )
    pairs = q.join(n, "bucket").where(F.col("query_id") != F.col("neighbor_id"))
    sims = pairs.withColumn(
        "sim", F.expr(_DOT.format(a="qv", b="nv")) / (F.col("qn") * F.col("nn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("sim", 4).alias("sim_r4"))
    )
