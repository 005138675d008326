"""Replicates the driver's correctness gate: every ``__spark_entry__``
query runs on Spark and its ``oracle_sql`` twin on DuckDB over the same
parquet tables; row count, column names and exact values must match.

Default scale sf0.001 for speed; set OCR_SPARK_ORACLE_SF=/root/testdata/sf0.01
to rehearse the exact driver configuration.
"""

import math
import os

import pytest

from conftest import REPO  # noqa: F401  (sys.path side effect)

pyspark = pytest.importorskip("pyspark")
duckdb = pytest.importorskip("duckdb")

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("OCR_SPARK_ORACLE_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("oracle-parity")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _canon(df):
    """Sort columns by name, then rows by all columns — the driver's
    order-insensitive compare."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _assert_equal(name, spark_pdf, duck_pdf):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != {len(duck_pdf)}"
    )
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == y, f"{name}.{col}[{i}]: {x!r} != {y!r} (diff {abs(x - y)})"
            else:
                assert x == y, f"{name}.{col}[{i}]: {x!r} != {y!r}"


ORACLE_NAMES = sorted(entrymod.oracle_sql())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))

# queries whose CORRECT answer is zero rows at test scale; every other
# oracle match must be non-vacuous (a 0==0 pass hides a broken predicate,
# e.g. a filter constant that matches nothing in the data)
EXPECTED_EMPTY = {"dedup_exact", "nations_except"}


def test_oracle_covers_queries():
    """Bidirectional registry/oracle coverage (VERDICT r04 #7): an oracle
    without a query is dead SQL; a query without an oracle silently drops to
    the driver's weaker rows-only check. Every genuinely non-SQL-expressible
    op must be listed here explicitly (none exist today)."""
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert not o - q, f"oracle_sql keys without queries(): {o - q}"
    assert not q - o, f"queries() keys without oracle_sql twin: {q - o}"


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    q = entrymod.queries()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    if name not in EXPECTED_EMPTY:
        assert len(spark_pdf) > 0, f"{name}: vacuous oracle match (0 rows)"
    _assert_equal(name, spark_pdf, duck_pdf)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    n = df.count()
    assert n > 0 or name == "dedup_exact", f"{name}: produced {n} rows"
    # schema must be stable across invocations
    df2 = entrymod.queries()[name](spark, SF_DIR)
    assert df.schema == df2.schema


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == ["doc_id", "ord", "kind", "text", "media_ref"]
