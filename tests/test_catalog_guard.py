"""The --catalog iceberg guard (VERDICT r04 #9): no Spark session needed —
the whole point is that the failure happens BEFORE session spin-up, with
actionable swap instructions."""

import os

import pytest

from conftest import REPO  # noqa: F401


def test_no_iceberg_runtime_in_this_container(monkeypatch):
    from ocr_spark.pipeline.catalog import iceberg_runtime_jars

    monkeypatch.delenv("OCR_SPARK_ICEBERG_JARS_DIR", raising=False)
    assert iceberg_runtime_jars() == []


def test_require_iceberg_raises_with_swap_instructions(monkeypatch):
    from ocr_spark.pipeline.catalog import IcebergUnavailable, require_iceberg

    monkeypatch.delenv("OCR_SPARK_ICEBERG_JARS_DIR", raising=False)
    with pytest.raises(IcebergUnavailable) as exc:
        require_iceberg()
    msg = str(exc.value)
    # the message must be a usable recipe, not just a refusal
    assert "--packages org.apache.iceberg:iceberg-spark-runtime" in msg
    assert "spark.sql.catalog.ocr=org.apache.iceberg.spark.SparkCatalog" in msg
    assert "warehouse" in msg
    assert "--catalog iceberg" in msg


def test_require_iceberg_passes_when_jar_staged(monkeypatch, tmp_path):
    from ocr_spark.pipeline.catalog import require_iceberg

    jar = tmp_path / "iceberg-spark-runtime-4.0_2.13-1.10.0.jar"
    jar.write_bytes(b"PK")  # detection is by name, same as Spark's classpath glob
    monkeypatch.setenv("OCR_SPARK_ICEBERG_JARS_DIR", str(tmp_path))
    assert str(jar) in require_iceberg()


def test_configure_iceberg_puts_staged_jars_on_the_classpath(monkeypatch, tmp_path):
    """A jar that passed the guard from a non-default location must reach
    spark.jars — otherwise the guard passes and the JVM still dies later
    with ClassNotFoundException."""
    from pyspark.sql import SparkSession

    from ocr_spark.pipeline.catalog import configure_iceberg

    b = SparkSession.builder
    jar = str(tmp_path / "iceberg-spark-runtime-4.0_2.13-1.10.0.jar")
    configure_iceberg(b, "file:///tmp/wh", "ocr", jars=[jar])
    opts = b._options
    assert opts["spark.jars"] == jar
    assert opts["spark.sql.catalog.ocr"] == "org.apache.iceberg.spark.SparkCatalog"
    assert opts["spark.sql.catalog.ocr.warehouse"] == "file:///tmp/wh"


def test_cli_catalog_iceberg_fails_fast(monkeypatch, tmp_path):
    """The CLI must raise the guard error before building any session (this
    test stays sub-second precisely because no JVM ever starts)."""
    from ocr_spark.cli import main
    from ocr_spark.pipeline.catalog import IcebergUnavailable

    monkeypatch.delenv("OCR_SPARK_ICEBERG_JARS_DIR", raising=False)
    with pytest.raises(IcebergUnavailable):
        main([
            "extract",
            "--input", str(tmp_path / "in"),
            "--output", str(tmp_path / "out"),
            "--catalog", "iceberg",
        ])
