"""Preloading Python worker daemon (``spark.python.daemon.module``).

PySpark's daemon forks one worker process per task slot; each fork pays the
pandas/numpy/pyarrow import tax (~1.5 s) on first UDF use. With dozens of
task slots that is minutes of aggregate CPU per executor spent importing —
a fixed cost that grows with parallelism and caps scaling efficiency.

Importing the heavy modules HERE, before ``pyspark.daemon`` starts forking,
makes every worker inherit the warm modules copy-on-write: worker startup
drops to fork latency. The imports are defensive so a worker environment
without the repo on PYTHONPATH still comes up (it just loses the preload).
"""

for _mod in (
    "numpy",
    "pandas",
    "pyarrow",
    "pyspark.sql.pandas.serializers",
    "ocr_spark.html.strip",
    "ocr_spark.kernel.engine",
    "ocr_spark.functions.multimodal",
):
    try:
        __import__(_mod)
    except Exception:
        pass

if __name__ == "__main__":
    from pyspark.daemon import manager

    manager()
