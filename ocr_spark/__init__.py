"""ocr_spark — PySpark-native main-content extraction engine.

A from-scratch reimplementation of the query/data-processing capabilities of
terifan/OCR (reference at /root/reference, public domain) as an idiomatic
PySpark pipeline: text spans go through a vectorized boilerplate stripper,
media spans through a NumPy curvature-feature OCR kernel that is bit-exact
with the reference engine (verified against compiled-reference goldens in
tests/goldens/).

Layout:
  kernel/    pure-NumPy reimplementation of the OCR engine (no Spark deps)
  html/      boilerplate stripper for text spans (new design, north-rule)
  functions/ column-level text analytics + similarity/dedup primitives
  pipeline/  the Spark job: explode -> route -> pandas UDFs -> reassemble
  sources/   I/O helpers (parquet now; Iceberg-shaped writer interface)
"""

__version__ = "0.1.0"
