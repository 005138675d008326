"""Pure-NumPy OCR kernel, bit-exact with the reference engine.

No Spark imports here — the pipeline wraps these in pandas/Arrow UDFs.
Parity is enforced by tests/goldens/ (dumps from the compiled reference).
"""
