"""Large-scale training-data pipeline operators (beyond-reference surface).

All operators are designed for 100 TB scale: no driver-side materialization,
JVM-side expressions (whole-stage codegen) on the hot path, Arrow-batched
Pandas UDFs only where built-ins can't express the semantics, and candidate
generation (LSH banding / bucketing) instead of all-pairs comparisons.
"""
