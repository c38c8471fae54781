"""miru_spark: a PySpark-native inverted-index + BM25 analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference engine (KevinCorcor/miru) on idiomatic Spark: DataFrame/SQL plans
with Arrow-batched NumPy kernels for the posting-list hot path. See
SURVEY.md for the capability map and file:line parity citations.
"""

__version__ = "0.1.0"
