"""importer_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ELT stack (asphaltanchors/importer: dlt + dbt + Postgres), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, with a small
library of column helpers and distributed operators for the pieces vanilla Spark
lacks (as-of joins, range attribution, deterministic aggs, dedup/similarity at
LLM-pipeline scale).

Layout:
  session.py    — SparkSession factory (AQE, broadcast, UTC) + deterministic clock
  io.py         — readers (parquet/json), writers (overwrite/append/merge-by-key)
  functions/    — column-expression library (the Spark analog of dbt macros)
  operators/    — composite operators: asof/range joins, dedup, similarity, text
  queries/      — the oracle-checked query catalog (drives __spark_entry__.py)
  streaming/    — Structured Streaming wrappers for the incremental patterns
  quality.py    — assertion checks (unique / not_null / accepted_values / reconcile)
"""

__version__ = "0.1.0"
