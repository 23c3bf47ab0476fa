"""Recursive CTE (Spark 4 WITH RECURSIVE) — hierarchy walking in pure SQL.

The reference's company consolidation is conceptually a hierarchy collapse
(variant records → canonical parent; reference: README.md customer→company
consolidation); near_dup_clusters solved the general fixpoint with an
iterative DataFrame loop. This query is the SQL-native form now that Spark
executes recursive CTEs: the SAME statement text runs unchanged on Spark
and DuckDB — the strongest possible parity check (one source of truth, two
engines).
"""

from __future__ import annotations

from importer_spark.io import Tables
from importer_spark.queries.registry import query

# A deterministic synthetic hierarchy over customers: parent(id) = ⌊id/10⌋,
# so every customer chains to root 0 in ≤ ⌈log10(max id)⌉ steps.
_HIERARCHY_SQL = """
WITH RECURSIVE walk AS (
  SELECT c_custkey AS cust_key, c_custkey AS node, 0 AS depth
  FROM customer
  UNION ALL
  SELECT cust_key, CAST(FLOOR(node / 10.0) AS BIGINT) AS node, depth + 1
  FROM walk WHERE node > 0
)
SELECT cust_key,
  CAST(MAX(depth) AS INTEGER) AS depth_to_root,
  CAST(COUNT(*) AS BIGINT) AS chain_length
FROM walk GROUP BY cust_key
"""


@query("customer_hierarchy_depth", oracle=_HIERARCHY_SQL)
def customer_hierarchy_depth(spark, sf_dir):
    """Depth-to-root over a parent = ⌊id/10⌋ hierarchy via WITH RECURSIVE —
    identical SQL text on both engines. Each recursion level is one
    self-referential step Spark plans as an iterative union (rows stop
    expanding at the root guard), so total work is O(rows × depth), and
    depth is logarithmic here. For unbounded/deep graphs prefer the
    checkpointed DataFrame loop (near_dup_clusters) — recursion depth is a
    config-bounded resource.

    Spark guards recursive CTEs with TWO limits: a level limit (100, kept —
    this walk needs ⌈log10(max key)⌉ ≤ 20 levels for any BIGINT key) and a
    total-row limit (default 1e6, which a 150k-customer input legitimately
    exceeds: total rows = n × depth, linear in data — hit at the sf1 gate).
    The row limit is lifted here because the level limit already bounds the
    work to n × 100; a true runaway still terminates."""
    spark.conf.set("spark.sql.cteRecursionRowLimit", "-1")
    Tables(spark, sf_dir).customer.createOrReplaceTempView("customer")
    return spark.sql(_HIERARCHY_SQL)
