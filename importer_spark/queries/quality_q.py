"""Declarative data-quality suite as a catalog query (SURVEY §5).

The reference's ~340 dbt schema tests each compile to their own SELECT; the
engine-level equivalent folds a whole suite into one scan (quality.py::
run_suite) and emits the dbt-test-run output shape. Running it as an
oracle-checked query proves the violation arithmetic itself.
"""

from __future__ import annotations

from importer_spark.io import Tables
from importer_spark.quality import run_suite
from importer_spark.queries.registry import query

_SUITE = [
    {"name": "orders_pk_not_null", "kind": "not_null", "col": "o_orderkey"},
    {"name": "orders_pk_unique", "kind": "unique", "col": "o_orderkey"},
    {
        "name": "orders_status_accepted",
        "kind": "accepted_values",
        "col": "o_orderstatus",
        "values": ["O", "F", "P"],
    },
    {
        "name": "orders_price_range",
        "kind": "accepted_range",
        "col": "o_totalprice",
        "lo": 0,
        "hi": 1_000_000,
    },
    {
        "name": "orders_priority_accepted",
        "kind": "accepted_values",
        "col": "o_orderpriority",
        "values": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
    },
    {
        "name": "orders_date_not_future_of_max",
        "kind": "expression",
        "expr": "o_orderdate IS NOT NULL",
    },
]

_SUITE_SQL = """
WITH agg AS (
  SELECT
    COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS c1,
    COUNT(*) - COUNT(DISTINCT o_orderkey) AS c2,
    COUNT(CASE WHEN o_orderstatus NOT IN ('O','F','P')
               OR o_orderstatus IS NULL THEN 1 END) AS c3,
    COUNT(CASE WHEN NOT (o_totalprice >= 0 AND o_totalprice <= 1000000)
               OR o_totalprice IS NULL THEN 1 END) AS c4,
    COUNT(CASE WHEN o_orderpriority NOT IN
               ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
               OR o_orderpriority IS NULL THEN 1 END) AS c5,
    COUNT(CASE WHEN NOT (o_orderdate IS NOT NULL) THEN 1 END) AS c6
  FROM orders
)
SELECT check_name, CAST(n AS BIGINT) AS n_violations, n = 0 AS passed
FROM agg, LATERAL (VALUES
  ('orders_pk_not_null', c1),
  ('orders_pk_unique', c2),
  ('orders_status_accepted', c3),
  ('orders_price_range', c4),
  ('orders_priority_accepted', c5),
  ('orders_date_not_future_of_max', c6)
) t(check_name, n)
"""


@query("dq_orders_suite", oracle=_SUITE_SQL)
def dq_orders_suite(spark, sf_dir):
    """Six dbt-style schema tests over orders evaluated in ONE aggregation
    (the oracle mirrors with a one-row agg + LATERAL VALUES unpivot). The
    physical plan is a single scan → partial/final agg → 6-row stack; the
    per-test-SELECT alternative is 6 scans — the gap the reference's 340
    tests would hit at 100 TB."""
    return run_suite(Tables(spark, sf_dir).orders, _SUITE)
