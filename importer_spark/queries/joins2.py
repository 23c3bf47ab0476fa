"""Semi/anti joins and exact interpolated percentiles.

EXISTS / NOT EXISTS subqueries are everywhere in the reference's dbt tests
(orphan-key checks — reference: models/staging/schema.yml relationship tests,
tests/*.sql singular tests assert "no rows where child has no parent");
Spark's LEFT SEMI / LEFT ANTI joins are the engine-level form: the build side
deduplicates on the join key, no row multiplication, and the probe stops at
first match.

Percentiles: the reference's dashboard candidates aggregate spend
distributions (reference: DBT_CANDIDATES.md:122 mart_product_company_period_
spending); `F.percentile` is the exact type-7 interpolated quantile matching
DuckDB/Postgres `quantile_cont`/`percentile_cont`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from importer_spark.functions import dec
from importer_spark.io import Tables
from importer_spark.queries.registry import query

_ANTI_SQL = """
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
"""


@query("customers_without_orders", oracle=_ANTI_SQL)
def customers_without_orders(spark, sf_dir):
    """NOT EXISTS as a LEFT ANTI join (customers with no urgent order). The
    probe side streams; the build side carries only the join key after the
    pushed priority filter (Catalyst prunes every other orders column), so
    at 100 TB this is a filtered key-only shuffle, not an orders-table
    shuffle."""
    t = Tables(spark, sf_dir)
    urgent = t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return t.customer.join(
        urgent, t.customer.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


_SEMI_SQL = """
SELECT p.p_partkey, p.p_name, p.p_retailprice
FROM part p
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey AND l.l_returnflag = 'R'
)
"""


@query("parts_with_returns", oracle=_SEMI_SQL)
def parts_with_returns(spark, sf_dir):
    """EXISTS as a LEFT SEMI join against a filtered fact: the returnflag
    predicate pushes into the parquet scan BEFORE the join, so the semi
    join's build side is only the returned lineitems' keys."""
    t = Tables(spark, sf_dir)
    returned = t.lineitem.filter(F.col("l_returnflag") == "R")
    return t.part.join(
        returned, t.part.p_partkey == returned.l_partkey, "left_semi"
    ).select("p_partkey", "p_name", "p_retailprice")


# Percentiles run on integer CENTS: interpolation lands on exact .25-multiples
# of an integer, which are binary-exact doubles — bitwise identical across
# engines (interpolating raw 2dp doubles would accumulate engine-specific
# rounding; see functions/core.py conventions).
_PCTL_SQL = """
WITH o AS (
  SELECT o_orderpriority AS priority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
SELECT priority,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  quantile_cont(cents, 0.25) / 100.0 AS p25,
  quantile_cont(cents, 0.50) / 100.0 AS median,
  quantile_cont(cents, 0.75) / 100.0 AS p75,
  CAST(MAX(cents) - MIN(cents) AS BIGINT) AS range_cents
FROM o GROUP BY priority
"""


@query("order_value_percentiles", oracle=_PCTL_SQL)
def order_value_percentiles(spark, sf_dir):
    """Exact interpolated quartiles of order value per priority class.
    `F.percentile` ≡ DuckDB `quantile_cont` ≡ Postgres `percentile_cont`
    (type-7: pos = p·(n−1), linear interpolation). Exact percentiles require
    a per-group sort — at 100 TB prefer `approx_percentile` (t-digest,
    mergeable map-side) unless the exact value is contractual."""
    t = Tables(spark, sf_dir)
    o = t.orders.select(
        F.col("o_orderpriority").alias("priority"),
        (dec(F.col("o_totalprice")) * 100).cast("bigint").alias("cents"),
    )
    return o.groupBy("priority").agg(
        F.count("*").alias("n_orders"),
        (F.percentile("cents", F.lit(0.25)) / 100.0).alias("p25"),
        (F.percentile("cents", F.lit(0.50)) / 100.0).alias("median"),
        (F.percentile("cents", F.lit(0.75)) / 100.0).alias("p75"),
        (F.max("cents") - F.min("cents")).cast("bigint").alias("range_cents"),
    )


_SALTED_SQL = """
SELECT c.c_mktsegment,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


@query("salted_segment_revenue", oracle=_SALTED_SQL)
def salted_segment_revenue(spark, sf_dir):
    """J11 as a catalog query: the fact side is salted into 16 sub-keys and
    the dimension replicated per bucket (operators/skew.py::salted_join), so
    one hot customer key spreads over 16 tasks. The oracle is the PLAIN
    join+agg — value equality proves salting is semantics-preserving, which
    is the entire point of the technique. Exact decimal sums make the
    result independent of how rows land in salt buckets."""
    from importer_spark.functions import dec, out_double
    from importer_spark.operators.skew import salted_join

    t = Tables(spark, sf_dir)
    joined = salted_join(
        t.orders.select(
            F.col("o_custkey").alias("cust_key"), F.col("o_totalprice")
        ),
        t.customer.select(
            F.col("c_custkey").alias("cust_key"), F.col("c_mktsegment")
        ),
        on=["cust_key"],
        how="inner",
        salt_buckets=16,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        out_double(F.sum(dec(F.col("o_totalprice")))).alias("revenue"),
    )


_BLOOM_SQL = """
SELECT o.o_orderpriority AS priority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 9000
GROUP BY o.o_orderpriority
"""


@query("bloom_pruned_revenue", oracle=_BLOOM_SQL)
def bloom_pruned_revenue(spark, sf_dir):
    """Selective dim→fact join with a Bloom pre-filter pushed into the fact
    scan (`operators/bloom.py`): the high-balance BUILDING customers build
    a distributed Bloom filter (driver holds n_bits/64 longs, never keys),
    and the orders scan drops non-matching custkeys inside WholeStageCodegen
    BEFORE the join's exchange — at 100 TB this is the difference between
    shuffling the whole fact table and shuffling the ~matching slice. The
    real join still runs (false positives die there), so the result is
    exactly the oracle's plain join."""
    from importer_spark.functions import dec, out_double
    from importer_spark.operators.bloom import bloom_semi_join

    t = Tables(spark, sf_dir)
    dim = t.customer.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000)
    ).select("c_custkey")
    joined = bloom_semi_join(
        t.orders.select("o_custkey", "o_orderpriority", "o_totalprice"),
        dim,
        fact_key="o_custkey",
        build_key="c_custkey",
        n_bits=1 << 14,
    )
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n_orders"),
        out_double(F.sum(dec(F.col("o_totalprice")))).alias("revenue"),
    )
