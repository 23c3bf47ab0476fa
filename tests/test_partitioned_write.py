"""Partitioned parquet sink + partition pruning on readback.

At 100 TB the difference between a pruned and unpruned scan is the whole
job; this pins the behavior locally: a month-partitioned write must produce
hive-style directories, and a month filter on readback must show up in the
scan's PartitionFilters (zero data files from other months read).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from importer_spark.io import Tables, write_replace
from tests.conftest import SF_DIR


def test_partitioned_write_and_pruned_read(spark, tmp_path):
    orders = Tables(spark, SF_DIR).orders.withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    path = str(tmp_path / "orders_by_month")
    write_replace(orders, path, partition_by=["order_month"])

    # Hive-style layout: one directory per month.
    dirs = [p.name for p in (tmp_path / "orders_by_month").iterdir() if p.is_dir()]
    assert dirs and all(d.startswith("order_month=") for d in dirs)

    back = spark.read.parquet(path)
    one_month = sorted(d.split("=")[1] for d in dirs)[0]
    q = back.filter(F.col("order_month") == one_month)
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:200]
    assert "order_month" in seg, plan

    # And the pruned read returns exactly that month's rows.
    expect = orders.filter(F.col("order_month") == one_month).count()
    assert q.count() == expect > 0


def test_partitioned_append_adds_partition(spark, tmp_path):
    from importer_spark.io import write_append

    df1 = spark.createDataFrame([(1, "2026-01")], "id long, m string")
    df2 = spark.createDataFrame([(2, "2026-02")], "id long, m string")
    path = str(tmp_path / "t")
    write_append(df1, path, partition_by=["m"])
    write_append(df2, path, partition_by=["m"])
    back = spark.read.parquet(path)
    assert back.count() == 2
    assert {r["m"] for r in back.select("m").collect()} == {"2026-01", "2026-02"}


def test_write_sorted_produces_skippable_stats(spark, tmp_path):
    """The range-sorted layout must yield near-disjoint per-file min/max
    stats on the clustering column (that is what lets parquet readers skip
    files/row groups on a pushed-down range predicate)."""
    import pyarrow.parquet as pq
    from importer_spark.io import Tables, write_sorted

    t = Tables(spark, SF_DIR)
    path = str(tmp_path / "orders_sorted")
    write_sorted(t.orders.select("o_orderkey", "o_orderdate", "o_totalprice"),
                 path, range_col="o_orderdate", n_files=6)

    spans = []
    for f in sorted((tmp_path / "orders_sorted").glob("*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == "o_orderdate" and col.statistics:
                    s = col.statistics
                    lo = s.min if lo is None or s.min < lo else lo
                    hi = s.max if hi is None or s.max > hi else hi
        assert lo is not None, f
        spans.append((lo, hi))
    assert len(spans) >= 4
    # files ordered by range must not overlap beyond boundary duplicates
    spans.sort()
    overlaps = sum(1 for a, b in zip(spans, spans[1:]) if b[0] < a[1])
    assert overlaps == 0, spans
    # and the whole dataset round-trips
    assert spark.read.parquet(path).count() == t.orders.count()


def test_write_zorder_tightens_stats_on_both_dims(spark, tmp_path):
    """Z-order must give tight per-file min/max on BOTH clustered columns;
    the single-axis sort baseline leaves the second column's per-file span
    at ~full range. Spans are measured as the mean fraction of the global
    range covered per file."""
    import pyarrow.parquet as pq
    from importer_spark.io import Tables, write_sorted, write_zorder

    t = Tables(spark, SF_DIR)
    df = t.orders.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("order_day"),
        F.col("o_totalprice"),
    )

    def mean_span(path, col):
        lo_all, hi_all, spans = None, None, []
        for f in sorted(path.glob("*.parquet")):
            md = pq.ParquetFile(str(f)).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics:
                        s = c.statistics
                        lo = s.min if lo is None or s.min < lo else lo
                        hi = s.max if hi is None or s.max > hi else hi
            assert lo is not None, f
            spans.append((lo, hi))
            lo_all = lo if lo_all is None or lo < lo_all else lo_all
            hi_all = hi if hi_all is None or hi > hi_all else hi_all
        full = float(hi_all - lo_all)
        return sum((b - a) / full for a, b in spans) / len(spans)

    zpath = tmp_path / "orders_z"
    write_zorder(df, str(zpath), ["order_day", "o_totalprice"], bits=10, n_files=16)
    spath = tmp_path / "orders_s"
    write_sorted(df, str(spath), range_col="order_day", n_files=16)

    # both dims tighter than 60% of range under z-order...
    assert mean_span(zpath, "order_day") < 0.6
    assert mean_span(zpath, "o_totalprice") < 0.6
    # ...while the single-axis layout leaves the other dim near-full-range
    assert mean_span(spath, "o_totalprice") > 0.8
    assert spark.read.parquet(str(zpath)).count() == df.count()


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """Dynamic partition pruning: a fact partitioned on a join key must be
    pruned at RUNTIME by a filter that lives on the dimension side — the
    scan's PartitionFilters gains a dynamicpruning subquery instead of
    reading every partition and discarding rows post-join. At 100 TB this
    is the difference between scanning one region's files and scanning the
    world; the plan assertion pins that the pattern actually triggers on
    our partitioned-sink layout."""
    t = Tables(spark, SF_DIR)
    fact = t.customer.join(
        t.nation.select("n_nationkey", "n_name"),
        t.customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "c_acctbal", "n_nationkey")
    path = str(tmp_path / "cust_by_nation")
    write_replace(fact, path, partition_by=["n_nationkey"])

    back = spark.read.parquet(path)
    dim = t.nation.filter(F.col("n_name") == "NATION_3").select("n_nationkey")
    joined = back.join(dim, "n_nationkey")
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruning" in plan.lower(), plan
    # Result parity with the unpartitioned formulation.
    expect = fact.join(dim, "n_nationkey").count()
    assert joined.count() == expect > 0
