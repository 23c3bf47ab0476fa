"""Distributed global ranking — exact row_number / percent_rank / ntile over
a TOTAL order without the single-task global window.

``Window.orderBy(...)`` with no partition spec funnels every row through one
task (Spark even warns). That is fine on tiny aggregated relations (months,
priorities) but not on per-customer / per-company relations at 100 TB — and
the reference's health-score percentile (dim_company_health.sql:59) is
exactly that shape. The scalable form mirrors the distributed prefix-sum:

1. one IN-PLAN aggregation computes exact quantile cut points of the
   leading order column, broadcast as a one-row array (correctness never
   depends on the cuts — no driver action, the whole rank stays one lazy
   plan, and the exact percentile makes every plan branch see identical
   boundaries);
2. each row's bucket is a deterministic expression over that array, so
   every branch of the plan agrees;
3. a row_number window runs WITHIN each (parallel) bucket, while the
   per-bucket counts — n_buckets rows — go through a tiny sequential window
   to produce each bucket's global offset;
4. global rank = bucket offset + within-bucket rank; percent_rank and ntile
   are closed-form over (rank, total).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    first_col: str,
    order_cols: list[Column],
    out_col: str = "rn",
    n_buckets: int = 32,
    first_col_ascending: bool = True,
    with_count: bool = False,
) -> DataFrame:
    """Add exact global row_number ``out_col`` under ``order_cols`` (must be
    a total order; ``first_col`` is the leading NUMERIC order column used
    for value bucketing — rows tied on it share a bucket, so bucketing
    never splits an order-equivalence class across workers).
    ``first_col_ascending`` must match the sort direction of ``first_col``
    inside ``order_cols`` so bucket offsets accumulate in rank order.

    ``with_count=True`` additionally attaches ``_n`` (the total row count)
    derived from the SAME n_buckets-sized count relation that produces the
    offsets — a second tiny window over rows already in hand, instead of
    the separate full aggregation over ``df`` the r9 form paid (one fewer
    evaluation of the whole upstream per rank call — guide §2.4, don't
    recompute what a sibling branch already aggregated)."""
    qs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    # EXACT percentile, deliberately: the cuts subtree is evaluated by more
    # than one plan branch, and an approximate sketch whose merge is
    # order-sensitive could hand different branches different boundaries —
    # silent duplicate/skipped ranks. Exact percentile is a pure function
    # of the value multiset, so every evaluation agrees. (Cost is bounded
    # by first_col's value cardinality; ranking inputs are aggregated
    # relations. Pre-round first_col if cardinality is extreme.)
    cuts_df = df.agg(
        F.coalesce(
            F.array_sort(F.array_distinct(F.percentile(F.col(first_col), qs))),
            F.array().cast("array<double>"),
        ).alias("_cuts")
    )
    # bucket = how many cut points the value exceeds; the 31-element array
    # scan per row is trivia next to avoiding both a driver action and a
    # single-task window. NULL values get bucket -1: first under asc
    # (Spark sorts NULLS FIRST asc) and last under desc (NULLS LAST), which
    # is exactly where -1 falls in each traversal order.
    val = F.col(first_col)
    bucket = F.when(val.isNull(), F.lit(-1)).otherwise(
        F.size(F.filter("_cuts", lambda c: val > c))
    )
    w_in = Window.partitionBy("_gb").orderBy(*order_cols)
    gb_order = F.col("_gb").asc() if first_col_ascending else F.col("_gb").desc()
    w_off = (
        Window.orderBy(gb_order).rowsBetween(Window.unboundedPreceding, -1)
    )  # over n_buckets count rows only
    bucketed = (
        df.crossJoin(F.broadcast(cuts_df)).withColumn("_gb", bucket).drop("_cuts")
    )
    offs = (
        bucketed.groupBy("_gb")
        .agg(F.count("*").alias("_bn"))
        .withColumn("_goff", F.coalesce(F.sum("_bn").over(w_off), F.lit(0)))
    )
    if with_count:
        w_all = Window.orderBy(gb_order).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        offs = offs.withColumn("_n", F.sum("_bn").over(w_all))
    offs = offs.drop("_bn")
    return (
        bucketed.join(F.broadcast(offs), "_gb")
        .withColumn(out_col, F.row_number().over(w_in) + F.col("_goff"))
        .drop("_gb", "_goff")
    )


def grouped_row_number(
    df: DataFrame,
    part_cols: list[str],
    first_col: str,
    order_cols: list[Column],
    out_col: str = "rn",
    n_buckets: int = 32,
    first_col_ascending: bool = True,
    with_count: bool = False,
) -> DataFrame:
    """Partition-aware twin of ``global_row_number``: exact ROW_NUMBER()
    OVER (PARTITION BY part_cols ORDER BY order_cols) without funneling any
    one partition key through a single task — the dominant-group regime
    (one language is most of a corpus; one segment is most of a fact
    table), where ``Window.partitionBy(part_cols)`` is exactly as skewed as
    the data. Same three moves as the global form, each per key:

    1. per-key exact quantile cuts of ``first_col`` from ONE aggregation
       (keys × (n_buckets−1) doubles — broadcastable model state);
    2. each row's bucket is a deterministic expression over its key's cuts;
    3. row_number within (key, bucket) — n_buckets-way parallelism per
       key — plus a (key, bucket)-count window over keys × n_buckets rows
       to compute global offsets within each key.

    Rows tied on ``first_col`` share a bucket, so bucketing never splits an
    order-equivalence class; ``order_cols`` must still be a total order
    within each key for a deterministic result.

    Regime note: this operator is for FEW, HUGE groups (languages,
    regions, status codes) — the cuts/offset side relations are
    keys-sized and broadcast. For high-cardinality keys (per-customer,
    per-order) a plain ``Window.partitionBy`` is already parallel and
    cheaper; use it directly there."""
    if not part_cols:
        return global_row_number(
            df,
            first_col,
            order_cols,
            out_col,
            n_buckets,
            first_col_ascending,
            with_count=with_count,
        )
    qs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    cuts_df = df.groupBy(*part_cols).agg(
        F.coalesce(
            F.array_sort(F.array_distinct(F.percentile(F.col(first_col), qs))),
            F.array().cast("array<double>"),
        ).alias("_cuts")
    )
    val = F.col(first_col)
    bucket = F.when(val.isNull(), F.lit(-1)).otherwise(
        F.size(F.filter("_cuts", lambda c: val > c))
    )
    w_in = Window.partitionBy(*part_cols, "_gb").orderBy(*order_cols)
    gb_order = F.col("_gb").asc() if first_col_ascending else F.col("_gb").desc()
    w_off = Window.partitionBy(*part_cols).orderBy(gb_order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # SQL PARTITION BY treats NULL as its own (rankable) partition, and
    # groupBy above produces its row — but a plain equi-join would drop it
    # (NULL never equals NULL), silently deleting those rows from the
    # output. Join the side relations null-safely on renamed keys.
    bucketed = null_safe_key_join(df, F.broadcast(cuts_df), part_cols).withColumn(
        "_gb", bucket
    ).drop("_cuts")
    offs = (
        bucketed.groupBy(*part_cols, "_gb")
        .agg(F.count("*").alias("_bn"))
        .withColumn("_goff", F.coalesce(F.sum("_bn").over(w_off), F.lit(0)))
    )
    if with_count:
        # Per-key totals from the keys×buckets count rows already in hand
        # (see global_row_number): no separate full aggregation over df.
        offs = offs.withColumn(
            "_n", F.sum("_bn").over(Window.partitionBy(*part_cols))
        )
    offs = offs.drop("_bn")
    return (
        null_safe_key_join(bucketed, F.broadcast(offs), part_cols, extra=["_gb"])
        .withColumn(out_col, F.row_number().over(w_in) + F.col("_goff"))
        .drop("_gb", "_goff")
    )


def null_safe_key_join(
    left: DataFrame,
    right: DataFrame,
    part_cols: list[str],
    extra: list[str] | None = None,
) -> DataFrame:
    """Inner-join ``right`` onto ``left`` treating NULL key values as equal
    (the PARTITION BY convention): right-side key columns are renamed so
    the join condition can use eqNullSafe without ambiguity, then dropped.
    ``extra`` columns join with plain equality (never NULL here).

    Public because every per-key-broadcast operator that must not drop
    NULL-key rows shares it (grouped ranks here, tercile buckets in
    operators/text.py — r5 advice: a plain equi-join silently deletes
    NULL partition keys). eqNullSafe keys still hash-join: Catalyst
    rewrites ``a <=> b`` to coalesced equi-keys, so the broadcast plan
    shape is identical to the plain join it replaces."""
    renamed = right
    cond = F.lit(True)
    for i, c in enumerate(part_cols):
        renamed = renamed.withColumnRenamed(c, f"_rk{i}")
        cond = cond & F.col(c).eqNullSafe(F.col(f"_rk{i}"))
    for c in extra or []:
        renamed = renamed.withColumnRenamed(c, f"_rx_{c}")
        cond = cond & (F.col(c) == F.col(f"_rx_{c}"))
    out = left.join(renamed, cond)
    return out.drop(
        *[f"_rk{i}" for i in range(len(part_cols))],
        *[f"_rx_{c}" for c in (extra or [])],
    )


def with_grouped_rank_stats(
    df: DataFrame,
    part_cols: list[str],
    first_col: str,
    order_cols: list[Column],
    n_buckets: int = 32,
    first_col_ascending: bool = True,
    materialize: bool = False,
) -> DataFrame:
    """(df + _rn + _n) per partition key: grouped row_number plus each
    key's row count — feed ``percent_rank_col()`` / ``ntile_col(k)`` for
    partitioned PERCENT_RANK / NTILE at dominant-group scale.

    ``_n`` rides the offsets relation (``with_count=True``) instead of a
    separate count aggregation + rejoin — two fewer evaluations of ``df``
    than the r9 form (the totals pass and its null-safe join are gone).
    ``materialize=True`` additionally localCheckpoints ``df`` first
    (eager, graph.py convention): the remaining plan branches — quantile
    cuts, the bucketed main pass, the per-bucket counts — then read one
    materialized relation instead of each recomputing the upstream
    pipeline (guide §3.3: materialize an intermediate that many branches
    share). Opt in when ``df`` is more than a trivial scan; ranking
    inputs are aggregated relations, so the checkpoint is
    decision-table-sized, never raw-fact-sized."""
    if materialize:
        df = df.localCheckpoint(eager=True)
    return grouped_row_number(
        df,
        part_cols,
        first_col,
        order_cols,
        out_col="_rn",
        n_buckets=n_buckets,
        first_col_ascending=first_col_ascending,
        with_count=True,
    )


def with_global_rank_stats(
    df: DataFrame,
    first_col: str,
    order_cols: list[Column],
    n_buckets: int = 32,
    first_col_ascending: bool = True,
    materialize: bool = False,
) -> DataFrame:
    """(df + _rn + _n): global row_number plus the total row count (in-plan
    broadcast, no extra action) — the ingredients for percent_rank
    ((rn−1)/(n−1)) and ntile (floor(k·(rn−1)/n)+1, the closed form of SQL
    NTILE's uneven-bucket rule). ``_n`` and ``materialize`` as in
    :func:`with_grouped_rank_stats` — the count rides the offsets
    relation, and the eager checkpoint collapses the remaining branch
    recomputation when the upstream is worth materializing."""
    if materialize:
        df = df.localCheckpoint(eager=True)
    return global_row_number(
        df,
        first_col,
        order_cols,
        out_col="_rn",
        n_buckets=n_buckets,
        first_col_ascending=first_col_ascending,
        with_count=True,
    )


def percent_rank_col() -> Column:
    """percent_rank from with_global_rank_stats columns. SQL PERCENT_RANK
    of a single-row relation is 0.0, not 0/0 → NULL."""
    return F.when(
        F.col("_n") > 1,
        (F.col("_rn") - 1).cast("double") / (F.col("_n") - 1).cast("double"),
    ).otherwise(F.lit(0.0))


def ntile_col(k: int) -> Column:
    """SQL NTILE(k) from with_global_rank_stats columns — exact closed form
    of the uneven-bucket rule: with q = n div k and r = n mod k, the first
    r buckets hold q+1 rows and the rest hold q."""
    rn, n = F.col("_rn"), F.col("_n")
    q = F.floor(n / k)
    r = n % k
    thr = r * (q + 1)  # rows living in the size-(q+1) buckets
    q_safe = F.greatest(q, F.lit(1))  # q=0 ⇒ every row is below thr
    return (
        F.when(rn <= thr, F.floor((rn - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((rn - 1 - thr) / q_safe) + 1)
        .cast("int")
    )
