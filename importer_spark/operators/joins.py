"""Composite join operators vanilla Spark SQL lacks (SURVEY §2.4 J8-J10).

The reference implements both patterns as correlated scalar subqueries
(fct_product_pricing_history.sql:305-314, fct_trade_show_leads.sql:106-169) —
one extra scan per metric. These rewrites are single-pass and shuffle once on
the join key, which is the difference between "works" and "works at 100 TB".
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: Column | None = None,
    keep_match_ts: bool = False,
) -> DataFrame:
    """As-of join: for every left row, attach the nearest right row within
    the same ``on`` key group — the most recent with ``right_ts <= left_ts``
    (``direction="backward"``, default) or the earliest with ``right_ts >=
    left_ts`` (``direction="forward"``). ``tolerance`` (a Column — e.g.
    ``F.expr("INTERVAL 1 HOUR")`` for timestamps, a numeric literal for
    numeric axes) bounds the match distance: matches farther than the
    tolerance come back null, exactly pandas ``merge_asof`` semantics.

    Implementation is the union-and-fill pattern (reference J8 rewritten):
    tag both sides, union, and carry each right value forward with
    ``last(ignorenulls=True)`` over (key, ts) order — traversed descending
    for forward matches. Exactly ONE shuffle on the key — no join explosion,
    no per-row subquery — and the in-partition sort is linear. Equal
    timestamps match in both directions (right sorts before left at ties).

    Returns the left rows with ``<col><suffix>`` columns appended (plus
    ``<left_ts>`` preserved); right-side misses are null, like a LEFT join.
    With ``keep_match_ts=True`` the matched right timestamp is also kept as
    ``_asof_match_ts<suffix>`` — THE documented way to distinguish "matched
    a version whose value is NULL" from "no match" (non-null exactly when a
    right row matched). Callers must not filter on that column without
    requesting it: it only resolves through Spark's ResolveMissingReferences
    analyzer rule, which any intervening select/cache silently breaks
    (r5 advice, pricing.point_in_time_price).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    tag = "_asof_side"
    ts = "_asof_ts"
    mts = f"_asof_match_ts{suffix}"
    lcols = left.columns
    lhs = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias(ts),
        F.lit(1).alias(tag),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in right_value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(mts),
    )
    rhs = right.filter(
        # a right row with a NULL timestamp has no position on the as-of
        # axis and must never match (pandas merge_asof rejects such keys
        # outright); admitting it would also make it sort before every
        # left row and pollute early fills
        F.col(right_ts).isNotNull()
    ).select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        *[F.col(c) for c in on],
        F.col(right_ts).alias(ts),
        F.lit(0).alias(tag),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
        F.col(right_ts).alias(mts),
    )
    unioned = lhs.unionByName(rhs)
    # Tie-break on the carried right values so two right rows sharing
    # (key, ts) resolve identically on every run (determinism convention);
    # for non-orderable value types, pre-dedup the right side instead.
    tiebreaks = [F.col(f"{c}{suffix}").asc_nulls_first() for c in right_value_cols]
    order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(order, F.col(tag).asc(), *tiebreaks)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill_cols = [*[f"{c}{suffix}" for c in right_value_cols], mts]
    # Carry the latest right ROW as one struct (non-null exactly when the
    # frame holds a right row), then unpack: per-column
    # last(ignorenulls=True) would SKIP a version whose value is NULL and
    # resurrect an older version's value — the fuzz gate caught exactly
    # that (a null-price version must match as null, not fall through).
    row_struct = F.when(
        F.col(tag) == 0, F.struct(*[F.col(c) for c in fill_cols])
    )
    filled = unioned.select(
        *[F.col(c) for c in lcols],
        F.col(ts),
        F.col(tag),
        F.last(row_struct, ignorenulls=True).over(w).alias("_asof_row"),
    ).select(
        *[F.col(c) for c in lcols],
        F.col(ts),
        F.col(tag),
        *[F.col(f"_asof_row.{c}").alias(c) for c in fill_cols],
    )
    out = filled.filter(F.col(tag) == 1)
    if tolerance is not None:
        dist = (
            F.col(ts) - F.col(mts)
            if direction == "backward"
            else F.col(mts) - F.col(ts)
        )
        in_tol = F.col(mts).isNotNull() & (dist <= tolerance)
        out = out.select(
            *[F.col(c) for c in lcols],
            F.col(ts),
            F.col(tag),
            *[
                F.when(in_tol, F.col(c)).alias(c)
                for c in fill_cols
            ],
        )
    return out.drop(tag, ts) if keep_match_ts else out.drop(tag, ts, mts)


def range_attribution(
    leads: DataFrame,
    facts: DataFrame,
    on: list[str],
    lead_ts: str,
    fact_ts: str,
    windows_days: list[int],
    metrics: dict[str, "Callable[[Column], Column]"],
    lead_cols: list[str] | None = None,
) -> DataFrame:
    """Range-window attribution: for each lead row, aggregate fact rows with
    ``lead_ts <= fact_ts <= lead_ts + N days`` for every N in
    ``windows_days``, in ONE pass (reference J9: the reference runs 8
    correlated scans; this is one equi-join on ``on`` + conditional aggs).

    ``metrics`` maps metric name → ``lambda cond: <aggregate Column>`` where
    the lambda masks its input with ``F.when(cond, ...)``; inside the lambda
    the fact timestamp is addressable as ``_fact_ts`` and fact value columns
    keep their own names. Each metric is emitted per window as
    ``<name>_<N>d`` plus ``<name>_all`` for the unbounded forward window. Facts outside every window contribute nothing
    but still flow through the join — at scale, pre-filter facts to the max
    window before calling if the fact table is much larger than the match.
    """
    lead_cols = lead_cols or [c for c in leads.columns if c not in on and c != lead_ts]
    l = leads.select(*on, F.col(lead_ts).alias("_lead_ts"), *lead_cols)
    f = facts.select(*on, F.col(fact_ts).alias("_fact_ts"), *[
        c for c in facts.columns if c not in on and c != fact_ts
    ])
    joined = l.join(f, on=on, how="left").withColumn(
        "_in_scope", F.col("_fact_ts").isNotNull() & (F.col("_fact_ts") >= F.col("_lead_ts"))
    )
    aggs = []
    for name, make in metrics.items():
        for n in windows_days:
            cond = F.col("_in_scope") & (
                F.col("_fact_ts") <= F.col("_lead_ts") + F.expr(f"INTERVAL {n} DAYS")
            )
            aggs.append(make(cond).alias(f"{name}_{n}d"))
        aggs.append(make(F.col("_in_scope")).alias(f"{name}_all"))
    return joined.groupBy(*on, "_lead_ts", *lead_cols).agg(*aggs).withColumnRenamed(
        "_lead_ts", lead_ts
    )
