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
    metrics: dict[str, tuple],
    lead_cols: list[str] | None = None,
) -> DataFrame:
    """Range-window attribution: for each lead row, aggregate fact rows with
    ``lead_ts <= fact_ts <= lead_ts + N days`` for every N in
    ``windows_days`` plus the unbounded forward window (reference J9/J10:
    the reference runs 8 correlated scans + a correlated COUNT DISTINCT;
    emitted here as ``<name>_<N>d`` / ``<name>_all``).

    ``metrics`` maps output name → spec tuple:
      - ``("count",)``          — fact rows in the window (BIGINT);
      - ``("sum_dec2_double", col)`` — exact DECIMAL(18,2) sum of ``col``
        over the window, 0 when empty, emitted as DOUBLE (the house
        money convention);
      - ``("distinct_dates",)`` — distinct calendar dates (UTC) among the
        window's facts (BIGINT).

    Scale shape — PREFIX SUMS over a probe-injected timeline, NOT a
    lead×fact join (r8 skew gate: the former equi-join + conditional-agg
    formulation is O(leads_per_key × facts_per_key); one hot key holding
    half the events — the default-account pathology SURVEY §2 J11 flags —
    made it ~10¹⁰ joined rows and AQE skew splitting cannot help a
    BROADCAST join. Measured: the sf1 skew gate ground >20 min on one
    query before the rewrite; the oracle keeps the definitional join
    formulation, so parity certifies the rewrite). Every trailing-window
    aggregate is a difference of two running totals, so the per-key cost
    is SORT + ONE LINEAR PASS regardless of how many leads and facts share
    the key:

      * the fact stream, per-(key, date) day rows (at the day's first fact
        ts), one START probe per lead (at t) and one END probe per window
        (at t + N days) union into one timeline; kind orders probes around
        equal-timestamp facts so both closed bounds (fact_ts >= t,
        fact_ts <= t+N) are exact;
      * ONE running window (ROWS UNBOUNDED PRECEDING — the incremental
        frame; sliding RANGE frames re-aggregate per row and would be
        quadratic again) accumulates count / decimal sum / distinct-date
        count, read off at the probes; windowed metric = end − start.
      * COUNT DISTINCT dates decomposes with a one-day boundary
        correction: dates strictly after day(t) count iff they appear in
        the running day-count; day(t) itself counts iff it has a fact at
        or after t but its first fact precedes t (+1 via a 1:1 join to
        the daily relation — no fan-out). ``_all`` metrics are per-key
        totals minus the start prefix.

    Exactly the old contract: leads with no facts get 0s (LEFT join
    semantics); leads with a NULL ``lead_ts`` get 0s too (the definitional
    correlated join's ``fact_ts >= lead_ts`` predicate is NULL for them —
    never true; without the explicit guard the ``_all`` totals would leak
    through because a NULL probe's prefix is 0 — r8 advice); duplicate
    lead rows collapse (the final groupBy keys on (on, lead_ts,
    lead_cols) like the old aggregation did); DECIMAL sums stay exact
    until the final double cast.
    """
    if not metrics:
        raise ValueError("range_attribution: metrics must be non-empty")
    for name, spec in metrics.items():
        if spec[0] not in ("count", "sum_dec2_double", "distinct_dates"):
            raise ValueError(f"range_attribution: unknown metric spec {spec!r}")
    # N = 0 would break the distinct_dates one-day boundary correction
    # (the _d_last >= _plt test admits day-of-lead facts AFTER t+0) — the
    # prefix-sum formulation is only exact for windows of >= 1 day (r8
    # advice; the definitional join handled 0 incidentally).
    if any(int(n) < 1 for n in windows_days):
        raise ValueError(
            f"range_attribution: windows_days entries must be >= 1, got {windows_days}"
        )
    lead_cols = lead_cols or [c for c in leads.columns if c not in on and c != lead_ts]
    dec2 = "decimal(18,2)"
    sum_cols = [spec[1] for spec in metrics.values() if spec[0] == "sum_dec2_double"]
    need_days = any(spec[0] == "distinct_dates" for spec in metrics.values())

    l = leads.select(*on, F.col(lead_ts).alias("_lt"), *lead_cols)
    # NULL-key facts can never match an equi-join condition (the semantics
    # this operator re-expresses); without this filter the window
    # PARTITION would group them with NULL-key leads.
    f = facts.select(*on, F.col(fact_ts).alias("_fts"), *sum_cols)
    for k in on:
        f = f.filter(F.col(k).isNotNull())

    def _zero_rev(c):
        return F.lit(0).cast(dec2).alias(f"_w_{c}")

    rev_w = [F.col(c).cast(dec2).alias(f"_w_{c}") for c in sum_cols]
    rev_z = [_zero_rev(c) for c in sum_cols]
    null_leads = [F.lit(None).cast(l.schema["_lt"].dataType).alias("_plt")] + [
        F.lit(None).cast(l.schema[c].dataType).alias(f"_pl_{c}") for c in lead_cols
    ]
    probe_leads = [F.col("_lt").alias("_plt")] + [
        F.col(c).alias(f"_pl_{c}") for c in lead_cols
    ]

    # kind 0 = start probe, 1 = facts + day rows, 2 = end probes: at equal
    # timestamps a start probe sorts BEFORE the facts (ts == t is IN the
    # window) and an end probe AFTER them (ts == t + N is IN the window).
    parts = [
        f.select(
            *on,
            F.col("_fts").alias("_ts"),
            F.lit(1).alias("_kind"),
            F.lit(1).alias("_w_cnt"),
            *rev_w,
            F.lit(0).alias("_w_day"),
            *null_leads,
            F.lit(None).cast("string").alias("_wtag"),
        )
    ]
    daily = None
    if need_days:
        daily = f.groupBy(*on, F.to_date("_fts").alias("_d")).agg(
            F.min("_fts").alias("_d_first"), F.max("_fts").alias("_d_last")
        )
        parts.append(
            daily.select(
                *on,
                F.col("_d_first").alias("_ts"),
                F.lit(1).alias("_kind"),
                F.lit(0).alias("_w_cnt"),
                *rev_z,
                F.lit(1).alias("_w_day"),
                *null_leads,
                F.lit(None).cast("string").alias("_wtag"),
            )
        )
    probe_zero = [
        F.lit(0).alias("_w_cnt"),
        *rev_z,
        F.lit(0).alias("_w_day"),
    ]
    parts.append(
        l.select(
            *on,
            F.col("_lt").alias("_ts"),
            F.lit(0).alias("_kind"),
            *probe_zero,
            *probe_leads,
            F.lit("s").alias("_wtag"),
        )
    )
    for n in windows_days:
        parts.append(
            l.select(
                *on,
                (F.col("_lt") + F.expr(f"INTERVAL {int(n)} DAYS")).alias("_ts"),
                F.lit(2).alias("_kind"),
                *probe_zero,
                *probe_leads,
                F.lit(str(int(n))).alias("_wtag"),
            )
        )
    stream = parts[0]
    for p in parts[1:]:
        stream = stream.unionByName(p)

    # HIERARCHICAL prefix sums (r8 verdict #7): a per-key running window
    # is linear but ONE TASK per key — a key holding half of a 100 TB
    # corpus is one arbitrarily long task. Two levels, both ROWS-frame
    # running windows (the only incremental frame):
    #
    #   level 1 (heavy, parallel): the timeline windows by (key, DAY) —
    #   calendar day is monotone in _ts, so equal timestamps never
    #   straddle segments — giving each probe its IN-DAY prefix. The
    #   longest task is now bounded by the hottest key's hottest day.
    #
    #   level 2 (light): the CARRY — everything before the probe's day —
    #   changes only at day granularity, so it is a running window over
    #   per-(key, day) FACT partials (aggregated straight from the fact
    #   stream: probes and day rows contribute zero/derived weights)
    #   unioned with the probe rows; per-key tasks are leads+days-sized,
    #   facts no longer appear. Day partials of the probe's OWN day sort
    #   after the probe (kind 1 > 0) and stay out of its carry.
    #
    #   global prefix at a probe = level-2 carry + level-1 in-day prefix.
    #
    # Nothing self-joins and the big union is evaluated ONCE (a
    # join-back formulation was measured 3×: column pruning gives the
    # two union consumers different schemas, so their exchanges never
    # canonicalize equal and ReuseExchange cannot collapse them).
    dec2w = "decimal(28,2)"  # window-sum type of a decimal(18,2) column
    stream = stream.withColumn("_seg", F.to_date("_ts"))
    run1 = (
        Window.partitionBy(*on, "_seg")
        .orderBy("_ts", "_kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = stream.select(
        *on,
        "_seg",
        "_plt",
        *[f"_pl_{c}" for c in lead_cols],
        "_wtag",
        F.sum("_w_cnt").over(run1).cast("bigint").alias("_i_cnt"),
        *[
            F.sum(f"_w_{c}").over(run1).cast(dec2w).alias(f"_i_{c}")
            for c in sum_cols
        ],
        F.sum("_w_day").over(run1).cast("bigint").alias("_i_day"),
    ).filter(F.col("_wtag").isNotNull())
    day_partials = (
        f.groupBy(*on, F.to_date("_fts").alias("_seg"))
        .agg(
            F.count("*").alias("_w2_cnt"),
            *[
                F.sum(F.col(c).cast(dec2)).cast(dec2w).alias(f"_w2_{c}")
                for c in sum_cols
            ],
        )
        # exactly one day row per (key, fact day) entered the level-1
        # stream, so the level-2 day weight is the constant 1
        .withColumn("_w2_day", F.lit(1))
    )
    probes2 = intra.select(
        *on,
        "_seg",
        F.lit(0).alias("_k2"),
        "_plt",
        *[f"_pl_{c}" for c in lead_cols],
        "_wtag",
        F.lit(0).cast("bigint").alias("_w2_cnt"),
        *[F.lit(0).cast(dec2w).alias(f"_w2_{c}") for c in sum_cols],
        F.lit(0).alias("_w2_day"),
        "_i_cnt",
        *[f"_i_{c}" for c in sum_cols],
        "_i_day",
    )
    days2 = day_partials.select(
        *on,
        "_seg",
        F.lit(1).alias("_k2"),
        *null_leads,
        F.lit(None).cast("string").alias("_wtag"),
        "_w2_cnt",
        *[f"_w2_{c}" for c in sum_cols],
        "_w2_day",
        F.lit(0).cast("bigint").alias("_i_cnt"),
        *[F.lit(0).cast(dec2w).alias(f"_i_{c}") for c in sum_cols],
        F.lit(0).cast("bigint").alias("_i_day"),
    )
    # NULL _seg (NULL-ts rows) sorts first, matching NULL _ts in the flat
    # ordering; NULL-ts FACT partials land there too and feed every later
    # day's carry, while same-day probes still precede them via _k2.
    run2 = (
        Window.partitionBy(*on)
        .orderBy(F.col("_seg").asc_nulls_first(), F.col("_k2").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = (
        probes2.unionByName(days2)
        .select(
            *on,
            "_plt",
            *[f"_pl_{c}" for c in lead_cols],
            "_wtag",
            (F.sum("_w2_cnt").over(run2) + F.col("_i_cnt")).alias("_c_cnt"),
            *[
                (F.sum(f"_w2_{c}").over(run2) + F.col(f"_i_{c}")).alias(f"_c_{c}")
                for c in sum_cols
            ],
            (F.sum("_w2_day").over(run2) + F.col("_i_day")).alias("_c_day"),
        )
        .filter(F.col("_wtag").isNotNull())
    )

    def _at(tag, col):  # the probe row's cumulative value, one per tag
        return F.max(F.when(F.col("_wtag") == tag, F.col(col)))

    tags = ["s"] + [str(int(n)) for n in windows_days]
    per_lead = cums.groupBy(*on, "_plt", *[f"_pl_{c}" for c in lead_cols]).agg(
        *[
            _at(t, c).alias(f"_{c}_{t}")
            for t in tags
            for c in ["_c_cnt", *[f"_c_{s}" for s in sum_cols], "_c_day"]
        ]
    )

    totals = f.groupBy(*on).agg(
        F.count("*").alias("_tot_cnt"),
        *[F.sum(F.col(c).cast(dec2)).alias(f"_tot_{c}") for c in sum_cols],
    )
    out = per_lead.join(totals, on, "left")
    if need_days:
        day_tot = daily.groupBy(*on).agg(F.count("*").alias("_tot_day"))
        out = out.join(day_tot, on, "left").join(
            daily,
            [out[k] == daily[k] for k in on]
            + [F.to_date(out["_plt"]) == daily["_d"]],
            "left",
        )
    corr = (
        F.when(
            (F.col("_d_first") < F.col("_plt")) & (F.col("_d_last") >= F.col("_plt")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        if need_days
        else F.lit(0)
    )

    final_cols = [*[per_lead[k] for k in on], F.col("_plt").alias(lead_ts)] + [
        F.col(f"_pl_{c}").alias(c) for c in lead_cols
    ]
    has_ts = F.col("_plt").isNotNull()
    for name, spec in metrics.items():
        kind = spec[0]
        for t, suffix in [(str(int(n)), f"_{int(n)}d") for n in windows_days] + [
            (None, "_all")
        ]:
            if kind == "count":
                hi = (
                    F.coalesce(F.col("_tot_cnt"), F.lit(0))
                    if t is None
                    else F.col(f"__c_cnt_{t}")
                )
                expr = (hi - F.col("__c_cnt_s")).cast("bigint")
            elif kind == "sum_dec2_double":
                c = spec[1]
                hi = (
                    F.coalesce(F.col(f"_tot_{c}"), F.lit(0).cast(dec2))
                    if t is None
                    else F.col(f"__c_{c}_{t}")
                )
                expr = (hi - F.col(f"__c_{c}_s")).cast("double")
            else:  # distinct_dates
                hi = (
                    F.coalesce(F.col("_tot_day"), F.lit(0))
                    if t is None
                    else F.col(f"__c_day_{t}")
                )
                expr = (hi - F.col("__c_day_s") + corr).cast("bigint")
            # NULL-lead_ts guard (docstring contract): a NULL probe sorts
            # first, so its prefixes are 0 and the _all totals would leak
            # the full per-key sums; the correlated-join semantics this
            # operator re-expresses return 0 for such leads.
            zero = F.lit(0.0) if kind == "sum_dec2_double" else F.lit(0).cast("bigint")
            final_cols.append(F.when(has_ts, expr).otherwise(zero).alias(f"{name}{suffix}"))
    return out.select(*final_cols)
