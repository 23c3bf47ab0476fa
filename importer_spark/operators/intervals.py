"""Bin-bucketed interval (range) join — the non-equi join Spark would
otherwise execute as a broadcast nested loop (or worse, a cartesian
product). The reference's attribution windows join facts into
[start, end) ranges one correlated subquery at a time
(fct_trade_show_leads.sql:106-169, SURVEY §2.4 J9); this operator is the
general form: arbitrary, possibly overlapping intervals, joined to points
through ONE equi-shuffle.

Rewrite: pick a bin width W near the typical interval length. Every
interval explodes into one row per W-sized bin it overlaps
(floor(start/W) .. floor((end-1)/W)); every point maps to exactly ONE bin
(floor(p/W)), so the equi-join on bin id emits each matching
(point, interval) pair exactly once — no dedup pass, no row explosion on
the large (point) side. The residual range predicate filters inside the
join. Cost model at 100 TB: points shuffle once on bin; intervals inflate
by ~(interval_len/W + 1); a hot bin (many intervals AND many points) is a
skew key that AQE's skew-join split absorbs.

Correctness does not depend on floating-point exactness of the bin
function: floor(x/W) is monotone in x, and the interval enumerates every
integer bin between bin(start) and bin(end-1), so any monotone bin
assignment keeps each point's bin inside its matching intervals' bin sets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin(col: Column, width: int) -> Column:
    return F.floor(col / F.lit(width)).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Inner-join ``points`` to every interval with
    ``start_col <= point_col < end_col`` (half-open, the SQL windowing
    convention). Domains are integers (epoch days/seconds/µs or any other
    numeric axis — callers convert dates with ``datediff``/``unix_*``).

    Returns all point columns followed by all interval columns; the two
    frames must not share column names. Empty intervals (end <= start)
    match nothing and are dropped before the explode so ``sequence`` never
    sees a descending range.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"points and intervals share column names: {sorted(overlap)}")

    iv = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "_iv_bin",
        F.explode(
            F.sequence(
                _bin(F.col(start_col), bin_width),
                _bin(F.col(end_col) - F.lit(1), bin_width),
            )
        ),
    )
    pt = points.withColumn("_pt_bin", _bin(F.col(point_col), bin_width))
    joined = pt.join(
        iv,
        (pt["_pt_bin"] == iv["_iv_bin"])
        & (pt[point_col] >= iv[start_col])
        & (pt[point_col] < iv[end_col]),
        "inner",
    )
    return joined.drop("_pt_bin", "_iv_bin")
