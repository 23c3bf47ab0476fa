"""Minimal semantic metric layer — the dbt-metrics / MetricFlow analog.

The reference's marts hand-write the same measures (revenue, order counts,
discount ratios) against the same fact over and over (mart_company_period_
metrics.sql, mart_segment_summary.sql, ...). A metric layer states each
measure ONCE and compiles any (metrics × dimensions × filter) request into
a single-scan aggregation, so every consumer gets the same definition and
Catalyst sees one plan to optimize.

Design: a Metric is a named aggregate expression over a fact DataFrame,
optionally gated by a row-level condition (compiled as F.when masks inside
ONE groupBy — the same conditional-aggregation shape the trailing-period
marts use, never one scan per metric). Ratio metrics divide two already-
aggregated expressions, keeping sums exact until the final division.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Metric:
    name: str
    agg: str            # sum | count | count_distinct | avg | min | max | ratio
    expr: str = "*"     # column/SQL expression the aggregate consumes
    where: str | None = None  # row-level gate (SQL boolean expression)
    num: str | None = None    # ratio: numerator metric name
    den: str | None = None    # ratio: denominator metric name

    def column(self) -> Column:
        if self.agg == "ratio":
            raise ValueError("ratio metrics are derived after aggregation")
        col = F.expr(self.expr)
        if self.where is not None:
            if self.agg in ("count",) and self.expr == "*":
                col = F.when(F.expr(self.where), F.lit(1))
            else:
                col = F.when(F.expr(self.where), col)
        elif self.agg == "count" and self.expr == "*":
            return F.count("*").alias(self.name)
        fn = {
            "sum": F.sum,
            "count": F.count,
            "count_distinct": lambda c: F.count_distinct(c),
            "avg": F.avg,
            "min": F.min,
            "max": F.max,
        }[self.agg]
        return fn(col).alias(self.name)


def compile_metrics(
    fact: DataFrame,
    metrics: list[Metric],
    dimensions: list[str],
    where: str | None = None,
) -> DataFrame:
    """One scan, one aggregation: every non-ratio metric becomes a
    (conditionally masked) aggregate in a single groupBy; ratio metrics
    divide the named aggregates afterwards. Query-level ``where`` pushes
    into the scan (Catalyst predicate pushdown)."""
    by_name = {m.name: m for m in metrics}
    base = [m for m in metrics if m.agg != "ratio"]
    ratios = [m for m in metrics if m.agg == "ratio"]
    for r in ratios:
        for ref in (r.num, r.den):
            if ref not in by_name or by_name[ref].agg == "ratio":
                raise ValueError(f"ratio {r.name!r} needs base metrics, got {ref!r}")
    src = fact.filter(F.expr(where)) if where else fact
    agged = src.groupBy(*[F.col(d) for d in dimensions]).agg(
        *[m.column() for m in base]
    )
    for r in ratios:
        agged = agged.withColumn(
            r.name,
            F.col(r.num).cast("double") / F.nullif(F.col(r.den).cast("double"), F.lit(0)),
        )
    return agged
