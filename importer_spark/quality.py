"""Data-quality assertion layer (SURVEY §5).

The reference validates with dbt schema tests (unique / not_null /
accepted_values — ~340 of them), singular SQL tests (fail if query returns
rows), and Python runtime checks (row counts, freshness, duplicate PKs:
pipelines/shared/data_quality.py:17-216). This module is the Spark analog:
each check computes a violation COUNT distributed-side (never collects rows)
and raises ``QualityError`` with a sample on failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class QualityError(AssertionError):
    pass


def _fail(name: str, detail: str):
    raise QualityError(f"quality check failed: {name} — {detail}")


def assert_not_null(df: DataFrame, cols: list[str]) -> None:
    agg = df.agg(
        *[F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in cols]
    ).first()
    bad = {c: agg[c] for c in cols if agg[c] > 0}
    if bad:
        _fail("not_null", f"null counts {bad}")


def assert_unique(df: DataFrame, cols: list[str]) -> None:
    dups = df.groupBy(*cols).count().filter(F.col("count") > 1)
    n = dups.count()
    if n:
        sample = [r.asDict() for r in dups.limit(5).collect()]
        _fail("unique", f"{n} duplicated keys on {cols}; sample {sample}")


def assert_accepted_values(df: DataFrame, col: str, values: list) -> None:
    bad = df.filter(~F.col(col).isin(values) | F.col(col).isNull()).select(col).distinct()
    n = bad.count()
    if n:
        sample = [r[0] for r in bad.limit(10).collect()]
        _fail("accepted_values", f"{col} has {n} unexpected values; sample {sample}")


def assert_row_count_between(df: DataFrame, lo: int, hi: int | None = None) -> None:
    n = df.count()
    if n < lo or (hi is not None and n > hi):
        _fail("row_count", f"count {n} outside [{lo}, {hi}]")


def assert_expression(df: DataFrame, expr: str, name: str = "expression") -> None:
    """dbt_utils.expression_is_true analog: every row must satisfy ``expr``."""
    n = df.filter(~F.expr(expr)).count()
    if n:
        _fail(name, f"{n} rows violate {expr!r}")


def reconcile_counts(left: DataFrame, right: DataFrame, tolerance: int = 0) -> None:
    """Split-integrity reconciliation (reference:
    tests/test_contact_email_splitting_integrity.sql — recompute independently
    and diff counts)."""
    nl, nr = left.count(), right.count()
    if abs(nl - nr) > tolerance:
        _fail("reconcile_counts", f"left={nl} right={nr} tolerance={tolerance}")
