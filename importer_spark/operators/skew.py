"""Skew-mitigation join (SURVEY §2.4 J11).

The reference joins facts to dimensions on customer NAMES
(fct_company_orders.sql:43-44) — hot names make hot partitions. AQE's skew
join handles most cases (enabled in session defaults); explicit salting is
the belt-and-suspenders form for known-pathological keys, and the only
option when the skewed side feeds an aggregation rather than a join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join with the left (skewed/fact) side salted into
    ``salt_buckets`` sub-keys and the right (dimension) side replicated per
    bucket. Result is identical to ``left.join(right, on, how)``; the join
    key space is multiplied by ``salt_buckets`` so one hot key spreads over
    that many tasks. Right-side replication costs |right|·buckets rows —
    use for dimension-sized right sides only.

    The salt is derived from a hash of the whole left row (deterministic,
    no rand()), so repeated runs partition identically.

    Only left-preserving joins are supported: right/full outer would emit
    each unmatched right row once per salt bucket (it is replicated), which
    is NOT identical to the plain join.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
               "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched right rows "
            f"across {salt_buckets} salt buckets; use one of {sorted(allowed)}"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets))
    left_s = left.withColumn("_salt", salt)
    right_s = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<bigint>"))
    )
    return left_s.join(right_s, on=[*on, "_salt"], how=how).drop("_salt")
