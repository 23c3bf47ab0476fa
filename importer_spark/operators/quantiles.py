"""Mergeable quantile sketch — the KLL compactor hierarchy (Karnin, Lang,
Liberty, "Optimal quantile approximation in streams", FOCS 2016), in the
deterministic-compactor variant: compaction keeps alternating halves via a
per-level parity bit instead of a coin flip, so a given input order always
produces the identical sketch (the repo-wide determinism convention; the
classical randomized bound becomes an empirically-pinned error in tests).

Completes the mergeable-sketch family next to HLL distinct-count
(operators/sketch.py hll_*) and exact heavy hitters (frequent_items): the
three summary shapes a 100 TB rollup layer needs. Like the HLL path, the
scale contract is partials-then-merge: each partition condenses to
O(k·log(n/k)) values with NO shuffle of raw rows; partials are small enough
to collect (n_partitions · k·log n doubles) or to reduce pairwise in a tree
— rollup cost is independent of raw volume.

Reference parity: the reference computes percentiles with exact
PERCENTILE_CONT over full scans (models/mart/mart_order_issues.sql shape);
the exact distributed twin lives in operators/ranks.py. This sketch is the
approximate/streaming-rollup alternative neither engine ships natively.

NaN contract: the sketch path treats float NaN like SQL NULL — dropped
before condensing (pandas ``dropna`` cannot distinguish the two after
Arrow conversion of float64, and a NaN admitted into the compactor would
poison every sort). This intentionally DIVERGES from Spark's own
percentile/sort semantics, which rank NaN above all values: quantiles
from this module describe the non-NaN distribution. Filter or assert on
``isnan`` upstream if NaN presence itself is the signal.
"""

from __future__ import annotations

import bisect

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class KLLSketch:
    """Levels of sorted buffers; items at level i carry weight 2^i. When a
    level overflows its capacity, the buffer is sorted and every other item
    (alternating start parity per level) promotes to the next level —
    halving the count, doubling the weight, and bounding total memory at
    O(k + k/c + k/c² + ...) for capacity decay c = 2/3."""

    __slots__ = ("k", "levels", "parities", "n")

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError(f"k must be >= 8, got {k}")
        self.k = k
        self.levels: list[list[float]] = [[]]
        self.parities: list[int] = [0]
        self.n = 0

    def _capacity(self, level: int) -> int:
        # top level gets k; each level below geometrically less (2/3 decay)
        top = len(self.levels) - 1
        c = int(self.k * (2.0 / 3.0) ** (top - level))
        return max(c, 2)

    def update(self, v: float) -> None:
        self.levels[0].append(v)
        self.n += 1
        self._compress()

    def extend(self, vs) -> None:
        self.levels[0].extend(float(v) for v in vs)
        self._compress()  # recomputes n from level contents

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self._capacity(i):
                buf = sorted(self.levels[i])
                # Odd buffer: one leftover stays at this level so total mass
                # is EXACTLY preserved (halving an odd count at double
                # weight would drift n by ±2^i per compaction).
                leftover = [buf.pop()] if len(buf) % 2 else []
                start = self.parities[i]
                self.parities[i] ^= 1
                promoted = buf[start::2]
                self.levels[i] = leftover
                if i + 1 == len(self.levels):
                    self.levels.append([])
                    self.parities.append(0)
                self.levels[i + 1].extend(promoted)
            i += 1
        self.n = sum(len(lv) << i for i, lv in enumerate(self.levels))

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        out = KLLSketch(min(self.k, other.k))
        while len(out.levels) < max(len(self.levels), len(other.levels)):
            out.levels.append([])
            out.parities.append(0)
        for src in (self, other):
            for i, lv in enumerate(src.levels):
                out.levels[i].extend(lv)
        out._compress()
        return out

    def rank(self, v: float) -> float:
        """Estimated number of items <= v."""
        r = 0
        for i, lv in enumerate(self.levels):
            s = sorted(lv)
            r += bisect.bisect_right(s, v) << i
        return float(r)

    def quantile(self, q: float) -> float:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"q must be in [0,1], got {q}")
        items: list[tuple[float, int]] = []
        for i, lv in enumerate(self.levels):
            w = 1 << i
            items.extend((v, w) for v in lv)
        if not items:
            raise ValueError("empty sketch")
        items.sort()
        target = q * self.n
        acc = 0
        for v, w in items:
            acc += w
            if acc >= target:
                return v
        return items[-1][0]

    def to_rows(self) -> list[tuple[int, int, list[float]]]:
        return [
            (i, self.parities[i], list(lv)) for i, lv in enumerate(self.levels)
        ]

    @classmethod
    def from_rows(cls, k: int, rows) -> "KLLSketch":
        s = cls(k)
        for level, parity, values in rows:
            while len(s.levels) <= level:
                s.levels.append([])
                s.parities.append(0)
            s.levels[level].extend(values)
            s.parities[level] = parity
        s.n = sum(len(lv) << i for i, lv in enumerate(s.levels))
        return s


_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.LongType()),
        T.StructField("level", T.IntegerType()),
        T.StructField("parity", T.IntegerType()),
        T.StructField("values", T.ArrayType(T.DoubleType())),
    ]
)


def quantile_sketch_partials(df: DataFrame, col: str, k: int = 200) -> DataFrame:
    """One KLL sketch per partition, emitted as (part_id, level, parity,
    values) rows — the map-side condense. No shuffle: each partition's raw
    rows never leave it; what travels is O(k·log(n_p/k)) doubles. NULL and
    NaN values are both dropped (module NaN contract)."""

    def build(iterator):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        sk = KLLSketch(k)
        for batch in iterator:
            vals = batch[col].dropna()
            if len(vals):
                sk.extend(vals.to_numpy(dtype="float64"))
        rows = sk.to_rows()
        yield pd.DataFrame(
            {
                "part_id": [pid] * len(rows),
                "level": [r[0] for r in rows],
                "parity": [r[1] for r in rows],
                "values": [r[2] for r in rows],
            }
        )

    return df.select(F.col(col).alias(col)).mapInPandas(build, _PARTIAL_SCHEMA)


def quantile_estimates(
    df: DataFrame, col: str, qs: list[float], k: int = 200
) -> dict[float, float]:
    """Merged-sketch quantile estimates for ``qs``. Driver state is the
    merged sketch only (O(k·log n) doubles) — the partials collect is the
    same bounded-model-state pattern as hll_rollup_estimate."""
    rows = quantile_sketch_partials(df, col, k).collect()
    by_part: dict[int, list] = {}
    for r in rows:
        by_part.setdefault(r["part_id"], []).append(
            (r["level"], r["parity"], r["values"])
        )
    merged: KLLSketch | None = None
    for pid in sorted(by_part):
        sk = KLLSketch.from_rows(k, by_part[pid])
        merged = sk if merged is None else merged.merge(sk)
    if merged is None or merged.n == 0:
        raise ValueError(f"no non-null values in {col}")
    return {q: merged.quantile(q) for q in qs}


def grouped_quantile_partials(
    df: DataFrame, group_cols: list[str], col: str, k: int = 200
) -> DataFrame:
    """One KLL sketch per group, emitted as (group_cols…, level, parity,
    values) rows — the persistable per-window sketch state (HLL twin:
    sketch.hll_partial_sketches). Built with applyInPandas so each group's
    raw rows reduce to O(k·log n_g) doubles at the executor; only sketch
    rows shuffle."""
    out_fields = [df.schema[c] for c in group_cols] + [
        T.StructField("level", T.IntegerType()),
        T.StructField("parity", T.IntegerType()),
        T.StructField("values", T.ArrayType(T.DoubleType())),
    ]
    schema = T.StructType(out_fields)

    def build(pdf):
        import pandas as pd

        sk = KLLSketch(k)
        vals = pdf[col].dropna()
        if len(vals):
            sk.extend(vals.to_numpy(dtype="float64"))
        rows = sk.to_rows()
        base = {c: [pdf[c].iloc[0]] * len(rows) for c in group_cols}
        base.update(
            {
                "level": [r[0] for r in rows],
                "parity": [r[1] for r in rows],
                "values": [r[2] for r in rows],
            }
        )
        return pd.DataFrame(base)

    return df.select(*group_cols, col).groupBy(*group_cols).applyInPandas(
        build, schema
    )


def rollup_quantiles(
    partials: DataFrame,
    rollup_cols: list[str],
    qs: list[float],
    k: int = 200,
) -> DataFrame:
    """Merge persisted sketch partials UP to a coarser grain and emit
    quantile estimates — rollup cost is O(sketch rows), independent of the
    raw volume the partials condensed (the entire point of a mergeable
    sketch store). Distributed: each rollup group's merge happens inside
    applyInPandas; the driver never holds any sketch."""
    out_fields = [partials.schema[c] for c in rollup_cols] + [
        T.StructField("quantile", T.DoubleType()),
        T.StructField("estimate", T.DoubleType()),
    ]
    schema = T.StructType(out_fields)

    def merge(pdf):
        import pandas as pd

        merged = KLLSketch(k)
        for _, row in pdf.iterrows():
            merged = merged.merge(
                KLLSketch.from_rows(
                    k, [(int(row["level"]), int(row["parity"]), list(row["values"]))]
                )
            )
        if merged.n == 0:
            # Every partial in this rollup group condensed zero values
            # (all-NULL metric): emit nothing for the group rather than
            # failing the whole job on `quantile` of an empty sketch.
            return pd.DataFrame({c: [] for c in [*rollup_cols, "quantile", "estimate"]})
        base = {c: [pdf[c].iloc[0]] * len(qs) for c in rollup_cols}
        base.update(
            {
                "quantile": [float(q) for q in qs],
                "estimate": [float(merged.quantile(q)) for q in qs],
            }
        )
        return pd.DataFrame(base)

    return partials.groupBy(*rollup_cols).applyInPandas(merge, schema)
