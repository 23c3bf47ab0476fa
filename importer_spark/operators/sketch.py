"""Heavy-hitter (frequent-item) detection — the two-pass exact algorithm:
a bounded-memory Space-Saving sketch per partition proposes candidates,
then one exact recount of ONLY the candidates confirms them.

Guarantee chain (why the result is exact, not approximate): an item with
global frequency ≥ N/den has frequency ≥ n_p/den in at least one partition
(pigeonhole over partition sizes n_p); a Space-Saving summary with
k = den+1 counters retains every item whose partition count exceeds
n_p/k < n_p/den — so the union of per-partition summaries is a SUPERSET of
the true heavy hitters. The recount is exact, so false candidates are
filtered and reported counts are true counts.

Scale shape: pass 1 is a column-pruned scan with ≤ k rows emitted per
partition (no shuffle beyond the tiny candidate collect); pass 2 is a
broadcast left-semi prune + one hash aggregation over surviving rows.
Driver/executor memory is O(k · n_partitions) candidates — independent of
the (unbounded) vocabulary size, which is what makes this the 100 TB form:
an exact GROUP-BY-all-items would shuffle the full vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from importer_spark.functions.core import ratio


def _space_saving_update(counters: dict, item, w: int, k: int) -> None:
    """Weighted Space-Saving (Metwally et al.): on a miss with the summary
    full, the minimum counter's item is evicted and the newcomer inherits
    min+w (overestimates never undercount, preserving the superset
    guarantee). The linear min scan is fine at k ≈ den; production-nlist
    sizes would swap in a heap."""
    if item in counters:
        counters[item] += w
    elif len(counters) < k:
        counters[item] = w
    else:
        mk = min(counters, key=counters.get)
        mv = counters.pop(mk)
        counters[item] = mv + w


def frequent_items(df: DataFrame, col: str, den: int) -> DataFrame:
    """Exact items with global count·den ≥ N (frequency ≥ 1/den) over
    ``df[col]`` (nulls excluded). Returns (item, cnt, freq) with exact
    counts; ``freq`` is rounded to 6dp.

    ``den`` is the inverse frequency threshold — integer so the final
    filter is exact integer arithmetic (cnt·den ≥ N), never a float
    comparison.
    """
    if den < 1:
        raise ValueError(f"den must be >= 1, got {den}")
    k = den + 1
    src = df.select(F.col(col).alias("item")).filter(F.col("item").isNotNull())

    def sketch(it):
        import pandas as pd

        counters: dict = {}
        n = 0
        for pdf in it:
            n += len(pdf)
            # value_counts is the vectorized inner loop; Python touches only
            # the per-batch DISTINCT items (vocabulary-bounded, not row-bounded).
            for item, w in pdf["item"].value_counts().items():
                _space_saving_update(counters, item, int(w), k)
        yield pd.DataFrame(
            {"item": list(counters) + [None], "pn": [None] * len(counters) + [n]}
        )

    summary = src.mapInPandas(sketch, schema="item string, pn bigint").cache()
    total = summary.agg(F.sum("pn").alias("_n"))
    cands = summary.filter(F.col("item").isNotNull()).select("item").distinct()
    counted = (
        src.join(F.broadcast(cands), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * den >= F.col("_n"))
        .select("item", "cnt", ratio(F.col("cnt"), F.col("_n")).alias("freq"))
    )


# --- mergeable HLL sketches (incremental distinct at 100 TB) ---------------

def hll_partial_sketches(
    df: DataFrame, key_cols: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group binary HLL sketches — the PERSISTABLE partial state of a
    distinct count. At 100 TB this is the incremental-profiling shape: each
    load window (day/partition/file batch) aggregates its own ~2^lg_k-byte
    sketch once, and any later rollup unions sketches instead of rescanning
    raw data. Sketch union is lossless for a fixed lg_k, so incrementally
    merged estimates equal the estimate a full rescan would produce
    (pinned in tests/test_sketch.py)."""
    return df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("hll_sketch")
    )


def hll_rollup_estimate(
    sketches: DataFrame, group_cols: list[str], out_col: str = "approx_distinct"
) -> DataFrame:
    """Roll partial sketches up to coarser keys: union the binaries, then
    estimate. Input volume is n_groups × sketch bytes — independent of raw
    data size, which is the whole point."""
    return sketches.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("hll_sketch"))).alias(out_col)
    )
