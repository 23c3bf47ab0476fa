"""Bloom-filter join pruning — cut the fact-side scan/shuffle volume of a
selective join BEFORE the join happens, the classic 100 TB semi-join
optimization (same family as Spark's own AQE runtime bloom filter, which
`bloom_filter_agg` backs internally but does not expose as a public
function; this is the public-API, explicitly-planned form).

Build (distributed, one job): each build-side key hashes to ``n_hashes``
bit positions via the JVM xxhash64 kernel (double hashing h1 + i·h2);
positions explode, group by 64-bit word index, and ``bit_or`` folds each
word map-side — the driver collects only ``n_bits/64`` longs, never keys.

Probe (pure codegen, zero Python): the word array re-enters the plan as a
LITERAL array<bigint>, and the membership test is ``n_hashes`` element_at
+ shift/mask terms ANDed together — it compiles into the fact scan's
WholeStageCodegen, so pruning happens at read time, before any exchange.

Exactness: a Bloom hit can be a false positive, so callers keep the real
join afterwards (`bloom_semi_join` does) — the filter only removes
guaranteed-non-matching rows early; results are exactly the plain join's.

Scale regimes: the plan-literal probe ships n_bits/8 bytes with the
serialized plan — right for build sides up to ~10⁷ keys (a few MB of
bits) whose hash relation would already strain a broadcast join. Beyond
that, Spark's runtime bloom (spark.sql.optimizer.runtime.bloomFilter.*)
or a plain shuffle join is the correct tool; sizing guidance: n_bits ≈
10 bits/key ≈ fpp 1% at n_hashes=4 (larger is harmless, it's bits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hashes(key: Column, n_hashes: int, n_bits: int) -> list[Column]:
    """``n_hashes`` bit positions for ``key`` — double hashing with two
    independent JVM xxhash64 streams (the second salted; forced odd so the
    stride cycles the full table even when n_bits is a power of two)."""
    # Reduce mod n_bits BEFORE combining: (h1 + i·h2) mod m ==
    # ((h1 mod m) + i·(h2 mod m)) mod m, and the reduced form cannot
    # overflow a long under ANSI arithmetic (i·h2 can).
    h1 = F.pmod(F.xxhash64(key), F.lit(n_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit("bloom-salt")), F.lit(n_bits)).bitwiseOR(
        F.lit(1)
    )
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(n_hashes)]


def build_bloom_words(
    keys: DataFrame, key_col: str, n_bits: int, n_hashes: int = 4
) -> list[int]:
    """Distributed Bloom build: returns the filter as ``n_bits/64`` longs.
    One shuffle of at most (distinct positions) rows grouped into word
    indices; bit_or combines partially map-side. Driver state is the word
    array only."""
    if n_bits % 64:
        raise ValueError(f"n_bits must be a multiple of 64, got {n_bits}")
    key = F.col(key_col)
    pos = F.explode(F.array(*_hashes(key, n_hashes, n_bits))).alias("_pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("_pos") / 64).cast("long").alias("_w"),
            # F.shiftleft's Python signature wants a literal int for the bit
            # count; call_function reaches the SQL kernel, which takes a column
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("_pos") % 64).cast("int")
            ).alias("_b"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_b").alias("_m"))
        .collect()
    )
    out = [0] * (n_bits // 64)
    for r in words:
        out[r["_w"]] = r["_m"]
    return out


def might_contain(
    key: Column, words: list[int], n_bits: int, n_hashes: int = 4
) -> Column:
    """Codegen membership test against a built filter: true if every hash
    position's bit is set (i.e. possibly present; false = definitely not)."""
    lit_words = F.lit(words)  # array<bigint> literal — ships with the plan
    cond = None
    for p in _hashes(key, n_hashes, n_bits):
        word = F.element_at(lit_words, (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftright", word, (p % 64).cast("int")
        ).bitwiseAND(F.lit(1))
        term = bit == 1
        cond = term if cond is None else cond & term
    return cond


def bloom_semi_join(
    fact: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
    how: str = "inner",
) -> DataFrame:
    """``fact ⋈ build`` with a Bloom pre-filter pushed into the fact scan:
    rows that cannot match never reach the join's exchange. The real join
    still runs, so false positives are eliminated and the result is exactly
    the plain join's — the Bloom only changes WHERE rows die, moving that
    from post-shuffle to scan time."""
    words = build_bloom_words(build, build_key, n_bits, n_hashes)
    pruned = fact.filter(
        might_contain(F.col(fact_key), words, n_bits, n_hashes)
    )
    return pruned.join(build, pruned[fact_key] == build[build_key], how)
