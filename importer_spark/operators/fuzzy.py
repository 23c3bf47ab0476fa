"""Fuzzy string-match join — edit-distance entity matching WITHOUT a cross
join, the missing piece between exact key consolidation
(functions/domains.py name normalization) and set-similarity dedup
(operators/dedup.py MinHash): normalization converges *systematic* noise
(suffixes, case, whitespace); this operator converges *typos*.

Candidate generation is the symmetric-deletion scheme (the SymSpell
family): every string explodes into all variants reachable by deleting up
to ``max_dist`` characters, and two strings are candidates iff they share
a variant. This is provably COMPLETE for Levenshtein distance ≤ d: an
alignment with ≤ d edits pins a common subsequence reachable from either
side by ≤ d deletions (deletions+substitutions from one side,
insertions+substitutions from the other), so no true match is missed —
unlike q-gram-count or prefix heuristics, there is no recall loss to
tune. Candidates are then verified with the JVM ``levenshtein(l, r,
threshold)`` kernel (early-exits above the threshold), so emitted
distances are exact.

100 TB shape — identical to the LSH band join (operators/dedup.py):
- runs on the DISTINCT-names relation (the entity vocabulary), never the
  raw corpus; the corpus re-joins the match table by equi-key afterwards;
- the only shuffle moves (variant_hash, name) pairs; variants fan out
  ~(n·d) rows per name but each is a hash + short string;
- verification touches candidate pairs only (the whole point: the
  all-pairs theta join the oracle runs is what this avoids);
- hot variants (e.g. the empty-string variant of 1-char names under d=1)
  are AQE skew splits, not plan changes.

Variant generation is array-HOF per-name work on the vocabulary side —
interpreted, but O(n·d) per DISTINCT name, not per corpus row (the same
budget call as the MinHash shingle pipeline documents).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _drop1(s: Column, i: Column) -> Column:
    """``s`` with the 1-based character ``i`` removed."""
    return F.concat(
        F.substring(s, F.lit(1), i - 1),
        F.substring(s, i + 1, F.length(s)),
    )


def _drop2(s: Column, i: Column, j: Column) -> Column:
    """``s`` with 1-based characters ``i < j`` removed."""
    return F.concat(
        F.substring(s, F.lit(1), i - 1),
        F.substring(s, i + 1, j - i - 1),
        F.substring(s, j + 1, F.length(s)),
    )


def deletion_variants(s: Column, max_dist: int) -> Column:
    """All distinct strings reachable from ``s`` by deleting up to
    ``max_dist`` characters (including ``s`` itself). ``max_dist`` in
    {1, 2} — 2 is the practical typo ceiling; the d=2 neighborhood is
    O(n²) variants per name, which is why this runs on the vocabulary."""
    if max_dist not in (1, 2):
        raise ValueError(f"deletion_variants: max_dist must be 1 or 2, got {max_dist}")
    n = F.length(s)
    empty = F.array().cast("array<string>")
    d0 = F.array(s)
    d1 = F.when(
        n >= 1, F.transform(F.sequence(F.lit(1), n), lambda i: _drop1(s, i))
    ).otherwise(empty)
    parts = [d0, d1]
    if max_dist == 2:
        d2 = F.when(
            n >= 2,
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), n - 1),
                    lambda i: F.transform(
                        F.sequence(i + 1, n), lambda j: _drop2(s, i, j)
                    ),
                )
            ),
        ).otherwise(empty)
        parts.append(d2)
    return F.array_distinct(F.concat(*parts))


def fuzzy_match_pairs(
    names: DataFrame, name_col: str, max_dist: int = 2
) -> DataFrame:
    """(name_a, name_b, edit_dist): unordered pairs of DISTINCT values of
    ``name_col`` within Levenshtein distance ``max_dist`` (name_a < name_b;
    exact distances, candidate generation lossless — see module doc)."""
    distinct = names.select(F.col(name_col).alias("_name")).distinct()
    variants = distinct.select(
        "_name",
        F.explode(deletion_variants(F.col("_name"), max_dist)).alias("_v"),
    ).select("_name", F.xxhash64("_v").alias("_vh"))
    a, b = variants.alias("a"), variants.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._vh") == F.col("b._vh"))
            & (F.col("a._name") < F.col("b._name")),
        )
        .select(
            F.col("a._name").alias("name_a"), F.col("b._name").alias("name_b")
        )
        .distinct()
    )
    return cand.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b", max_dist).alias("edit_dist"),
    ).filter(F.col("edit_dist") >= 0)
