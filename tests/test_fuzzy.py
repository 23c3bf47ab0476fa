"""fuzzy_match_pairs: symmetric-deletion candidates are lossless for
Levenshtein <= max_dist (pairs equal the brute-force theta join), variants
are exactly the deletion neighborhood, and the oracle-parity gate holds."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from importer_spark.operators.fuzzy import deletion_variants, fuzzy_match_pairs
from tests.conftest import SF_DIR, assert_query_matches


def _py_variants(s: str, max_dist: int) -> set[str]:
    out = {s}
    for d in range(1, max_dist + 1):
        for idx in itertools.combinations(range(len(s)), d):
            drop = set(idx)
            out.add("".join(c for i, c in enumerate(s) if i not in drop))
    return out


@pytest.mark.parametrize("max_dist", [1, 2])
@pytest.mark.parametrize("s", ["", "a", "ab", "abc", "hot rod", "aaaa"])
def test_deletion_variants_match_python(spark, s, max_dist):
    got = (
        spark.createDataFrame([Row(s=s)])
        .select(deletion_variants(F.col("s"), max_dist).alias("v"))
        .head()["v"]
    )
    assert sorted(got) == sorted(_py_variants(s, max_dist))
    assert len(got) == len(set(got))  # array_distinct applied


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("max_dist", [1, 2])
def test_fuzzy_pairs_equal_brute_force(spark, max_dist):
    # Typo cluster + unrelated names + near-misses at exactly dist 3,
    # duplicates in the input (operator runs on DISTINCT names), empties.
    names = [
        "acme corp", "acme corp", "acme c0rp", "acme cor", "acme copr",
        "globex", "globexx", "glo bex", "initech", "intech", "ini tech",
        "a", "b", "ab", "", "zzzzzz",
    ]
    df = spark.createDataFrame([Row(n=x) for x in names])
    got = {
        (r.name_a, r.name_b, r.edit_dist)
        for r in fuzzy_match_pairs(df, "n", max_dist=max_dist).collect()
    }
    uniq = sorted(set(names))
    want = {
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(uniq, 2)
        if _lev(a, b) <= max_dist
    }
    assert got == want


def test_fuzzy_oracle_parity(spark):
    assert_query_matches(spark, "part_name_fuzzy_matches", SF_DIR)
