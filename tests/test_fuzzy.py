"""fuzzy_match_pairs: PassJoin pigeonhole candidates are lossless for
Levenshtein <= max_dist (pairs equal the brute-force theta join), key
generation is linear in string length (the property symmetric deletion
lacked — a 2000-codepoint token ground the old scheme for hours under the
Unicode fuzz gate), and the oracle-parity gate holds."""

from __future__ import annotations

import itertools

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from importer_spark.operators.fuzzy import (
    fuzzy_match_pairs,
    partition_keys,
    probe_keys,
)
from tests.conftest import SF_DIR, assert_query_matches


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(names, max_dist):
    uniq = sorted(set(n for n in names if n is not None))
    out = set()
    for a, b in itertools.combinations(uniq, 2):
        d = _lev(a, b)  # once per pair — the mega-token DP is ~4M cells
        if d <= max_dist:
            out.add((a, b, d))
    return out


def _pairs(spark, names, max_dist):
    df = spark.createDataFrame([Row(n=x) for x in names], "n string")
    return {
        (r.name_a, r.name_b, r.edit_dist)
        for r in fuzzy_match_pairs(df, "n", max_dist=max_dist).collect()
    }


@pytest.mark.parametrize("max_dist", [1, 2])
def test_partition_keys_cover_the_string(spark, max_dist):
    """Parts are contiguous, ordered, and concatenate back to the string;
    key l is the string's own length."""
    for s in ["", "a", "ab", "abc", "hot rod", "aaaa", "abcdefghij"]:
        keys = (
            spark.createDataFrame([Row(s=s)])
            .select(partition_keys(F.col("s"), max_dist).alias("k"))
            .head()["k"]
        )
        assert len(keys) == max_dist + 1
        assert all(k.l == len(s) for k in keys)
        assert [k.i for k in keys] == list(range(max_dist + 1))
        assert "".join(k.piece for k in keys) == s


@pytest.mark.parametrize("max_dist", [1, 2])
def test_probe_keys_linear_not_quadratic(spark, max_dist):
    """Key COUNT is O(max_dist^3), independent of string length — the
    scale contract that makes mega-token strings safe."""
    short, long_ = "abcdef", "x" * 5000
    n = {
        s: len(
            spark.createDataFrame([Row(s=s)])
            .select(probe_keys(F.col("s"), max_dist).alias("k"))
            .head()["k"]
        )
        for s in (short, long_)
    }
    cap = (2 * max_dist + 1) ** 2 * (max_dist + 1)
    assert n[long_] <= cap, "probe keys must not grow with string length"
    assert n[short] <= cap


@pytest.mark.parametrize("max_dist", [1, 2])
def test_fuzzy_pairs_equal_brute_force(spark, max_dist):
    # Typo cluster + unrelated names + near-misses at exactly dist 3,
    # duplicates in the input (operator runs on DISTINCT names), empties.
    names = [
        "acme corp", "acme corp", "acme c0rp", "acme cor", "acme copr",
        "globex", "globexx", "glo bex", "initech", "intech", "ini tech",
        "a", "b", "ab", "", "zzzzzz",
    ]
    assert _pairs(spark, names, max_dist) == _brute(names, max_dist)


def test_fuzzy_pairs_mega_token_and_unicode(spark):
    """The Unicode-fuzz pathology: multi-kilobyte strings sharing a huge
    suffix, multibyte codepoints, and tiny strings — candidates stay
    bounded and distances exact (codepoint semantics)."""
    mega = "龍" * 2000
    names = [
        "acme corp " + mega,
        "acme c0rp " + mega,      # dist 1 (substitution inside the prefix)
        "acme corpse " + mega,    # dist 2 from the first
        "globex " + mega,         # far from both
        "мир", "мираж",           # multibyte, dist 2 by codepoints
        "", "é", "e",             # combining-free vs plain: 1 codepoint edit
    ]
    assert _pairs(spark, names, 2) == _brute(names, 2)


@settings(max_examples=15, deadline=None)
@given(
    names=st.lists(
        st.text(alphabet="abé龍 ", min_size=0, max_size=9),
        min_size=2,
        max_size=12,
    ),
    max_dist=st.integers(min_value=1, max_value=2),
)
def test_fuzzy_pairs_property(spark, names, max_dist):
    """Hypothesis: on a tiny skewed alphabet (dense near-collisions, empty
    parts, multibyte codepoints) the candidate scheme never misses a pair
    and never emits a wrong distance."""
    assert _pairs(spark, names, max_dist) == _brute(names, max_dist)


def test_fuzzy_oracle_parity(spark):
    assert_query_matches(spark, "part_name_fuzzy_matches", SF_DIR)
