"""Property tests for the training-mixture queries: BM25 retrieval,
leakage-safe splits, UniMax budget allocation — each checked against an
independent pure-Python reference (the oracle gate already certifies
SQL parity; these pin the ALGORITHMS' semantics)."""

from __future__ import annotations

import math

from pyspark.sql import Row

from importer_spark.queries import QUERIES
from tests.conftest import SF_DIR


def test_bm25_matches_pure_python_reference(spark):
    """Okapi BM25 scores and ranking vs a from-scratch implementation on
    the real sf0.001 corpus — same tokenization, same Lucene idf."""
    out = QUERIES["bm25_topk"](spark, SF_DIR).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
        if r["text"] is not None
    }
    toks = {d: t.split(" ") for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    k1, b = 1.2, 0.75
    qids = sorted(docs)[:3]

    def score(qid: int, did: int) -> float:
        qterms = set(toks[qid])
        dl = len(toks[did])
        tf: dict[str, int] = {}
        for term in toks[did]:
            tf[term] = tf.get(term, 0) + 1
        s = 0.0
        for term in qterms & set(tf):
            idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            w = idf * tf[term] * (k1 + 1) / (
                tf[term] + k1 * (1 - b + b * dl / avgdl)
            )
            s += round(w, 9)
        return s

    for qid in qids:
        want = sorted(
            ((score(qid, d), d) for d in docs if d != qid),
            key=lambda x: (-x[0], x[1]),
        )[:10]
        got = sorted(
            [r for r in out if r["query_id"] == qid], key=lambda r: r["rank"]
        )
        assert [r["doc_id"] for r in got] == [d for _, d in want]
        for r, (s, _) in zip(got, want):
            assert abs(r["bm25"] - s) < 1e-5, (qid, r["doc_id"])


def test_leakage_safe_split_never_splits_a_dup_group(spark):
    """Exact duplicates must land in the same split; fractions must be
    roughly 12/2/2 sixteenths; every doc gets exactly one split."""
    rows = QUERIES["leakage_safe_split"](spark, SF_DIR).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    assert len(rows) == len(docs)
    by_text: dict[str, set[str]] = {}
    split_of = {r["doc_id"]: r["split"] for r in rows}
    for did, text in docs.items():
        if text is not None:
            by_text.setdefault(text, set()).add(split_of[did])
    assert all(len(s) == 1 for s in by_text.values()), "dup group straddles splits"
    n = len(rows)
    frac_train = sum(1 for r in rows if r["split"] == "train") / n
    assert 0.55 < frac_train < 0.95  # 12/16 expected, small-corpus noise ok
    assert {r["split"] for r in rows} <= {"train", "val", "test"}


def test_unimax_waterfilling_invariants(spark):
    """vs the paper's greedy loop: iteratively give every language an equal
    share of the remaining budget, capping at E×tokens; the closed-form
    window query must reproduce it exactly (integer arithmetic)."""
    rows = QUERIES["unimax_language_budget"](spark, SF_DIR).collect()
    sizes = {r["lang"]: r["n_tokens"] for r in rows}
    e_cap = 4
    budget = sum(sizes.values()) * 1 // 2

    # greedy reference: repeatedly equal-split the remaining budget among
    # languages not yet at cap; languages whose cap is below the share are
    # finalized at cap and the loop repeats
    remaining = dict(sizes)
    alloc: dict[str, int] = {}
    b = budget
    while remaining:
        order = sorted(remaining, key=lambda lang: (e_cap * sizes[lang], lang))
        share = b // len(remaining)
        lowest = order[0]
        if e_cap * sizes[lowest] <= share:
            alloc[lowest] = e_cap * sizes[lowest]
            b -= alloc[lowest]
            del remaining[lowest]
        else:
            for lang in order:
                alloc[lang] = b // len(remaining)
            break

    got = {r["lang"]: r["alloc_tokens"] for r in rows}
    assert got == alloc
    assert sum(got.values()) <= budget
    for r in rows:
        assert r["alloc_tokens"] <= e_cap * r["n_tokens"]
        assert abs(r["epochs"] - round(r["alloc_tokens"] / r["n_tokens"], 6)) < 1e-9


def test_unimax_synthetic_extremes(spark):
    """Tiny synthetic corpus where every language is capped (huge budget
    regime degenerates to min(cap, share) with NULL waterline)."""
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="a b c d", lang="aa", source="s", n_chars=7),
            Row(doc_id=1, text="e f", lang="bb", source="s", n_chars=3),
            Row(doc_id=2, text="g", lang="cc", source="s", n_chars=1),
        ]
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "documents.parquet"))
        rows = QUERIES["unimax_language_budget"](spark, tmp).collect()
    # total tokens 7, budget 3: smallest-cap language (cc, cap 4) is above
    # the equal share 1 → waterline at i=1, all languages share b//3 = 1
    assert {r["lang"]: r["alloc_tokens"] for r in rows} == {
        "aa": 1, "bb": 1, "cc": 1,
    }


def test_hybrid_rrf_fusion_invariants(spark):
    """RRF = Σ round(1/(60+rank), 9) over the arms that returned the doc;
    fused ranking must agree with recomputing fusion from the standalone
    arms' outputs (bm25_topk + a dense re-rank of the same probes)."""
    out = QUERIES["hybrid_rrf_topk"](spark, SF_DIR).collect()
    lex = {
        (r["query_id"], r["doc_id"]): r["rank"]
        for r in QUERIES["bm25_topk"](spark, SF_DIR).collect()
    }
    for r in out:
        want = 0.0
        if r["lex_rank"] is not None:
            assert lex[(r["query_id"], r["doc_id"])] == r["lex_rank"]
            want += round(1 / (60 + r["lex_rank"]), 9)
        if r["dense_rank"] is not None:
            want += round(1 / (60 + r["dense_rank"]), 9)
        assert r["lex_rank"] is not None or r["dense_rank"] is not None
        assert abs(r["rrf"] - want) < 1e-12, (r["query_id"], r["doc_id"])
    # per query: ranks are 1..k dense and ordered by rrf desc
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        rrfs = [r["rrf"] for r in rows]
        assert rrfs == sorted(rrfs, reverse=True)
