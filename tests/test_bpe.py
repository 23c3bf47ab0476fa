"""BPE trainer/applier correctness: parity with a pure-Python reference
implementation of Sennrich et al. 2016, round-trip, and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from importer_spark.operators.bpe import EOW, apply_bpe, encode_word, train_bpe
from tests.conftest import SF_DIR


# --- pure-Python reference trainer (the paper's algorithm, verbatim) ----


def ref_train_bpe(word_counts: dict[str, int], n_merges: int, min_pair_count: int = 2):
    seg = {w: list(w) + [EOW] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for w, c in word_counts.items():
            s = seg[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + c
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
        merges.append((a, b))
        for w, s in seg.items():
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            seg[w] = res
    return merges, seg


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "new new nest nest lowest",
]


def _corpus_df(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "id long, text string")


def _word_counts() -> dict[str, int]:
    wc: dict[str, int] = {}
    for line in CORPUS:
        for w in line.split(" "):
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_train_matches_pure_python_reference(spark):
    got = train_bpe(_corpus_df(spark), "text", n_merges=15, top_v=None)
    want, _ = ref_train_bpe(_word_counts(), 15)
    assert got == want


def test_encode_reproduces_trainer_segmentation(spark):
    merges = train_bpe(_corpus_df(spark), "text", n_merges=12, top_v=None)
    _, seg = ref_train_bpe(_word_counts(), 12)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, want in seg.items():
        assert encode_word(w, ranks) == want, w


def test_train_is_deterministic(spark):
    m1 = train_bpe(_corpus_df(spark), "text", n_merges=10, top_v=None)
    m2 = train_bpe(_corpus_df(spark), "text", n_merges=10, top_v=None)
    assert m1 == m2 and len(m1) == 10


def test_apply_bpe_round_trips(spark):
    df = _corpus_df(spark)
    merges = train_bpe(df, "text", n_merges=10, top_v=None)
    out = apply_bpe(df, "text", merges).collect()
    assert len(out) == len(CORPUS)
    for row in out:
        rebuilt = "".join(row["bpe_tokens"]).replace(EOW, " ").rstrip()
        assert rebuilt == row["text"]
        # merged symbols actually appear (not character-exploded output)
        assert len(row["bpe_tokens"]) < len(row["text"].replace(" ", "")) + len(
            row["text"].split(" ")
        )


def test_vocab_cap_changes_only_tail(spark):
    # top_v larger than the vocab is a no-op vs uncapped
    m_cap = train_bpe(_corpus_df(spark), "text", n_merges=8, top_v=1000)
    m_all = train_bpe(_corpus_df(spark), "text", n_merges=8, top_v=None)
    assert m_cap == m_all


def test_bpe_on_documents_table(spark):
    from importer_spark.io import Tables

    docs = Tables(spark, SF_DIR).documents.limit(200)
    merges = train_bpe(docs, "text", n_merges=16, top_v=2048)
    assert len(merges) >= 1
    out = apply_bpe(docs.select("doc_id", "text"), "text", merges)
    row = out.select(
        F.count("*").alias("n"),
        F.sum(F.size("bpe_tokens")).alias("total_toks"),
    ).collect()[0]
    assert row["n"] == 200 and row["total_toks"] > 0


def test_local_and_distributed_paths_agree(spark):
    """r7: a bounded top_v runs the merge rounds locally over the collected
    word-count dict; forcing the distributed loop (local_threshold=0) on
    the SAME capped vocabulary must yield the identical merge list."""
    local = train_bpe(_corpus_df(spark), "text", n_merges=12, top_v=1000)
    dist = train_bpe(
        _corpus_df(spark), "text", n_merges=12, top_v=1000, local_threshold=0
    )
    assert local == dist
