"""Byte-pair encoding: distributed trainer + Arrow-batched applier.

The training-data pipeline's real tokenizer (Sennrich et al. 2016, public),
replacing the "BPE-ish regex" pre-count in `llm_text` with learned merges:

- ``train_bpe`` — the classic frequency-table trainer re-expressed
  Spark-first. BPE never trains on the corpus; it trains on the WORD
  FREQUENCY TABLE (distinct word → count), which is what keeps it
  tractable at 100 TB: the corpus collapses to a vocabulary-sized relation
  in one distributed groupBy, optionally capped to the top-V words (a
  capped table changes counts only in the long tail, the standard
  practical concession). Each merge round is two small Spark jobs over
  that relation — a weighted pair count (map-side combined) and a
  re-segmentation of ONLY the words containing the winning pair. Driver
  state per round is exactly one (pair, count) row; total driver state is
  the n_merges merge list — model parameters, never data.

- ``apply_bpe`` — greedy lowest-rank-first merge application (the standard
  BPE encode) as ``mapInPandas``: the merge ranks broadcast to every
  worker, each Arrow batch encodes locally with a per-batch word cache
  (Zipf makes the cache hit rate high — each distinct word encodes once
  per batch).

Determinism: the winning pair each round is (max count, then
lexicographically smallest pair) — a total order, so the same corpus
always yields the same merge list on any cluster layout. Ties are real
(small corpora hit them constantly) and an undefined argmax would make
the tokenizer irreproducible.

No SQL oracle exists for an iterative trainer driven by argmax state —
the catalog entry is a DIAGNOSTICS query; correctness is pinned by parity
tests against a pure-Python reference implementation (tests/test_bpe.py)
plus round-trip and determinism properties.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# End-of-word marker, appended to each word's final symbol so merges never
# cross word boundaries and decoding can restore spacing (Sennrich §3.2).
EOW = "</w>"


def _word_counts(df: DataFrame, text_col: str, top_v: int | None) -> DataFrame:
    """(word, cnt) from whitespace tokens; optionally capped to the top_v
    most frequent words (deterministic tie-break on the word itself) via
    the distributed two-phase top-K — no global sort of the vocabulary."""
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    if top_v is None:
        return words
    # Two-phase top-K: per-partition top_v candidates, then one small sort.
    part_top = words.sortWithinPartitions(
        F.desc("cnt"), F.asc("word")
    ).mapInPandas(
        lambda it: _per_partition_head(it, top_v), schema="word string, cnt long"
    )
    return part_top.orderBy(F.desc("cnt"), F.asc("word")).limit(top_v)


def _per_partition_head(it: Iterator[pd.DataFrame], k: int) -> Iterator[pd.DataFrame]:
    left = k
    for pdf in it:
        if left <= 0:
            return
        out = pdf.head(left)
        left -= len(out)
        yield out


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    top_v: int | None = 8192,
    min_pair_count: int = 2,
    local_threshold: int = 65536,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus word-frequency
    table. Stops early when no pair reaches ``min_pair_count``. Returns the
    ordered merge list (rank = position).

    Two execution paths, identical results (pinned by
    tests/test_bpe.py::test_local_and_distributed_paths_agree):

    - ``top_v`` bounded and ≤ ``local_threshold``: ONE distributed
      groupBy + two-phase top-K collapses the corpus to its top-V word
      counts — bounded, driver-sized MODEL state by definition — and the
      merge rounds run locally over that dict. This removes the ~3
      small-job rounds × n_merges scheduling cost the distributed loop
      pays (measured: bpe_token_stats 7.5 s → corpus-pass-bound), which
      dominates at EVERY corpus size because the loop's input is always
      vocabulary-sized, never corpus-sized.
    - ``top_v=None`` (or past the threshold): the original distributed
      loop over the checkpointed vocab relation — the path for a truly
      unbounded vocabulary that may not fit one machine."""
    if top_v is not None and top_v <= local_threshold:
        wc = {
            r["word"]: r["cnt"] for r in _word_counts(df, text_col, top_v).collect()
        }
        return _train_bpe_local(wc, n_merges, min_pair_count)
    seg = _word_counts(df, text_col, top_v).select(
        "cnt",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW))).alias("syms"),
    )
    # The working relation is vocabulary-sized; keep it materialized so each
    # round's two jobs don't re-read/re-aggregate the corpus. localCheckpoint
    # (not cache) so round k+1's lineage doesn't chain through round k.
    seg = seg.coalesce(8).localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            seg.select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top or top[0]["n"] < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        merged = a + b
        has_pair = F.exists(
            F.zip_with(
                F.slice(F.col("syms"), 1, F.size("syms") - 1),
                F.slice(F.col("syms"), 2, F.size("syms") - 1),
                lambda x, y: (x == a) & (y == b),
            ),
            lambda v: v,
        )
        untouched = seg.filter(~has_pair)
        touched = seg.filter(has_pair).mapInPandas(
            _make_resegment(a, b, merged), schema="cnt long, syms array<string>"
        )
        # Coalesce before the checkpoint: unionAll concatenates the two
        # branches' partition lists, so without it the working relation
        # DOUBLES its partition count every round (2^n_merges scheduling
        # blowup — found as an apparent hang at 15 merges). The relation is
        # vocabulary-sized; 8 partitions is plenty at any corpus scale.
        seg = untouched.unionAll(touched).coalesce(8).localCheckpoint(eager=True)
    return merges


def _train_bpe_local(
    word_counts: dict[str, int], n_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """Merge rounds over a collected (word, cnt) dict — the exact
    semantics of the distributed loop (every adjacent pair occurrence
    counted, weighted by cnt; winner = max count then lexicographically
    smallest pair; greedy left-to-right resegmentation) on model-sized
    input. Python-side cost is O(n_merges × Σ|word|) over ≤top_v words."""
    seg = {w: list(w) + [EOW] for w in word_counts}
    merges: list[tuple[str, str]] = []
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
        merged = a + b
        for w, s in seg.items():
            if a not in s:  # cheap reject; resegment touches few words
                continue
            res, i, ln = [], 0, len(s)
            while i < ln:
                if i + 1 < ln and s[i] == a and s[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            seg[w] = res
    return merges


def _make_resegment(a: str, b: str, merged: str):
    def reseg(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_syms = []
            for syms in pdf["syms"]:
                res, i, n = [], 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out_syms.append(res)
            yield pd.DataFrame({"cnt": pdf["cnt"], "syms": out_syms})

    return reseg


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly merge the lowest-rank
    adjacent pair (the reference algorithm; also the pure-Python oracle the
    tests compare the trainer's segmentation against)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col`` (array<string> of BPE tokens for the whole text).
    Arrow-batched mapInPandas; the merge ranks ride the closure (broadcast
    once per executor), and a per-batch word cache collapses Zipf-repeated
    words to one encode each."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, {out_col} array<string>"

    def enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc_text(text: str) -> list[str]:
            out: list[str] = []
            for w in text.split(" "):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, ranks)
                out.extend(got)
            return out

        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = [enc_text(t) for t in pdf[text_col]]
            yield pdf

    return df.mapInPandas(enc, schema=schema)
