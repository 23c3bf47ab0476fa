"""Corpus refinement: the step AFTER detection — act on what the dedup and
quality layers found (SURVEY §7.4 dedup family; BASELINE.json LLM-pipeline
operators).

The detection queries (exact_substring_spans, near_dup_clusters,
unigram_logprob_scores) REPORT; a production curation pipeline then has to
REWRITE the corpus: cut the duplicated passages out of the text, pick one
canonical survivor per near-dup family, and route each document into a
quality tier. These three queries close that loop, each certified
value-for-value against a DuckDB re-derivation:

- exact_substring_removal (+ _incremental) — Lee et al. 2022's "dedup by
  removing the repeated substring" variant: reassemble each document's
  text WITHOUT its duplicated spans and certify the cleaned text
  byte-for-byte via md5; the incremental twin rewrites a new batch against
  the persisted gram store at batch cost.
- ccnet_perplexity_buckets — CCNet's head/middle/tail split (Wenzek et al.
  2020), per language, by unigram-LM score terciles (value-thresholded).
- lang_quality_deciles — the equal-population companion: exact SQL
  NTILE(10) per language on the partitioned distributed rank.
- dedup_keep_best — canonical-survivor selection per near-dup cluster by
  quality score (the policy real pipelines use instead of "keep min id").

`python -m importer_spark refine` composes these into the corpus-rewriting
front door (__main__.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from importer_spark.io import Tables
from importer_spark.operators.dedup import near_dup_pairs, remove_duplicate_spans
from importer_spark.operators.text import tokens
from importer_spark.queries.registry import query

# ---------------------------------------------------------------------------
# exact_substring_removal
# ---------------------------------------------------------------------------
# The spans CTE chain is the certified exact_substring_spans derivation
# (llm_dedup._SUBSTR_DEDUP_SQL); this oracle extends it through the actual
# text surgery: positions not covered by any span, re-joined in order.
_REMOVAL_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, i - 1 AS pos, md5(array_to_string(t[i:i+7], ' ')) AS gram_key
  FROM d, LATERAL (SELECT unnest(range(1, len(t) - 6)) AS i) r
  WHERE len(t) >= 8
),
dup AS (SELECT gram_key FROM grams GROUP BY gram_key HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (SELECT doc_id, pos FROM grams JOIN dup USING (gram_key)),
lagged AS (SELECT doc_id, pos,
  LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM hits),
isl AS (SELECT doc_id, pos,
  SUM(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
    OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
  FROM lagged),
spans AS (SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 7 AS e
          FROM isl GROUP BY doc_id, island),
pos AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS i FROM d),
kept AS (
  SELECT p.doc_id, p.i FROM pos p
  WHERE NOT EXISTS (SELECT 1 FROM spans sp
                    WHERE sp.doc_id = p.doc_id
                      AND sp.s <= p.i - 1 AND p.i - 1 <= sp.e)
),
clean AS (
  SELECT k.doc_id, COUNT(*) AS kn,
         string_agg(d.t[k.i], ' ' ORDER BY k.i) AS ct
  FROM kept k JOIN d ON d.doc_id = k.doc_id
  GROUP BY k.doc_id
)
SELECT d2.doc_id,
  CAST(len(string_split(d2.text, ' ')) AS BIGINT) AS n_tokens,
  CAST(len(string_split(d2.text, ' ')) - COALESCE(c.kn, 0) AS BIGINT)
    AS removed_tokens,
  CASE WHEN d2.text IS NULL THEN NULL
       ELSE CAST(COALESCE(c.kn, 0) AS BIGINT) END AS clean_n_tokens,
  CASE WHEN d2.text IS NULL THEN NULL
       ELSE md5(COALESCE(c.ct, '')) END AS clean_hash
FROM documents d2 LEFT JOIN clean c USING (doc_id)
"""


@query("exact_substring_removal", oracle=_REMOVAL_SQL)
def exact_substring_removal(spark, sf_dir):
    """ExactSubstr REMOVAL (Lee et al. 2022 §4.1 "we remove the duplicated
    substring"): rebuild every document's text without its duplicated spans
    and certify the surgery itself — `clean_hash` is md5 of the re-joined
    cleaned text, so the two engines must agree on every kept byte, not
    just on counts.

    The surgery itself is `operators/dedup.py::remove_duplicate_spans`
    (plan shape documented there: the span derivation's one shuffle, a
    sparse span-array join back, one JVM higher-order-function pass per
    doc); this query rolls its output up to certifiable counts + the
    cleaned-text hash."""
    t = Tables(spark, sf_dir)
    cleaned = remove_duplicate_spans(t.documents, "doc_id", "text", n=8, min_docs=2)
    n_tokens = F.size(tokens(F.col("text"))).cast("bigint")
    return cleaned.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        (n_tokens - F.col("clean_n_tokens")).cast("bigint").alias("removed_tokens"),
        "clean_n_tokens",
        F.md5("clean_text").alias("clean_hash"),
    )


_REMOVAL_INCR_SQL = _REMOVAL_SQL.replace(
    "FROM documents d2 LEFT JOIN clean c USING (doc_id)",
    "FROM documents d2 LEFT JOIN clean c USING (doc_id)\nWHERE d2.doc_id % 5 = 0",
)


@query("exact_substring_removal_incremental", oracle=_REMOVAL_INCR_SQL)
def exact_substring_removal_incremental_q(spark, sf_dir):
    """Incremental ExactSubstr removal: docs with doc_id % 5 == 0 play the
    NEW daily batch, the rest are the indexed corpus represented ONLY by
    its persisted gram store — only the batch tokenizes and only the batch
    is rewritten, at one store-probe equi-join (the
    exact_substring_spans_incremental contract, carried through the text
    surgery). The oracle is the FULL-corpus removal restricted to batch
    docs: agreement proves the store-probed path cuts exactly the bytes
    the full computation would, certified via the cleaned-text md5."""
    from importer_spark.operators.dedup import (
        ngram_store,
        remove_duplicate_spans_incremental,
    )

    t = Tables(spark, sf_dir)
    is_new = F.col("doc_id") % 5 == 0
    store = ngram_store(t.documents.filter(~is_new), "doc_id", "text")
    cleaned, _delta = remove_duplicate_spans_incremental(
        t.documents.filter(is_new), store, "doc_id", "text"
    )
    n_tokens = F.size(tokens(F.col("text"))).cast("bigint")
    return cleaned.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        (n_tokens - F.col("clean_n_tokens")).cast("bigint").alias("removed_tokens"),
        "clean_n_tokens",
        F.md5("clean_text").alias("clean_hash"),
    )


# ---------------------------------------------------------------------------
# ccnet_perplexity_buckets
# ---------------------------------------------------------------------------
# The scoring CTE chain is the certified unigram_logprob_scores derivation
# (llm_text._UNIGRAM_LM_SQL); buckets come from per-language exact tercile
# THRESHOLDS, not a row-number NTILE — see the query docstring for why.
_BUCKETS_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
tot AS (SELECT SUM(cnt) AS total FROM vocab),
lp AS (
  SELECT tok,
    CAST(ROUND(ln(cnt::DOUBLE / total), 9) AS DECIMAL(18,9)) AS lp
  FROM vocab, tot
),
per AS (
  SELECT t.doc_id, COUNT(*) AS n_tokens, SUM(l.lp) AS s
  FROM tok t JOIN lp l USING (tok)
  GROUP BY t.doc_id
),
scored AS (
  SELECT p.doc_id, d.lang,
    ROUND(CAST(p.s AS DOUBLE) / p.n_tokens, 6) AS avg_logprob
  FROM per p JOIN documents d USING (doc_id)
),
cuts AS (
  SELECT lang,
    percentile_cont(1.0/3.0) WITHIN GROUP (ORDER BY avg_logprob) AS q1,
    percentile_cont(2.0/3.0) WITHIN GROUP (ORDER BY avg_logprob) AS q2
  FROM scored GROUP BY lang
)
SELECT s.doc_id, s.lang, s.avg_logprob,
  CASE WHEN s.avg_logprob >= c.q2 THEN 'head'
       WHEN s.avg_logprob >= c.q1 THEN 'middle'
       ELSE 'tail' END AS bucket
FROM scored s JOIN cuts c ON s.lang IS NOT DISTINCT FROM c.lang
"""


@query("ccnet_perplexity_buckets", oracle=_BUCKETS_SQL)
def ccnet_perplexity_buckets(spark, sf_dir):
    """CCNet head/middle/tail quality tiers (Wenzek et al. 2020): per
    language, split documents into thirds by LM score (here the certified
    unigram corpus LM — higher avg log-prob = more fluent = "head").

    Deliberately VALUE-thresholded, not row-numbered: per-lang exact
    tercile cut points come out of ONE aggregation (a lang-count-sized
    relation that broadcasts back), and each doc's tier is a comparison
    against its language's cuts — no per-language global sort, which at
    100 TB would funnel the dominant language through one task (the
    single-task-window anti-pattern operators/ranks.py exists to avoid).
    Ties on the cut value land in the same tier on both engines because
    scores are pre-rounded to 1e-6 while an interpolated cut is either
    exactly a data value or >= ~3e-7 away from every data value — orders of
    magnitude beyond cross-engine FP noise (~1e-16)."""
    t = Tables(spark, sf_dir)
    from importer_spark.queries.llm_text import unigram_logprob_scores

    scored = unigram_logprob_scores(spark, sf_dir).select("doc_id", "avg_logprob")
    # The scored relation feeds TWO consumers (the cuts aggregation and the
    # bucketing probe). Measured at 50x (100k docs): the whole query runs
    # at ~1x the standalone unigram query's cost (18.2 s vs 19.8 s), i.e.
    # the scoring exchanges ARE reused across the branches at runtime —
    # a localCheckpoint here was tried and bought nothing (18.2 s either
    # way), so the query stays fully declarative/plan-visible.
    labeled = scored.join(t.documents.select("doc_id", "lang"), "doc_id")
    from importer_spark.operators.text import value_tercile_buckets

    return value_tercile_buckets(labeled, ["lang"], "avg_logprob").select(
        "doc_id", "lang", "avg_logprob", "bucket"
    )


# ---------------------------------------------------------------------------
# dedup_keep_best
# ---------------------------------------------------------------------------
_QUALITY_CTE = """
, qb AS (
  SELECT doc_id,
    len(string_split(text, ' ')) AS n_tokens,
    len(list_distinct(string_split(text, ' '))) AS n_unique,
    length(text) AS n_chars
  FROM documents
),
q AS (
  SELECT doc_id,
    ROUND(
      LEAST(100.0, n_tokens / 5.0) * 0.4
      + (n_unique::DOUBLE / NULLIF(n_tokens, 0)) * 100.0 * 0.4
      + LEAST(100.0, (n_chars::DOUBLE / NULLIF(n_tokens, 0)) * 10.0) * 0.2, 6)
      AS quality_score
  FROM qb
)
"""


def _keep_best_sql() -> str:
    from importer_spark.queries.llm_dedup import _index_pairs_cte

    return (
        _index_pairs_cte().replace("WITH d AS", "WITH RECURSIVE d AS", 1)
        + """,
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
),
labels AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id)
"""
        + _QUALITY_CTE
        + """
SELECT l.doc_id, l.cluster_id,
  COUNT(*) OVER (PARTITION BY l.cluster_id) AS cluster_size,
  q.quality_score,
  ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                     ORDER BY q.quality_score DESC, l.doc_id) = 1 AS is_kept
FROM labels l JOIN q USING (doc_id)
"""
    )


@query("dedup_keep_best", oracle=_keep_best_sql())
def dedup_keep_best(spark, sf_dir):
    """Canonical-survivor selection: within each near-dup cluster keep the
    HIGHEST-QUALITY document (quality-score policy, doc_id tiebreak) — what
    production dedup actually deletes by, instead of near_dup_clusters'
    neutral "min doc_id" label. Composes three certified layers (LSH pairs
    → connected components → quality scores) into the delete decision, and
    the oracle re-derives all three (exact-Jaccard index pairs → recursive
    closure → quality formula) so agreement certifies the composition.

    Scale shape: the survivor pick is a row_number window partitioned by
    cluster_id — dedup families are small (bounded by real duplication),
    so partitions stay tiny no matter the corpus; no global sort. The
    quality join is doc_id-keyed on the cluster-member subset only."""
    from importer_spark.operators.graph import connected_components
    from importer_spark.operators.text import quality_score

    t = Tables(spark, sf_dir)
    pairs = near_dup_pairs(t.wide("documents"), "doc_id", "text")
    labels = connected_components(pairs, out_id="doc_id")
    # Score ONLY cluster members (r11): the output joins quality onto the
    # member set anyway, and labels is already materialized by
    # connected_components, so a semi-join prune pushes the per-doc
    # split/distinct quality arithmetic down to members — at 100 TB the
    # member set is bounded by real duplication, not corpus size (guide
    # §2.3: project/filter before the heavy work). Same certified formula
    # (operators/text.quality_score), identical per-row values.
    # Explicit broadcast: labels hangs off a checkpointed RDD whose size
    # Catalyst cannot estimate, so the semi-join otherwise degrades to a
    # sort-merge (measured: +2 exchanges, 2.9 s vs 2.6 s). The member-id
    # list is the classic broadcastable key set of guide §3.2.
    quality = (
        t.documents.join(F.broadcast(labels.select("doc_id")), "doc_id", "left_semi")
        .select("doc_id", quality_score(F.col("text")).alias("quality_score"))
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc(), F.col("doc_id")
    )
    return (
        labels.join(quality, "doc_id")
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            "quality_score",
            (F.row_number().over(w) == 1).alias("is_kept"),
        )
    )


# Decile SQL reuses the certified scoring chain (everything before cuts).
_SCORED_CTES = _BUCKETS_SQL[: _BUCKETS_SQL.index(",\ncuts AS")]

_DECILES_SQL = (
    _SCORED_CTES
    + """
SELECT doc_id, lang, avg_logprob,
  NTILE(10) OVER (PARTITION BY lang ORDER BY avg_logprob DESC, doc_id)
    AS decile
FROM scored
"""
)


@query("lang_quality_deciles", oracle=_DECILES_SQL)
def lang_quality_deciles(spark, sf_dir):
    """Per-language quality DECILES by LM score — exact SQL NTILE(10)
    semantics (rank-based, uneven-bucket rule), the companion to
    `ccnet_perplexity_buckets`' value-thresholded tiers when a pipeline
    needs equal-population slices (decile-capped sampling, per-decile
    loss analysis).

    This is the dominant-group regime on REAL data — one language holds
    most of the corpus, so `Window.partitionBy(lang)` would funnel it
    through a single task. The ranking runs on
    `operators/ranks.py::grouped_row_number` instead: per-language
    quantile cuts, per-(language, bucket) parallel windows, a
    languages×buckets offset relation — and the oracle is the plain
    partitioned-window NTILE, so value parity certifies the decomposition
    under a skewed key. Ties on the rounded-6 score share a bucket and
    break by doc_id on both engines."""
    from importer_spark.operators.ranks import ntile_col, with_grouped_rank_stats
    from importer_spark.queries.llm_text import unigram_logprob_scores

    t = Tables(spark, sf_dir)
    scored = unigram_logprob_scores(spark, sf_dir).select("doc_id", "avg_logprob")
    labeled = scored.join(t.documents.select("doc_id", "lang"), "doc_id")
    ranked = with_grouped_rank_stats(
        labeled,
        ["lang"],
        "avg_logprob",
        [F.col("avg_logprob").desc(), F.col("doc_id").asc()],
        first_col_ascending=False,
        materialize=False,  # r11 A/B: 1.35 s vs 1.53 s materialized — the
        # LM-scoring upstream shares its exchange across branches already
    )
    return ranked.select(
        "doc_id", "lang", "avg_logprob", ntile_col(10).alias("decile")
    )


# ---------------------------------------------------------------------------
# segment_dedup_removal — CCNet paragraph-hash dedup as a corpus rewrite
# ---------------------------------------------------------------------------
_SEG_W = 16

_SEG_DEDUP_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents WHERE text IS NOT NULL
),
segs AS (
  SELECT doc_id, t, UNNEST(range(0, (n + {_SEG_W - 1}) // {_SEG_W})) AS seg
  FROM toks
),
h AS (
  SELECT doc_id, seg,
    array_to_string(list_slice(t, seg*{_SEG_W} + 1, seg*{_SEG_W} + {_SEG_W}), ' ')
      AS seg_text,
    len(list_slice(t, seg*{_SEG_W} + 1, seg*{_SEG_W} + {_SEG_W})) AS seg_tokens
  FROM segs
),
r AS (
  SELECT doc_id, seg, seg_text, seg_tokens,
    ROW_NUMBER() OVER (PARTITION BY md5(seg_text) ORDER BY doc_id, seg) AS rk
  FROM h
)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_segments,
  CAST(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS removed_segments,
  CAST(SUM(CASE WHEN rk = 1 THEN seg_tokens ELSE 0 END) AS BIGINT)
    AS clean_n_tokens,
  md5(COALESCE(
    string_agg(CASE WHEN rk = 1 THEN seg_text END, ' ' ORDER BY seg), ''))
    AS clean_hash
FROM r GROUP BY doc_id
"""


@query("segment_dedup_removal", oracle=_SEG_DEDUP_SQL)
def segment_dedup_removal(spark, sf_dir):
    """CCNet-style corpus-level segment dedup AS A REWRITE (Wenzek et al.
    2020 §3.1 dedups paragraph hashes corpus-wide, keeping the first
    occurrence; on this newline-free token corpus the paragraph analog is
    fixed {_SEG_W}-token disjoint segments): every segment whose exact
    text occurred earlier in the corpus — first occurrence = min
    (doc_id, seg) over the segment md5 — is cut, each document's text is
    rebuilt from its kept segments in order, and `clean_hash` (md5 of the
    rebuilt text) certifies the surgery byte-for-byte across engines.
    Complements the detect→rewrite loop the gram family already has
    (exact_substring_spans → exact_substring_removal): this is the
    COARSE-grained rewrite real pipelines run first — cheap, alignment-
    based, one hash per segment — before the O(n·grams) fine-grained
    pass.

    Distributed shape (`operators/dedup.dedup_segments`): narrow
    segmenting, first-occurrence via min-struct hash agg + md5 equi-join
    back (never a corpus-sized window over the md5 — boilerplate
    segments shared by millions of docs partial-aggregate instead of
    landing in one window partition), one groupBy(doc_id) rebuild. The
    oracle keeps the definitional ROW_NUMBER formulation — parity
    certifies the agg+join rewrite."""
    from importer_spark.operators.dedup import dedup_segments

    t = Tables(spark, sf_dir)
    out = dedup_segments(t.documents, "doc_id", "text", width=_SEG_W)
    return out.select(
        "doc_id",
        "n_segments",
        "removed_segments",
        "clean_n_tokens",
        F.md5("clean_text").alias("clean_hash"),
    )


_SEG_DEDUP_INCR_SQL = _SEG_DEDUP_SQL.replace(
    "FROM r GROUP BY doc_id",
    "FROM r WHERE doc_id % 5 = 0 GROUP BY doc_id",
)


@query("segment_dedup_removal_incremental", oracle=_SEG_DEDUP_INCR_SQL)
def segment_dedup_removal_incremental(spark, sf_dir):
    """Incremental segment-dedup rewrite: docs with doc_id % 5 == 0 play
    the NEW daily batch, the rest are the already-segmented corpus
    represented ONLY by its persisted `operators/dedup.segment_store`
    (one (md5 → first (doc, seg)) row per distinct segment — a MIN
    monoid, so production batches fold in with one merge and the store
    never re-reads the corpus). The oracle is the full-corpus answer
    restricted to batch docs — agreement proves the probe path returns
    EXACTLY the batch slice of `segment_dedup_removal`'s answer at
    batch-probe cost, the same contract the gram / band / chunk /
    embedding stores carry (this completes the incremental QUINTET: one
    per dedup modality). Bucket the store by pmod(_h, B) in production
    so batch probes prune to touched buckets."""
    from importer_spark.operators.dedup import (
        dedup_segments_incremental,
        segment_store,
    )

    t = Tables(spark, sf_dir)
    is_new = F.col("doc_id") % 5 == 0
    store = segment_store(
        t.documents.filter(~is_new), "doc_id", "text", width=_SEG_W
    )  # persisted in production
    out = dedup_segments_incremental(
        t.documents.filter(is_new), store, "doc_id", "text", width=_SEG_W
    )
    return out.select(
        "doc_id",
        "n_segments",
        "removed_segments",
        "clean_n_tokens",
        F.md5("clean_text").alias("clean_hash"),
    )
