"""Text-analysis queries over the documents table (BASELINE.json LLM-pipeline
operators: language-ID, quality scoring, token counting, fingerprinting).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from importer_spark.io import Tables
from importer_spark.operators.text import (
    LANG_PRECEDENCE,
    STOPWORDS,
    lang_predict,
    lang_scores,
    normalize_text,
    simhash32,
    simhash_prefix_long,
    tokens,
)
from importer_spark.queries.registry import query

_TOKEN_STATS_SQL = r"""
SELECT
  doc_id,
  length(text) AS n_chars_actual,
  len(string_split(text, ' ')) AS n_tokens,
  len(regexp_extract_all(text, '\w+')) AS n_word_tokens,
  len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
  ROUND(len(list_distinct(string_split(text, ' ')))::DOUBLE
        / NULLIF(len(string_split(text, ' ')), 0), 6) AS unique_ratio,
  ROUND((length(text) - len(string_split(text, ' ')) + 1)::DOUBLE
        / NULLIF(len(string_split(text, ' ')), 0), 6) AS avg_token_len
FROM documents
"""


@query("text_token_stats", oracle=_TOKEN_STATS_SQL)
def text_token_stats(spark, sf_dir):
    """Token counting: whitespace split + regex word tokens (the BPE-ish
    pre-count every training-data pipeline needs). Narrow projection — no
    shuffle, fully codegen'd."""
    t = Tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    return t.documents.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        n_tok.alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\w+"), F.lit(0))).alias(
            "n_word_tokens"
        ),
        n_uniq.alias("n_unique_tokens"),
        F.round(n_uniq.cast("double") / F.nullif(n_tok, F.lit(0)), 6).alias("unique_ratio"),
        F.round(
            (F.length("text") - n_tok + 1).cast("double") / F.nullif(n_tok, F.lit(0)), 6
        ).alias("avg_token_len"),
    )


def _lang_sql() -> str:
    score_cols = ",\n  ".join(
        "len(list_filter(string_split(text, ' '), x -> x IN ({}))) AS score_{}".format(
            ", ".join(f"'{w}'" for w in ws), lang
        )
        for lang, ws in STOPWORDS.items()
    )
    g = "greatest({})".format(", ".join(f"score_{lang}" for lang in LANG_PRECEDENCE))
    case = "CASE WHEN {} = 0 THEN 'unknown' {} ELSE 'unknown' END".format(
        g,
        " ".join(f"WHEN score_{lang} = {g} THEN '{lang}'" for lang in LANG_PRECEDENCE),
    )
    return f"""
WITH scored AS (SELECT doc_id, lang, {score_cols} FROM documents)
SELECT doc_id, lang AS labeled_lang,
  score_en, score_de, score_es, score_fr, score_zh,
  {case} AS predicted_lang,
  ({case}) = lang AS agrees_with_label
FROM scored
"""


@query("lang_id", oracle=_lang_sql())
def lang_id(spark, sf_dir):
    """Language-ID by stopword-hit scoring with deterministic tie precedence
    (n-gram heuristic; SURVEY §7.4). The testdata's lang column is a label —
    agreement is reported, not assumed."""
    t = Tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    scores = lang_scores(toks)
    scored = t.documents.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_PRECEDENCE],
    )
    rescored = {lang: F.col(f"score_{lang}") for lang in LANG_PRECEDENCE}
    pred = lang_predict(rescored)
    return scored.select(
        "*",
        pred.alias("predicted_lang"),
        (pred == F.col("labeled_lang")).alias("agrees_with_label"),
    )


_QUALITY_SQL = """
WITH base AS (
  SELECT doc_id, lang,
    len(string_split(text, ' ')) AS n_tokens,
    len(list_distinct(string_split(text, ' '))) AS n_unique,
    length(text) AS n_chars,
    len(list_filter(string_split(text, ' '),
        x -> x IN ('the', 'a', 'of', 'and'))) AS n_stopwords
  FROM documents
)
SELECT doc_id, lang, n_tokens,
  ROUND(n_unique::DOUBLE / NULLIF(n_tokens, 0), 6) AS diversity,
  ROUND(n_stopwords::DOUBLE / NULLIF(n_tokens, 0), 6) AS stopword_ratio,
  ROUND(
    LEAST(100.0, n_tokens / 5.0) * 0.4
    + (n_unique::DOUBLE / NULLIF(n_tokens, 0)) * 100.0 * 0.4
    + LEAST(100.0, (n_chars::DOUBLE / NULLIF(n_tokens, 0)) * 10.0) * 0.2, 6)
    AS quality_score,
  n_tokens BETWEEN 50 AND 1000
    AND (n_unique::DOUBLE / NULLIF(n_tokens, 0)) > 0.05 AS passes_filter
FROM base
"""


@query("doc_quality_scores", oracle=_QUALITY_SQL)
def doc_quality_scores(spark, sf_dir):
    """Quality scoring: length / diversity / stopword-ratio composite with a
    keep-drop gate — the standard pre-training corpus filter shape."""
    t = Tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    base = t.documents.select(
        "doc_id",
        "lang",
        "text",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.size(F.filter(toks, lambda x: x.isin("the", "a", "of", "and"))).alias(
            "n_stopwords"
        ),
    )
    from importer_spark.operators.text import quality_score

    nt = F.col("n_tokens")
    diversity = F.col("n_unique").cast("double") / F.nullif(nt, F.lit(0))
    return base.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.round(diversity, 6).alias("diversity"),
        F.round(F.col("n_stopwords").cast("double") / F.nullif(nt, F.lit(0)), 6).alias(
            "stopword_ratio"
        ),
        # the composite lives in operators/text.quality_score (ONE copy of
        # the certified formula, shared with dedup_keep_best and refine)
        quality_score(F.col("text")).alias("quality_score"),
        (nt.between(50, 1000) & (diversity > 0.05)).alias("passes_filter"),
    )


_FINGERPRINT_SQL = """
SELECT
  doc_id,
  md5(text) AS content_hash,
  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS normalized_hash,
  md5(substr(text, 1, 64)) AS prefix_hash,
  substr(md5(text), 1, 8) AS short_fingerprint
FROM documents
"""


@query("doc_fingerprints", oracle=_FINGERPRINT_SQL)
def doc_fingerprints(spark, sf_dir):
    """Document fingerprinting: full, normalized, and prefix hashes (the
    cheap first pass before MinHash; reference X3-style normalization).

    Known engine-semantics boundary (Unicode gate, one_to_many_case
    class): `normalized_hash` lowercases the text first, and the JVM's
    FULL case mapping (İ → 'i'+U+0307; ß, ﬁ preserved) differs from
    DuckDB's utf8proc simple map on exactly those codepoints, so the md5s
    diverge on documents containing them. Routed via run_local_gate
    `--boundary doc_fingerprints=values~in \\['normalized_hash'\\]~…`;
    content/prefix hashes (no case mapping) stay engine-identical."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.md5("text").alias("content_hash"),
        F.md5(normalize_text(F.col("text"))).alias("normalized_hash"),
        F.md5(F.substring("text", 1, 64)).alias("prefix_hash"),
        F.substring(F.md5("text"), 1, 8).alias("short_fingerprint"),
    )


def _simhash_sql() -> str:
    sums = ",\n    ".join(
        "SUM(CASE WHEN ((strpos('0123456789abcdef', substr(m, {pos}, 1)) - 1) >> {sh}) & 1 = 1 "
        "THEN 1 ELSE -1 END) AS s{b}".format(pos=b // 4 + 1, sh=3 - b % 4, b=b)
        for b in range(32)
    )
    recombine = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(32))
    return f"""
WITH tok AS (
  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS m FROM documents
),
bits AS (
  SELECT doc_id,
    {sums}
  FROM tok GROUP BY doc_id
)
SELECT doc_id, CAST({recombine} AS BIGINT) AS simhash FROM bits
"""


@query("simhash_fingerprints", oracle=_simhash_sql())
def simhash_fingerprints(spark, sf_dir):
    """SimHash (32-bit): per-token md5 bits vote ±1, sign becomes the bit —
    near-dup docs land within small Hamming distance. Explode + 32
    conditional sums: one shuffle on doc_id; bit decoding via hex-char strpos
    so the arithmetic is portable (no 64-bit overflow semantics)."""
    t = Tables(spark, sf_dir)
    tok = t.wide("documents").select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    ).select("doc_id", simhash_prefix_long(F.md5("tok")).alias("m"))
    bits = tok.groupBy("doc_id").agg(
        *[F.sum(simhash32(F.col("m"), b)).alias(f"s{b}") for b in range(32)]
    )
    acc = F.lit(0).cast("bigint")
    for b in range(32):
        acc = acc + F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(0)
    return bits.select("doc_id", acc.cast("bigint").alias("simhash"))


_WIN_K = 3  # words per gram
_WIN_W = 4  # grams per winnowing window

_WINNOW_SQL = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
          WHERE text IS NOT NULL),
h AS (
  SELECT doc_id,
    CASE WHEN len(t) >= {_WIN_K}
      THEN [md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])
            for i in range(1, len(t) - {_WIN_K - 2})]
      ELSE [md5(array_to_string(t, ' '))]
    END AS hs
  FROM d
),
sel AS (
  SELECT doc_id, len(hs) AS n_grams,
    list_distinct([list_aggregate(hs[i:i+{_WIN_W - 1}], 'min')
                   for i in range(1, greatest(len(hs) - {_WIN_W - 1}, 1) + 1)]) AS fps
  FROM h
)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
  CAST(len(fps) AS BIGINT) AS n_fingerprints,
  md5(array_to_string(list_sort(fps), ',')) AS fp_digest
FROM sel
"""


@query("doc_winnowing_fingerprints", oracle=_WINNOW_SQL)
def doc_winnowing_fingerprints(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
    the rolling-hash local fingerprinting scheme): hash every 3-word gram,
    keep the MINIMUM hash of each sliding window of 4 gram hashes, distinct
    the selections. Any shared substring of ≥ w+k−1 words between two docs
    guarantees a shared fingerprint (the winnowing guarantee, property-
    tested on the planted near-dups). Spark shape: the gram-hash stream
    and the rolling window minima are per-document ARRAY transforms
    (transform(sequence) + array_min(slice)) in ONE codegen stage over
    the scan — no explode, no window, ZERO shuffles at any corpus size
    (the r9 form exploded the token stream and paid an exchange + sort on
    doc_id for the lead/rolling-min windows plus a second scan for short
    docs). Positions are the sequence indices, so the w-window min over
    adjacent grams is slice(hs, i, w) directly; the short-doc branch is a
    CASE, not a union. The output digests the fingerprint set so the
    relation stays one row per doc."""
    t = Tables(spark, sf_dir)
    # 0-based SQL array indexing: gram at 1-based start i covers tokens
    # t[i-1] .. t[i+k-2]; i ranges over 1 .. n-k+1 so every index exists.
    gram_parts = ", ".join(f"t[i + {j - 1}]" for j in range(_WIN_K))
    hs = (
        f"CASE WHEN size(t) >= {_WIN_K} THEN "
        f"transform(sequence(1, size(t) - {_WIN_K - 1}), "
        f"i -> md5(concat_ws(' ', {gram_parts}))) "
        f"ELSE array(md5(text)) END"
    )
    # window-start indices 1 .. max(n_grams - w + 1, 1); slice() clamps to
    # the array end, so a doc with fewer than w grams yields one window
    # over all of them — the oracle's greatest(len(hs) - w + 1, 1) twin
    fps = (
        f"array_distinct(transform("
        f"sequence(1, greatest(size(hs) - {_WIN_W - 1}, 1)), "
        f"i -> array_min(slice(hs, i, {_WIN_W}))))"
    )
    return (
        t.wide("documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text", F.split("text", " ").alias("t"))
        .select("doc_id", F.expr(hs).alias("hs"))
        .select("doc_id", F.size("hs").alias("n_grams"), F.expr(fps).alias("fps"))
        .select(
            "doc_id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.size("fps").cast("bigint").alias("n_fingerprints"),
            F.md5(F.concat_ws(",", F.array_sort("fps"))).alias("fp_digest"),
        )
    )


_SIMHASH_HAM_K = 3  # 4 bands × 8 bits: hamming ≤ 3 ⇒ ≥1 band equal (pigeonhole)

_SIMHASH_PAIRS_SQL = f"""
WITH sh AS ({{base}}),
bands AS (
  SELECT doc_id, simhash, b.band, (simhash >> (8 * b.band)) & 255 AS band_val
  FROM sh, (SELECT UNNEST(range(4)) AS band) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, a.simhash AS ha, c.doc_id AS id_b, c.simhash AS hb
  FROM bands a JOIN bands c
    ON a.band = c.band AND a.band_val = c.band_val AND a.doc_id < c.doc_id
)
SELECT id_a, id_b,
  CAST(bit_count(CAST(xor(ha, hb) AS BIGINT)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(CAST(xor(ha, hb) AS BIGINT)) <= {_SIMHASH_HAM_K}
"""


# Production dial values (r9 verdict #1): the bucket cap + SNM window are
# read at IMPORT time (the margin-planes convention in llm_similarity) so
# the Spark plan and the oracle SQL baked at registration can never
# disagree about the dial — a per-call env read could desync the two
# engines between registration and execution.
_SH_CAP = int(os.environ.get("SPARK_GRAFT_SIMHASH_BUCKET_CAP", "64"))
_SH_SNM = int(os.environ.get("SPARK_GRAFT_SIMHASH_SNM_WINDOW", "8"))
if _SH_CAP < 1:
    raise ValueError(f"SPARK_GRAFT_SIMHASH_BUCKET_CAP must be >= 1, got {_SH_CAP}")
if _SH_SNM != 0 and _SH_SNM < 2:
    raise ValueError(
        f"SPARK_GRAFT_SIMHASH_SNM_WINDOW must be 0 (disable) or >= 2, got {_SH_SNM}"
    )


def _simhash_capped_sql() -> str:
    """DuckDB oracle for the capped+SNM production config: the same banded
    plan as `_SIMHASH_PAIRS_SQL` restricted to within-cap buckets, plus a
    sorted-neighborhood chain over the routed-out buckets (row_number
    self-join on rn+1..rn+window-1). The chained pair set depends only on
    the (simhash, doc_id) TOTAL order inside each bucket — no engine tie
    ambiguity — so DuckDB re-derives it independently of Spark's
    lead()-struct formulation (operators.dedup.snm_chain_pairs).
    Orientation matches snm_chain_pairs: id_a = min(doc_id)."""
    snm_cand = ""
    union = ""
    if _SH_SNM >= 2:
        snm_cand = f""",
snm_rows AS (
  SELECT band, band_val, doc_id, simhash,
         ROW_NUMBER() OVER (PARTITION BY band, band_val
                            ORDER BY simhash, doc_id) AS rn
  FROM sized WHERE bucket_size > {_SH_CAP}
),
snm_cand AS (
  SELECT CASE WHEN x.doc_id < y.doc_id THEN x.doc_id ELSE y.doc_id END AS id_a,
         CASE WHEN x.doc_id < y.doc_id THEN x.simhash ELSE y.simhash END AS ha,
         CASE WHEN x.doc_id < y.doc_id THEN y.doc_id ELSE x.doc_id END AS id_b,
         CASE WHEN x.doc_id < y.doc_id THEN y.simhash ELSE x.simhash END AS hb
  FROM snm_rows x JOIN snm_rows y
    ON x.band = y.band AND x.band_val = y.band_val
   AND y.rn > x.rn AND y.rn <= x.rn + {_SH_SNM - 1}
)"""
        union = "\n    UNION ALL SELECT id_a, ha, id_b, hb FROM snm_cand"
    return f"""
WITH sh AS ({{base}}),
bands AS (
  SELECT doc_id, simhash, b.band, (simhash >> (8 * b.band)) & 255 AS band_val
  FROM sh, (SELECT UNNEST(range(4)) AS band) b
),
sized AS (
  SELECT *, COUNT(*) OVER (PARTITION BY band, band_val) AS bucket_size
  FROM bands
),
within AS (SELECT * FROM sized WHERE bucket_size <= {_SH_CAP}){snm_cand},
cand AS (
  SELECT DISTINCT id_a, ha, id_b, hb FROM (
    SELECT a.doc_id AS id_a, a.simhash AS ha, c.doc_id AS id_b, c.simhash AS hb
    FROM within a JOIN within c
      ON a.band = c.band AND a.band_val = c.band_val AND a.doc_id < c.doc_id{union}
  )
)
SELECT id_a, id_b,
  CAST(bit_count(CAST(xor(ha, hb) AS BIGINT)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(CAST(xor(ha, hb) AS BIGINT)) <= {_SIMHASH_HAM_K}
"""


def _simhash_pairs(spark, sf_dir, bucket_cap: int | None = None, snm_window: int = 0):
    """Banded SimHash pair generation shared by the certified catalog query
    (``bucket_cap=None`` — the identity path, plan untouched) and the
    production overflow dial. The r6 100× sweep measured the exponent 1.51
    as CANDIDATE-BUCKET growth on clone-heavy data (clone buckets grow
    quadratically in members; emitted pairs only 2.08×/doubling) — with a
    cap B, any (band, band_val) bucket holding more than B docs is routed
    to an overflow relation instead of the self-join, so candidate work is
    bounded by B²/2 per bucket regardless of duplication. Degradation is
    observable, not silent: returns (pairs, overflow) where overflow lists
    each skipped bucket's (band, band_val, bucket_size).

    ``snm_window >= 2`` additionally RECOVERS candidates from the routed-
    out buckets with a sorted-neighborhood pass (dedup.snm_chain_pairs:
    sort each oversized bucket by simhash value, chain-pair each doc with
    its next window-1 neighbors — O(bucket×window), not O(bucket²)). The
    r8 Zipf recall curve measured bucket-DROP losing 26% of flagged docs
    at cap 64 because whole clone clusters live in oversized buckets;
    clones sort adjacently on the fingerprint value, so a small window
    buys the recall back at linear cost. Recovered candidates verify
    through the same Hamming cut, so the capped answer stays an exact
    SUBSET of the uncapped one."""
    sh = simhash_fingerprints(spark, sf_dir)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*[F.lit(b) for b in range(4)])).alias("band"),
    ).withColumn("band_val", F.expr("shiftright(simhash, band * 8) & 255"))
    overflow = None
    recovered = None
    if bucket_cap is not None:
        from importer_spark.operators.dedup import cap_band_buckets, snm_chain_pairs

        if snm_window >= 2:
            bands, members = cap_band_buckets(
                bands, ["band", "band_val"], bucket_cap, return_members=True
            )
            overflow = members.select("band", "band_val", "bucket_size").distinct()
            recovered = snm_chain_pairs(
                members.select("band", "band_val", "doc_id", "simhash"),
                ["band", "band_val"],
                "doc_id",
                ["simhash"],
                snm_window,
            ).select(
                F.col("a.doc_id").alias("id_a"),
                F.col("a.simhash").alias("ha"),
                F.col("b.doc_id").alias("id_b"),
                F.col("b.simhash").alias("hb"),
            )
        else:
            bands, overflow = cap_band_buckets(bands, ["band", "band_val"], bucket_cap)
    a = bands.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("ha"), "band", "band_val"
    )
    c = bands.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("hb"), "band", "band_val"
    )
    cand = (
        a.join(c, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "ha", "id_b", "hb")
    )
    if recovered is not None:
        cand = cand.unionByName(recovered)
    cand = cand.distinct()
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    pairs = cand.filter(ham <= _SIMHASH_HAM_K).select(
        "id_a", "id_b", ham.cast("int").alias("hamming")
    )
    return pairs, overflow


@query("simhash_near_dups", oracle=_SIMHASH_PAIRS_SQL.format(base=_simhash_sql().strip()))
def simhash_near_dups(spark, sf_dir):
    """SimHash near-dup pairs, EXACT within Hamming radius 3: the 32-bit
    fingerprint splits into 4 byte bands, docs sharing any band value become
    candidates (pigeonhole: ≤3 differing bits cannot touch all 4 bands, so
    banding loses nothing at this radius), and candidates verify with
    bit_count(xor). The 100 TB shape mirrors MinHash-LSH: the band self-join
    moves only (doc_id, simhash, band_val) — 4 small rows per doc, never
    content — and the verify is two integer ops. The oracle replays the
    same banded plan over the shared simhash SQL base. Duplicate-heavy
    shards: see :func:`_simhash_pairs`' bucket_cap overflow dial."""
    pairs, _ = _simhash_pairs(spark, sf_dir, bucket_cap=None)
    return pairs


@query(
    "simhash_bucket_capped",
    oracle=_simhash_capped_sql().format(base=_simhash_sql().strip()),
)
def simhash_bucket_capped(spark, sf_dir):
    """The PRODUCTION bucket-cap configuration over the same banded SimHash
    probe (r6 verdict #2): the 100× exponent 1.51 was measured as
    candidate-BUCKET growth (clone buckets grow quadratically in members),
    so a duplicate-heavy shard pays unbounded candidate verification. With
    the cap (SPARK_GRAFT_SIMHASH_BUCKET_CAP, import-read, default 64) any
    (band, band_val) bucket holding more docs is routed to the overflow
    relation instead of the self-join — candidate work bounded by cap²/2
    per bucket — and the sorted-neighborhood recovery pass
    (SPARK_GRAFT_SIMHASH_SNM_WINDOW, import-read, default 8; 0 disables)
    re-mines the routed-out buckets at O(bucket×window), closing most of
    the recall hole bucket-drop opened (RECALL_CURVE.json: doc-flag recall
    0.988 at cap 64 vs 0.258 bucket-drop on Zipf clone data; clones sort
    adjacently by fingerprint value so a small window recovers them).

    Oracle-certified since r10 (r9 verdict #1: the config a 100-TB user
    must run deserves a value oracle, not just the subset test): the SNM
    chain is deterministic — sort by (simhash, doc_id), pair each row with
    its next window-1 successors — so the DuckDB oracle re-derives it as a
    row_number self-join over the same total order. The capped answer also
    stays a SUBSET of the uncapped `simhash_near_dups` (recovered
    candidates pass the same Hamming verify); tests/test_emit_caps.py pins
    subset + overflow-accounting + recovery semantics."""
    pairs, _overflow = _simhash_pairs(
        spark, sf_dir, bucket_cap=_SH_CAP, snm_window=_SH_SNM
    )
    return pairs


_REPETITION_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
          WHERE text IS NOT NULL),
g AS (
  SELECT doc_id, unnest(
    CASE WHEN len(t) >= 2
      THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
      ELSE [array_to_string(t, ' ')] END) AS gram
  FROM d
),
per AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2),
agg AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
         CAST(MAX(c) AS BIGINT) AS max_bigram_count
  FROM per GROUP BY 1
)
SELECT doc_id, n_bigrams, max_bigram_count,
  ROUND(max_bigram_count::DOUBLE / n_bigrams, 12) AS repetition_ratio,
  max_bigram_count::DOUBLE / n_bigrams >= 0.1 AS repetitive
FROM agg
"""


@query("doc_repetition", oracle=_REPETITION_SQL)
def doc_repetition(spark, sf_dir):
    """Intra-document repetition (Gopher/C4-style filter rule): the most
    frequent bigram's share of all bigrams. Built on the same
    posexplode+lead shingle stream as MinHash (multiplicity kept), so the
    whole computation is codegen rows — two hash aggs on doc_id, no arrays,
    no Python."""
    from importer_spark.operators.dedup import shingle_rows

    t = Tables(spark, sf_dir)
    grams = shingle_rows(t.wide("documents"), "doc_id", "text", shingle_k=2)
    per = grams.groupBy("doc_id", "shingle").agg(F.count("*").alias("c"))
    agg = per.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.max("c").cast("bigint").alias("max_bigram_count"),
    )
    ratio = F.col("max_bigram_count").cast("double") / F.col("n_bigrams")
    return agg.select(
        "doc_id",
        "n_bigrams",
        "max_bigram_count",
        F.round(ratio, 12).alias("repetition_ratio"),
        (ratio >= 0.1).alias("repetitive"),
    )


# --- sliding-window chunking (context-window packing's upstream step) ------
CHUNK_WIN = 64     # tokens per chunk
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks

_CHUNKS_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks,
    len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
spans AS (
  SELECT doc_id, lang, toks, n_tokens,
    (greatest(n_tokens - {CHUNK_WIN}, 0) + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE}
      AS last_chunk
  FROM toks
),
ks AS (
  SELECT doc_id, lang, toks, last_chunk,
    UNNEST(range(0, last_chunk + 1)) AS k
  FROM spans
)
SELECT doc_id, lang,
  k AS chunk_id,
  last_chunk + 1 AS n_chunks,
  len(list_slice(toks, k * {CHUNK_STRIDE} + 1, k * {CHUNK_STRIDE} + {CHUNK_WIN}))
    AS chunk_tokens,
  md5(array_to_string(
    list_slice(toks, k * {CHUNK_STRIDE} + 1, k * {CHUNK_STRIDE} + {CHUNK_WIN}), ' '))
    AS chunk_md5
FROM ks
"""


@query("doc_chunks", oracle=_CHUNKS_SQL)
def doc_chunks(spark, sf_dir):
    """Sliding-window document chunking: fixed token windows with overlap
    (the step before tokenize-and-pack in every LLM training pipeline;
    overlap preserves cross-boundary context). Chunk k covers tokens
    [k·stride, k·stride+win); the chunk count 1+ceil(max(n-win,0)/stride)
    guarantees full coverage with the final chunk allowed to run short.
    Pure narrow ops — split, sequence, explode, slice — ZERO shuffle at any
    scale; output is chunk rows keyed (doc_id, chunk_id) with an md5 over
    the chunk text for downstream chunk-level dedup."""
    t = Tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    base = t.documents.select(
        "doc_id", "lang", toks.alias("toks"), F.size(toks).alias("n_tokens")
    ).withColumn(
        "last_chunk",
        F.expr(
            f"(greatest(n_tokens - {CHUNK_WIN}, 0) + {CHUNK_STRIDE} - 1) "
            f"div {CHUNK_STRIDE}"
        ),
    )
    chunked = base.select(
        "doc_id",
        "lang",
        (F.col("last_chunk") + 1).alias("n_chunks"),
        F.explode(F.sequence(F.lit(0), F.col("last_chunk"))).alias("chunk_id"),
        "toks",
    )
    chunk = F.slice(
        F.col("toks"), F.col("chunk_id") * CHUNK_STRIDE + 1, F.lit(CHUNK_WIN)
    )
    return chunked.select(
        "doc_id",
        "lang",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("n_chunks").cast("long").alias("n_chunks"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


# --- exact heavy hitters: sketch candidates + exact recount ---------------
HH_DEN = 50  # report tokens with frequency >= 1/50 of the token stream

_FREQUENT_SQL = f"""
WITH toks AS (SELECT UNNEST(string_split(text, ' ')) AS item FROM documents),
tot AS (SELECT COUNT(*) AS _n FROM toks WHERE item IS NOT NULL),
counted AS (
  SELECT item, COUNT(*) AS cnt FROM toks WHERE item IS NOT NULL GROUP BY item
)
SELECT item, cnt, ROUND(cnt::DOUBLE / _n, 6) AS freq
FROM counted, tot
WHERE cnt * {HH_DEN} >= _n
"""


@query("frequent_tokens", oracle=_FREQUENT_SQL)
def frequent_tokens(spark, sf_dir):
    """Exact heavy-hitter tokens (frequency ≥ 1/HH_DEN) via the two-pass
    Space-Saving + recount operator. The oracle is a full GROUP BY over the
    vocabulary — affordable at test scale, NOT at 100 TB, where the sketch
    path's bounded memory (den+1 counters per partition) and candidate-only
    recount is the difference. See operators/sketch.py for the superset
    guarantee that makes the sketch path return exactly the oracle's
    answer."""
    from importer_spark.operators.sketch import frequent_items

    t = Tables(spark, sf_dir)
    # NOT wide(): frequent_items is two actions (sketch pass + recount) —
    # each would re-pay the widen repartition (the kmeans lesson).
    toks = t.documents.select(F.explode(tokens(F.col("text"))).alias("tok"))
    return frequent_items(toks, "tok", HH_DEN)


_UNIGRAM_LM_SQL = """
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
)
SELECT doc_id,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  ROUND(CAST(s AS DOUBLE) / n_tokens, 6) AS avg_logprob,
  ROUND(CAST(s AS DOUBLE) / n_tokens, 6) >= -3.5 AS keep
FROM per
"""


@query("unigram_logprob_scores", oracle=_UNIGRAM_LM_SQL)
def unigram_logprob_scores(spark, sf_dir):
    """Unigram language-model quality scores (the CCNet/KenLM perplexity
    filter's shape, with the corpus itself as the LM): token log-probs from
    corpus frequencies, each document scored by its mean token log-prob,
    gated at a fluency threshold. Wildly improbable token streams (boiler-
    plate noise, encoding garbage) score low and drop.

    Scale shape: one token explode feeds BOTH the vocabulary build and the
    scoring join; the vocab aggregates with map-side partials, its one-row
    total broadcasts back, and the score join keys on the token (AQE
    broadcasts the vocab while it fits, shuffle-joins beyond). Cross-engine
    determinism: log-probs are rounded to 9 places then summed as exact
    DECIMAL(18,9) — double summation order never matters — with ONE final
    double divide (the repo-wide exact-decimal convention,
    functions/core.py). The scoring core is
    `operators/text.py::unigram_avg_logprob` (shared with the `refine`
    CLI, which scores CLEANED text through the same derivation)."""
    from importer_spark.operators.text import unigram_avg_logprob

    t = Tables(spark, sf_dir)
    per = unigram_avg_logprob(t.wide("documents"), "doc_id", "text")
    return per.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "avg_logprob",
        (F.col("avg_logprob") >= -3.5).alias("keep"),
    )


_GOPHER_STOPS = ("the", "of", "and", "to", "a")

_GOPHER_SQL = """
WITH base AS (
  SELECT doc_id, lang,
    len(string_split(text, ' ')) AS n_words,
    length(text) AS n_chars,
    len(list_filter(string_split(text, ' '),
        x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha_words,
    len(list_distinct(list_filter(string_split(text, ' '),
        x -> x IN ('the', 'of', 'and', 'to', 'a')))) AS n_distinct_stops
  FROM documents
),
rules AS (
  SELECT doc_id, lang, n_words,
    ROUND((n_chars - n_words + 1)::DOUBLE / n_words, 6) AS mean_word_len,
    ROUND(n_alpha_words::DOUBLE / n_words, 6) AS alpha_word_ratio,
    n_distinct_stops,
    n_words BETWEEN 30 AND 100000 AS words_ok,
    ((n_chars - n_words + 1)::DOUBLE / n_words) BETWEEN 3.0 AND 10.0 AS word_len_ok,
    (n_alpha_words::DOUBLE / n_words) >= 0.8 AS alpha_ok,
    n_distinct_stops >= 2 AS stops_ok
  FROM base
)
SELECT *, words_ok AND word_len_ok AND alpha_ok AND stops_ok AS keep
FROM rules
"""


@query("gopher_quality_rules", oracle=_GOPHER_SQL)
def gopher_quality_rules(spark, sf_dir):
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1, public):
    word-count bounds, mean-word-length bounds, alphabetic-word ratio, and
    the ≥2-distinct-stopwords requirement, each reported per document with
    the fused keep verdict. Complements `doc_quality_scores` (weighted
    score) with the paper's hard-rule formulation. Pure column expressions
    over one scan — no shuffle, no Python; the rule set is a conjunction
    Catalyst folds into a single projection."""
    t = Tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    n_words = F.size(toks)
    mean_len = (F.length("text") - n_words + 1).cast("double") / n_words
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    alpha_ratio = n_alpha.cast("double") / n_words
    n_stops = F.size(
        F.array_distinct(
            F.filter(toks, lambda x: x.isin(*_GOPHER_STOPS))
        )
    )
    base = t.wide("documents").select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        n_stops.alias("n_distinct_stops"),
        n_words.between(30, 100000).alias("words_ok"),
        mean_len.between(3.0, 10.0).alias("word_len_ok"),
        (alpha_ratio >= 0.8).alias("alpha_ok"),
        (n_stops >= 2).alias("stops_ok"),
    )
    return base.select(
        "*",
        (
            F.col("words_ok")
            & F.col("word_len_ok")
            & F.col("alpha_ok")
            & F.col("stops_ok")
        ).alias("keep"),
    )


@query("bpe_token_stats", catalog=False)
def bpe_token_stats(spark, sf_dir):
    """Learned-BPE tokenization (operators/bpe.py): train 16 merges on the
    corpus word-frequency table (capped to the 4096 most frequent words),
    encode every document with the greedy lowest-rank-first applier, and
    report per-doc BPE token counts next to the whitespace count. An
    iterative argmax-driven trainer has no SQL oracle — DIAGNOSTICS;
    correctness is pinned by tests/test_bpe.py's parity against the
    pure-Python reference implementation of Sennrich et al. 2016."""
    from importer_spark.operators.bpe import apply_bpe, train_bpe

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "text")
    merges = train_bpe(docs, "text", n_merges=16, top_v=4096)
    return apply_bpe(docs, "text", merges).select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_words"),
        F.size("bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        F.round(
            F.size("bpe_tokens").cast("double")
            / F.size(tokens(F.col("text"))),
            6,
        ).alias("tokens_per_word"),
    )


# --- char-trigram Naive Bayes lang-ID + its eval (kappa / per-class F1) -----
# Round 5's eval queries measured the stopword lang-ID heuristic at
# chance (kappa 0.0016, non-en recall 0): the synthetic corpus draws every
# language's text from one shared vocabulary, so a fixed wordlist carries no
# signal. The r5 verdict's replacement is a TRAINED classifier — the
# certified multinomial-NB machinery (analytics5._nb_scores) re-derived over
# character trigrams, the fastText/CLD-style feature space for language ID.
# Training and evaluation both run over the labeled corpus (resubstitution):
# on THIS data that is the only regime with measurable agreement (the label
# is content-independent by construction — a held-out split can only score
# noise), and it is the regime that certifies the train+score pipeline
# end-to-end; on real multilingual text the same operator generalizes.
# The stopword heuristic stays available as the `lang_id` query.

_LANG_NB_CTES = """
WITH base AS (
  SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents
  WHERE lang IS NOT NULL AND text IS NOT NULL AND length(text) >= 1
),
tok AS (
  SELECT doc_id, lang,
    UNNEST(list_transform(generate_series(1, length(p) - 2),
                          i -> substr(p, CAST(i AS INT), 3))) AS g
  FROM base
),
cnt AS (SELECT lang AS cls, g, COUNT(*) AS c FROM tok GROUP BY 1, 2),
tot AS (SELECT cls, SUM(c) AS t FROM cnt GROUP BY 1),
vocab AS (SELECT COUNT(DISTINCT g) AS v FROM tok),
nd AS (SELECT lang AS cls, COUNT(*) AS n_docs FROM base GROUP BY 1),
ndt AS (SELECT SUM(n_docs) AS ndt FROM nd),
lp AS (
  SELECT cls, g,
    CAST(ROUND(ln(CAST(c + 1 AS DOUBLE) / CAST(t + v AS DOUBLE)), 9)
         AS DECIMAL(18,9)) AS lp
  FROM cnt JOIN tot USING (cls), vocab
),
lp0 AS (
  SELECT cls,
    CAST(ROUND(ln(1.0 / CAST(t + v AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lp0
  FROM tot, vocab
),
pri AS (
  SELECT cls,
    CAST(ROUND(ln(CAST(n_docs AS DOUBLE) / CAST(ndt AS DOUBLE)), 9)
         AS DECIMAL(18,9)) AS pri
  FROM nd, ndt
),
scored AS (
  SELECT k.doc_id, l0.cls, SUM(COALESCE(lp.lp, l0.lp0)) AS s
  FROM tok k
  CROSS JOIN lp0 l0
  LEFT JOIN lp ON lp.cls = l0.cls AND lp.g = k.g
  GROUP BY 1, 2
),
full_score AS (
  SELECT s.doc_id, s.cls, s.s + p.pri AS score
  FROM scored s JOIN pri p USING (cls)
),
pred AS (
  SELECT r.doc_id, b.lang AS labeled, r.cls AS predicted,
         CAST(r.score AS DOUBLE) AS nb_logprob
  FROM (
    SELECT doc_id, cls, score,
      ROW_NUMBER() OVER (PARTITION BY doc_id
                         ORDER BY score DESC, cls ASC) AS rk
    FROM full_score
  ) r JOIN base b USING (doc_id)
  WHERE rk = 1
)"""


def _nb_base_toks(spark, sf_dir, where: str | None = None, wide: bool = False):
    """(base, toks) relations for the NB classifier — the labeled-doc
    projection and its exploded char-trigram stream. Lazy plans rebuilt
    per call (corpus-sized state is never cached — see `_lang_nb_model`).
    ``where`` (a SQL expression string, e.g. ``"doc_id % 5 != 0"``)
    restricts the doc set — the train/score split of the incremental
    twin (`lang_id_incremental`). ``wide`` applies the scan-parallelism
    guard (io.widen_narrow_scan) — ONLY for single-action consumers (the
    scoring pass): the model build evaluates toks via several actions
    (checkpoint + rollup) and would re-pay the repartition per action
    (measured 2× regression — see OPTIMIZATION_r10.md §E)."""
    t = Tables(spark, sf_dir)
    docs = t.wide("documents") if wide else t.documents
    base = (
        docs.filter(
            F.col("lang").isNotNull()
            & F.col("text").isNotNull()
            & (F.length("text") >= 1)
        )
        .select("doc_id", "lang", F.concat(F.lit(" "), F.col("text"), F.lit(" ")).alias("p"))
    )
    if where is not None:
        base = base.filter(F.expr(where))
    toks = base.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr("transform(sequence(1, length(p) - 2), i -> substring(p, i, 3))")
        ).alias("g"),
    )
    return base, toks


# MODEL-sized NB state cached per (SparkContext, corpus dir): the
# localCheckpointed (cls, g, c) relation, its pivoted per-class twin, and
# the collected scalars. Bounded by alphabet³ × C — a few MB — NEVER
# corpus-sized (an r6 draft cached the corpus-sized (doc, g, k) relation
# and OOMed multi-query sessions at 50×; that trade stays refused). The
# r6 verdict measured the alternative — retraining inside each of the
# lang_id_ngram_nb / lang_id_kappa / lang_id_class_f1 trio — at ~18 s of
# the isolated bench and ~210 s at 100×, for a model that is identical
# across the trio by construction. Keyed on applicationId so a new
# SparkContext (whose checkpointed RDDs are gone) rebuilds; capped so a
# scale sweep over many corpus dirs cannot accumulate unbounded
# checkpoint state (evicted entries are unpersisted and GC'd).
_NB_MODEL_CACHE: dict = {}
_NB_MODEL_CACHE_MAX = 4
_NB_MODEL_BUILDS = 0  # monotone build counter — pinned by tests
# Serialize builds: a concurrent bench pass (4 threads) can race two
# model builds for the same key — the second put overwrites the first,
# and derived state (cells_rows) attached to the losing dict is lost, so
# a later query silently re-pays the scoring pass. Double-checked
# locking keeps the hot path lock-free.
import threading as _threading

_NB_MODEL_LOCK = _threading.Lock()

# Broadcast ceiling for the pivoted V×C model (rows = distinct trigrams).
# ASCII-ish corpora sit around 10³-10⁴ trigram types; CJK worst-case is
# ~10⁶, where a V×C decimal matrix stops being a sane broadcast. Past the
# ceiling the model join degrades to a SHUFFLE join on the trigram key —
# same plan shape, same values (pinned by
# test_lang_nb_shuffle_join_fallback_same_answer), just an exchange on g
# instead of a broadcast. The ceiling compares against v_size, which the
# model build already collects — no extra job.
_NB_BROADCAST_MAX_VOCAB = 2_000_000


def _corpus_fingerprint(sf_dir) -> tuple:
    """Cheap stat token of the documents table under ``sf_dir``: (relpath,
    mtime_ns, size) per file. Part of the NB cache key so an IN-SESSION
    rewrite of the corpus directory changes the key and forces a rebuild —
    a cache keyed on the path alone would silently serve the old corpus's
    model/cells while the oracle reads the new files (r7 review)."""
    import os as _os

    root = _os.path.join(str(sf_dir), "documents.parquet")
    out = []
    if _os.path.isdir(root):
        for dp, _dirs, fs in sorted(_os.walk(root)):
            for f in sorted(fs):
                st = _os.stat(_os.path.join(dp, f))
                out.append(
                    (_os.path.relpath(_os.path.join(dp, f), root), st.st_mtime_ns, st.st_size)
                )
    elif _os.path.exists(root):
        st = _os.stat(root)
        out.append((".", st.st_mtime_ns, st.st_size))
    return tuple(out)


def _lang_nb_model(spark, sf_dir, train_where: str | None = None):
    """Build — or fetch the cached — model-sized NB state for this
    (session, corpus, train-subset) triple: dict with `lp_wide` (V×C
    pivoted log-prob DataFrame over the localCheckpointed count
    relation), `classes`, `tot`, `nd`, `ndt`, `v_size`. ``train_where``
    restricts the training docs (the incremental twin trains on the
    stored corpus only) and is part of the cache key — a subset model
    never masquerades as the full one."""
    global _NB_MODEL_BUILDS
    import os as _os

    key = (
        spark.sparkContext.applicationId,
        _os.path.abspath(str(sf_dir)),
        _corpus_fingerprint(sf_dir),
        train_where,
    )
    hit = _NB_MODEL_CACHE.get(key)
    if hit is not None:
        return hit
    with _NB_MODEL_LOCK:
        hit = _NB_MODEL_CACHE.get(key)
        if hit is not None:
            return hit
        model = _build_lang_nb_model(spark, sf_dir, train_where)
        _nb_cache_put(key, model)
        _NB_MODEL_BUILDS += 1
        return model


def _build_lang_nb_model(spark, sf_dir, train_where: str | None = None):
    """The uncached model build — see :func:`_lang_nb_model`."""
    dec = "decimal(18,9)"
    base, toks = _nb_base_toks(spark, sf_dir, where=train_where)
    # Two linear passes over the trigram stream: the model build (below;
    # localCheckpoint pins the MODEL-SIZED (cls, g, c) relation — bounded
    # by alphabet³ × C, never corpus-sized) and the scoring job in
    # `_lang_nb_pred` (per-instance broadcast-join + one groupBy(doc_id),
    # whose map-side partial agg already collapses the shuffle to one row
    # per (doc, class-vector)).
    cnt = (
        toks.groupBy(F.col("lang").alias("cls"), "g")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    # Bounded model scalars — the certified _nb_scores convention
    # (collected once at plan-build time), in ONE rollup job over the
    # model-sized cnt relation: per-class rows carry the token totals,
    # the grand-total row carries the distinct-trigram vocabulary size.
    roll = cnt.rollup("cls").agg(
        F.sum("c").alias("t"), F.countDistinct("g").alias("vg")
    ).collect()
    v_size = next(int(r["vg"]) for r in roll if r["cls"] is None)
    tot = {r["cls"]: r["t"] for r in roll if r["cls"] is not None}
    nd_rows = base.groupBy("lang").agg(F.count("*").alias("n_docs")).collect()
    classes = sorted(r["lang"] for r in nd_rows)
    nd = {r["lang"]: r["n_docs"] for r in nd_rows}
    ndt = sum(nd.values())

    den = F.when(F.col("cls") == classes[0], F.lit(float(tot[classes[0]] + v_size)))
    for c in classes[1:]:
        den = den.when(F.col("cls") == c, F.lit(float(tot[c] + v_size)))
    lp_long = cnt.select(
        "cls",
        "g",
        F.round(F.log((F.col("c") + 1).cast("double") / den), 9).cast(dec).alias("lp"),
    )
    lp_wide = lp_long.groupBy("g").pivot("cls", classes).agg(F.first("lp"))

    model = {
        "lp_wide": lp_wide,
        "classes": classes,
        "tot": tot,
        "nd": nd,
        "ndt": ndt,
        "v_size": v_size,
        "_cnt": cnt,  # keep the checkpointed parent reachable
        # Per-MODEL lock for derived state (cells_rows): the global
        # _NB_MODEL_LOCK must never be held across a distributed collect —
        # and never while calling back into _lang_nb_model, whose cache
        # miss would re-acquire the same non-reentrant lock (deadlock,
        # r7 review).
        "cells_lock": _threading.Lock(),
    }
    return model


def _nb_cache_put(key, model) -> None:
    """Insert into the bounded model cache, evicting oldest-first. An
    evicted entry's checkpointed RDD loses its last reference and the
    ContextCleaner reclaims the blocks (dicts are insertion-ordered)."""
    while len(_NB_MODEL_CACHE) >= _NB_MODEL_CACHE_MAX:
        del _NB_MODEL_CACHE[next(iter(_NB_MODEL_CACHE))]
    _NB_MODEL_CACHE[key] = model


def _lang_nb_pred(spark, sf_dir, model=None, score_where: str | None = None):
    """Per-doc char-trigram NB prediction DataFrame (doc_id, labeled,
    predicted, nb_logprob) — the Spark twin of ``_LANG_NB_CTES``'s `pred`
    relation, shared by lang_id_ngram_nb / lang_id_kappa /
    lang_id_class_f1 (one definition of the classifier). The model is
    trained ONCE per (session, corpus) via `_lang_nb_model` and reused by
    the whole trio; only the scoring pass below is per-query.
    ``score_where`` restricts the docs being scored (the incremental twin
    scores only the new batch — see `lang_id_incremental`).

    Same certified shape as analytics5._nb_scores: Laplace-smoothed
    per-class trigram log-probs and priors quantize to DECIMAL(18,9) at
    birth; the V×C model PIVOTS to per-class columns and broadcast-joins
    the exploded corpus once; ONE groupBy(doc_id) sums all C class scores
    as exact decimals (the oracle keeps the naive doc×class formulation —
    parity certifies the pivot rewrite). Argmax over quantized decimals,
    ties to the alphabetically first class. Driver state is model-sized
    (C totals + priors + vocab size), never corpus-sized. At 100 TB the
    only change is the broadcast threshold: a trigram vocabulary past
    memory turns the model join into a shuffle join on g — trigram vocab
    is bounded (~alphabet³) so in practice it always broadcasts."""
    dec = "decimal(18,9)"
    m = model if model is not None else _lang_nb_model(spark, sf_dir)
    classes, tot, nd, ndt, v_size = (
        m["classes"], m["tot"], m["nd"], m["ndt"], m["v_size"],
    )
    # wide=True: the scoring pass is ONE action for every consumer (the
    # argmax join, the collected cells of kappa/F1, the incremental batch)
    # and its per-row work — a length(p)-sized trigram explode per doc —
    # runs in the scan stage; the guard parallelizes it when the input is
    # a single split (bench scale) and no-ops at production input sizes.
    _, toks = _nb_base_toks(spark, sf_dir, where=score_where, wide=True)

    def _lndec(num, den):
        # round(ln(num/den), 9) computed IN the engine over identical
        # exact-integer inputs on both sides (llm_lm.py convention)
        return F.round(F.log(F.lit(float(num)) / F.lit(float(den))), 9).cast(dec)

    # Past the vocab ceiling the model side gets an explicit shuffle-hash
    # hint, not just a dropped broadcast hint: the pivoted relation hangs
    # off a checkpointed RDD whose size Catalyst can only estimate, and a
    # mis-estimated auto-broadcast of a CJK-scale model is exactly the
    # driver OOM this dial exists to prevent.
    lp_side = (
        F.broadcast(m["lp_wide"])
        if m["v_size"] <= _NB_BROADCAST_MAX_VOCAB
        else m["lp_wide"].hint("shuffle_hash")
    )
    joined = toks.join(lp_side, "g", "left")
    score_cols = [
        (
            F.sum(F.coalesce(F.col(f"`{c}`"), _lndec(1, tot[c] + v_size)))
            + _lndec(nd[c], ndt)
        )
        .cast("decimal(38,9)")
        .alias(f"_s_{i}")
        for i, c in enumerate(classes)
    ]
    scores = joined.groupBy("doc_id", F.col("lang").alias("labeled")).agg(*score_cols)
    arr = F.array(*[F.col(f"_s_{i}") for i in range(len(classes))])
    idx = F.array_position(arr, F.array_max(arr)).cast("int")
    cls_arr = F.array(*[F.lit(c) for c in classes])
    return scores.select(
        "doc_id",
        "labeled",
        F.element_at(cls_arr, idx).alias("predicted"),
        F.array_max(arr).cast("double").alias("nb_logprob"),
    )


_LANG_NB_SQL = _LANG_NB_CTES + """
SELECT doc_id, labeled AS labeled_lang, predicted AS predicted_lang,
       nb_logprob, predicted = labeled AS agrees_with_label
FROM pred
"""


@query("lang_id_ngram_nb", oracle=_LANG_NB_SQL)
def lang_id_ngram_nb(spark, sf_dir):
    """Char-trigram multinomial NB language ID (the trained replacement
    for the chance-level stopword heuristic — r5 verdict #3): per-doc
    predicted language + NB log-probability + agreement with the label.
    See :func:`_lang_nb_pred` for the model derivation and scale shape;
    lang_id_kappa / lang_id_class_f1 evaluate these same predictions."""
    p = _lang_nb_pred(spark, sf_dir)
    return p.select(
        "doc_id",
        F.col("labeled").alias("labeled_lang"),
        F.col("predicted").alias("predicted_lang"),
        "nb_logprob",
        (F.col("predicted") == F.col("labeled")).alias("agrees_with_label"),
    )


# --- incremental language-ID (r7 verdict #6) -------------------------------
# The dedup families all carry an incremental twin that probes a persisted
# store at batch cost; language-ID now does too. Docs with doc_id % 5 == 0
# play the NEW ingest batch; the rest are the stored corpus, whose per-doc
# predictions already live in the persisted prediction store
# (operators/langid.py — bucketed by pmod(hash(doc_id), B) in production,
# exactly like the gram/band/segment stores, never driver-side) and are NOT
# re-scored. The model is trained once on the stored corpus (cached via
# `_lang_nb_model(train_where=...)` — a separate cache key from the full
# model) and ONLY the batch pays a scoring pass, so 100× corpus growth with
# a fixed batch costs batch-sized work per ingest.
_INCR_TRAIN_WHERE = "doc_id % 5 != 0"
_INCR_SCORE_WHERE = "doc_id % 5 = 0"

# The DuckDB re-derivation: train the NB model on the stored corpus
# (doc_id % 5 <> 0), score exactly the batch (doc_id % 5 = 0). Same exact-
# decimal quantization convention as _LANG_NB_CTES. Registered as a
# DIAGNOSTIC (catalog=False) — the driver catalog is frozen at 202 (r7
# verdict #7) — but the oracle is still enforced every pytest run by
# tests/test_langid_incremental.py, so the twin is oracle-green in-repo.
_LANG_NB_INCR_SQL = """
WITH base AS (
  SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents
  WHERE lang IS NOT NULL AND text IS NOT NULL AND length(text) >= 1
    AND doc_id % 5 <> 0
),
tok AS (
  SELECT doc_id, lang,
    UNNEST(list_transform(generate_series(1, length(p) - 2),
                          i -> substr(p, CAST(i AS INT), 3))) AS g
  FROM base
),
cnt AS (SELECT lang AS cls, g, COUNT(*) AS c FROM tok GROUP BY 1, 2),
tot AS (SELECT cls, SUM(c) AS t FROM cnt GROUP BY 1),
vocab AS (SELECT COUNT(DISTINCT g) AS v FROM tok),
nd AS (SELECT lang AS cls, COUNT(*) AS n_docs FROM base GROUP BY 1),
ndt AS (SELECT SUM(n_docs) AS ndt FROM nd),
lp AS (
  SELECT cls, g,
    CAST(ROUND(ln(CAST(c + 1 AS DOUBLE) / CAST(t + v AS DOUBLE)), 9)
         AS DECIMAL(18,9)) AS lp
  FROM cnt JOIN tot USING (cls), vocab
),
lp0 AS (
  SELECT cls,
    CAST(ROUND(ln(1.0 / CAST(t + v AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lp0
  FROM tot, vocab
),
pri AS (
  SELECT cls,
    CAST(ROUND(ln(CAST(n_docs AS DOUBLE) / CAST(ndt AS DOUBLE)), 9)
         AS DECIMAL(18,9)) AS pri
  FROM nd, ndt
),
sbase AS (
  SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents
  WHERE lang IS NOT NULL AND text IS NOT NULL AND length(text) >= 1
    AND doc_id % 5 = 0
),
stok AS (
  SELECT doc_id, lang,
    UNNEST(list_transform(generate_series(1, length(p) - 2),
                          i -> substr(p, CAST(i AS INT), 3))) AS g
  FROM sbase
),
scored AS (
  SELECT k.doc_id, l0.cls, SUM(COALESCE(lp.lp, l0.lp0)) AS s
  FROM stok k
  CROSS JOIN lp0 l0
  LEFT JOIN lp ON lp.cls = l0.cls AND lp.g = k.g
  GROUP BY 1, 2
),
full_score AS (
  SELECT s.doc_id, s.cls, s.s + p.pri AS score
  FROM scored s JOIN pri p USING (cls)
),
pred AS (
  SELECT r.doc_id, b.lang AS labeled, r.cls AS predicted,
         CAST(r.score AS DOUBLE) AS nb_logprob
  FROM (
    SELECT doc_id, cls, score,
      ROW_NUMBER() OVER (PARTITION BY doc_id
                         ORDER BY score DESC, cls ASC) AS rk
    FROM full_score
  ) r JOIN sbase b USING (doc_id)
  WHERE rk = 1
)
SELECT doc_id, labeled AS labeled_lang, predicted AS predicted_lang,
       nb_logprob, predicted = labeled AS agrees_with_label
FROM pred
"""


@query("lang_id_incremental", catalog=False)
def lang_id_incremental(spark, sf_dir):
    """Incremental NB language-ID: score ONLY the new ingest batch
    (doc_id % 5 == 0) against the model trained on the stored corpus
    (doc_id % 5 != 0) — the language-ID member of the incremental family
    (substring / shingle / chunk / embedding / segment stores; r7 verdict
    #6). Stored-corpus predictions live in the persisted per-doc store
    (`operators/langid.prediction_store` — bucketed parquet keyed on
    doc_id, NOT driver state) and are never re-scored; the batch's rows
    fold in with `prediction_store_merge` (an upsert, so re-ingesting a
    corrected doc replaces its row). Registered as a diagnostic — the
    driver catalog stays frozen at 202 — with the DuckDB oracle
    (`_LANG_NB_INCR_SQL`) enforced every pytest run by
    tests/test_langid_incremental.py. At 100× corpus the per-ingest cost
    is one batch-sized scoring pass + the (cached) stored-corpus model
    build; nothing rescans the store."""
    m = _lang_nb_model(spark, sf_dir, train_where=_INCR_TRAIN_WHERE)
    p = _lang_nb_pred(spark, sf_dir, model=m, score_where=_INCR_SCORE_WHERE)
    return p.select(
        "doc_id",
        F.col("labeled").alias("labeled_lang"),
        F.col("predicted").alias("predicted_lang"),
        "nb_logprob",
        (F.col("predicted") == F.col("labeled")).alias("agrees_with_label"),
    )


def _lang_cells_sql() -> str:
    """Confusion-cell CTE (labeled x predicted counts) shared by the kappa
    and per-class-F1 oracles — one definition of the (NB) classifier."""
    return _LANG_NB_CTES + """,
cells AS (
  SELECT labeled, predicted, COUNT(*) AS n
  FROM pred GROUP BY 1, 2
)"""


def _lang_cells(spark, sf_dir):
    """Confusion-cell DataFrame (labeled, predicted, n) — the Spark twin of
    :func:`_lang_cells_sql`, shared by lang_id_kappa and lang_id_class_f1.

    The cell relation is ≤(L+1)² rows — MODEL-sized in the strict sense
    (languages², never corpus-anything) — so it follows the `_lang_nb_model`
    convention: the distributed scoring pass runs ONCE per (session,
    corpus) at plan-build time, its ~L² rows collect into the same bounded
    cache, and both evaluators build their aggregations over a local
    relation. This makes their plans DETERMINISTIC regardless of cache
    state (always local-relation → agg — a requirement of the plan-
    snapshot pin) and drops the second full corpus scoring pass the r6
    bench paid (kappa and class_f1 each ~4 s; the pair now costs one
    scoring pass total). Per-doc predictions are deliberately NOT cached —
    O(docs) state is corpus-sized at 100 TB; lang_id_ngram_nb recomputes
    its scoring pass instead."""
    m = _lang_nb_model(spark, sf_dir)
    rows = m.get("cells_rows")
    if rows is None:
        # Double-checked under the PER-MODEL lock (not _NB_MODEL_LOCK):
        # in the concurrent bench pass kappa and class_f1 race here, and
        # without a lock each pays its own full scoring pass. The global
        # model lock must not be held across this multi-second collect —
        # and _lang_nb_pred is handed the already-fetched model so the
        # call can never re-enter _lang_nb_model's lock (a cache eviction
        # between fetch and lock would otherwise deadlock; r7 review).
        with m["cells_lock"]:
            rows = m.get("cells_rows")
            if rows is None:
                rows = [
                    (r["labeled"], r["predicted"], r["n"])
                    for r in _lang_nb_pred(spark, sf_dir, model=m)
                    .groupBy("labeled", "predicted")
                    .agg(F.count("*").alias("n"))
                    .collect()
                ]
                m["cells_rows"] = rows
    return spark.createDataFrame(
        rows, schema="labeled string, predicted string, n bigint"
    )


def _kappa_sql() -> str:
    return _lang_cells_sql() + """,
marg AS (
  SELECT
    SUM(n) AS total,
    SUM(CASE WHEN labeled = predicted THEN n ELSE 0 END) AS diag
  FROM cells
),
rows_m AS (SELECT labeled AS cls, SUM(n) AS rn FROM cells GROUP BY 1),
cols_m AS (SELECT predicted AS cls, SUM(n) AS cn FROM cells GROUP BY 1),
pe AS (
  SELECT SUM(r.rn * c.cn) AS pe_num
  FROM rows_m r JOIN cols_m c ON r.cls = c.cls
)
SELECT CAST(m.total AS BIGINT) AS n_docs,
  ROUND(CAST(m.diag AS DOUBLE) / m.total, 6) AS po,
  ROUND(CAST(p.pe_num AS DOUBLE) / (m.total * m.total), 6) AS pe,
  CASE WHEN m.total * m.total - p.pe_num > 0 THEN
    ROUND(CAST(m.total * m.diag - p.pe_num AS DOUBLE)
          / (m.total * m.total - p.pe_num), 6)
  END AS kappa
FROM marg m CROSS JOIN pe p
"""


@query("lang_id_kappa", oracle=_kappa_sql())
def lang_id_kappa(spark, sf_dir):
    """Cohen's kappa between the char-trigram NB lang-ID classifier
    (`lang_id_ngram_nb`) and the labeled language — chance-corrected
    agreement, the honest summary of a classifier whose accuracy rides on
    class balance. Round 5 measured the stopword heuristic here at chance
    (kappa 0.0016); the trained NB reaches ~0.42 on the same corpus
    (resubstitution — see the module note above `_LANG_NB_CTES`).
    NULL-labeled and textless docs are out of the eval domain on both
    engines.

    Exactness: kappa = (N·Σdiag − Σ_c row_c·col_c) / (N² − Σ_c row_c·col_c)
    stays INTEGER until the single final division — no po/pe rounding can
    leak into kappa. Distributed shape: one groupBy over (labeled,
    predicted) — a ≤(L+1)² cell relation — then class-marginal aggs over
    those cells; nothing downstream of the first agg is corpus-sized."""
    cells = _lang_cells(spark, sf_dir)
    marg = cells.agg(
        F.sum("n").alias("total"),
        F.sum(
            F.when(F.col("labeled") == F.col("predicted"), F.col("n")).otherwise(0)
        ).alias("diag"),
    )
    rows_m = cells.groupBy(F.col("labeled").alias("cls")).agg(F.sum("n").alias("rn"))
    cols_m = cells.groupBy(F.col("predicted").alias("cls")).agg(
        F.sum("n").alias("cn")
    )
    pe = (
        rows_m.join(cols_m, "cls")
        .select((F.col("rn") * F.col("cn")).alias("rc"))
        .agg(F.sum("rc").alias("pe_num"))
    )
    nn = F.col("total") * F.col("total")
    kappa = F.when(
        (nn - F.col("pe_num")) > 0,
        F.round(
            (F.col("total") * F.col("diag") - F.col("pe_num")).cast("double")
            / (nn - F.col("pe_num")),
            6,
        ),
    )
    return marg.crossJoin(pe).select(
        F.col("total").cast("bigint").alias("n_docs"),
        F.round(F.col("diag").cast("double") / F.col("total"), 6).alias("po"),
        F.round(F.col("pe_num").cast("double") / nn, 6).alias("pe"),
        kappa.alias("kappa"),
    )


# --- collocation extraction: top bigrams by PMI -----------------------------
_PMI_MIN_COUNT = 5
_PMI_TOP = 50

_PMI_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         UNNEST(string_split(text, ' ')) AS cur,
         UNNEST(range(1, len(string_split(text, ' ')) + 1)) AS pos
  FROM documents
),
seq AS (
  SELECT doc_id, pos, cur,
         LAG(cur) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM tok
),
uni AS (SELECT cur AS tok, COUNT(*) AS c1 FROM seq GROUP BY 1),
tot AS (SELECT SUM(c1) AS t FROM uni),
big AS (
  SELECT prev, cur, COUNT(*) AS c2 FROM seq
  WHERE prev IS NOT NULL GROUP BY 1, 2
  HAVING COUNT(*) >= {_PMI_MIN_COUNT}
)
SELECT b.prev, b.cur, CAST(b.c2 AS BIGINT) AS pair_count,
  ROUND(ln(CAST(b.c2 AS DOUBLE) * t.t / (CAST(up.c1 AS DOUBLE) * uc.c1)), 6)
    AS pmi
FROM big b
JOIN uni up ON up.tok = b.prev
JOIN uni uc ON uc.tok = b.cur
CROSS JOIN tot t
ORDER BY pmi DESC, b.prev ASC, b.cur ASC
LIMIT {_PMI_TOP}
"""


@query("pmi_collocations", oracle=_PMI_SQL)
def pmi_collocations(spark, sf_dir):
    """Collocation extraction: top-{_PMI_TOP} adjacent-token bigrams by
    pointwise mutual information, min pair count {_PMI_MIN_COUNT} (the
    standard PMI floor — rare pairs have inflated PMI). The corpus-analysis
    primitive behind phrase vocabularies, tokenizer merge seeding, and
    boilerplate discovery.

    Distributed shape: ONE posexplode pass builds the adjacent-pair stream
    (array_zip of the token array with itself shifted — no self-join, the
    llm_lm.py pattern), two hash aggs (pair counts, unigram counts), the
    vocabulary-sized unigram relation joins back onto the min-count-
    filtered pair relation, and the global top-{_PMI_TOP} is
    TakeOrderedAndProject (never a single-task window). PMI doubles come
    from ONE expression over exact integer counts (products bounded by
    tokens² — swap to DECIMAL past ~10^9 tokens), so ranking and the
    emitted values agree bitwise across engines.

    r10 note: the bigram_backoff fold (NULL-prev padded pair stream, one
    corpus explode, unigram counts folded as Σ_prev c2 off the reused
    exchange) was tried, oracle-verified, and REVERTED on measurement:
    interleaved A/B mins 1.02 vs 0.93 s and 1.07 vs 0.81 s at sf0.1, and
    2.89 vs 1.71 s at 10× — the serialized agg chain costs more than the
    second explode branch at every measured scale (the two branches
    overlap in the scheduler; map-side partial agg already collapses each
    shuffle to vocab/bigram-type partials, so the fold saves CPU only,
    not shuffle bytes)."""
    t = Tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    seq = t.wide("documents").select(F.explode(toks).alias("cur"))
    uni = seq.groupBy(F.col("cur").alias("tok")).agg(F.count("*").alias("c1"))
    tot = uni.agg(F.sum("c1").alias("t"))
    big = (
        t.wide("documents").select(F.explode(pairs).alias("p"))
        .select(F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
        .groupBy("prev", "cur")
        .agg(F.count("*").alias("c2"))
        .filter(F.col("c2") >= _PMI_MIN_COUNT)
    )
    up = uni.select(F.col("tok").alias("prev"), F.col("c1").alias("cp"))
    uc = uni.select(F.col("tok").alias("cur"), F.col("c1").alias("cc"))
    pmi = F.round(
        F.log(
            F.col("c2").cast("double")
            * F.col("t")
            / (F.col("cp").cast("double") * F.col("cc"))
        ),
        6,
    )
    return (
        big.join(F.broadcast(up), "prev")
        .join(F.broadcast(uc), "cur")
        .crossJoin(F.broadcast(tot))
        .select(
            "prev", "cur", F.col("c2").cast("bigint").alias("pair_count"),
            pmi.alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("prev").asc(), F.col("cur").asc())
        .limit(_PMI_TOP)
    )


# --- chunk-level partial-overlap dedup ---------------------------------------
_CHUNK_DF_CAP = 50  # boilerplate guard: chunks shared by more docs than this
#                     are template/boilerplate, not copied content

def _chunk_pairs_sql(extra_pred: str = "") -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
    len(string_split(text, ' ')) AS n_tokens
  FROM documents WHERE text IS NOT NULL
),
spans AS (
  SELECT doc_id, toks,
    (greatest(n_tokens - {CHUNK_WIN}, 0) + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE}
      AS last_chunk
  FROM toks
),
chunks AS (
  SELECT DISTINCT doc_id,
    md5(array_to_string(
      list_slice(toks, k * {CHUNK_STRIDE} + 1, k * {CHUNK_STRIDE} + {CHUNK_WIN}), ' '))
      AS chunk_md5
  FROM (SELECT doc_id, toks, UNNEST(range(0, last_chunk + 1)) AS k FROM spans)
),
sized AS (SELECT doc_id, COUNT(*) AS n_chunks FROM chunks GROUP BY 1),
rare AS (
  SELECT doc_id, chunk_md5 FROM (
    SELECT doc_id, chunk_md5,
      COUNT(*) OVER (PARTITION BY chunk_md5) AS df
    FROM chunks
  ) WHERE df <= {_CHUNK_DF_CAP}
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM rare a JOIN rare b ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.id_a, p.id_b, CAST(p.n_shared AS BIGINT) AS n_shared,
  ROUND(CAST(p.n_shared AS DOUBLE) / sa.n_chunks, 6) AS frac_a,
  ROUND(CAST(p.n_shared AS DOUBLE) / sb.n_chunks, 6) AS frac_b
FROM pairs p
JOIN sized sa ON sa.doc_id = p.id_a
JOIN sized sb ON sb.doc_id = p.id_b
WHERE TRUE {extra_pred}
"""


@query("chunk_overlap_pairs", oracle=_chunk_pairs_sql())
def chunk_overlap_pairs(spark, sf_dir):
    """Partial-overlap dedup: doc pairs sharing at least one EXACT
    duplicate chunk (sliding-window md5, the `doc_chunks` grid), with each
    side's shared-chunk fraction — the detector for copied SECTIONS inside
    otherwise-different documents, which whole-doc MinHash underweights
    (Jaccard dilutes a copied passage by the unshared remainder) and
    ExactSubstr finds only at the span level. frac ≈ 1 on one side flags
    containment (quote-and-extend); frac ≈ 1 both sides is a near-exact
    dup.

    Scale shape: chunking is zero-shuffle narrow ops; candidate generation
    is ONE equi-join on chunk_md5 with a df ≤ {_CHUNK_DF_CAP} boilerplate
    cap (template chunks would both flood the join and mean nothing —
    the ngram_jaccard_pairs rare-gram rule), then a pair-keyed map-partial
    count. Same join geometry as the gram store, so the incremental path
    (persisted chunk store, probe new docs only) drops in unchanged."""
    t = Tables(spark, sf_dir)
    chunks = _chunk_rows(t.documents)
    sized = chunks.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    from pyspark.sql import Window

    rare = (
        chunks.withColumn(
            "df", F.count("*").over(Window.partitionBy("chunk_md5"))
        )
        .filter(F.col("df") <= _CHUNK_DF_CAP)
        .drop("df")
    )
    a = rare.select(F.col("doc_id").alias("id_a"), "chunk_md5")
    b = rare.select(F.col("doc_id").alias("id_b"), "chunk_md5")
    pairs = (
        a.join(b, "chunk_md5")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sized.select(F.col("doc_id").alias("id_a"), F.col("n_chunks").alias("_ca"))
    sb = sized.select(F.col("doc_id").alias("id_b"), F.col("n_chunks").alias("_cb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.round(F.col("n_shared").cast("double") / F.col("_ca"), 6).alias(
                "frac_a"
            ),
            F.round(F.col("n_shared").cast("double") / F.col("_cb"), 6).alias(
                "frac_b"
            ),
        )
    )


def _chunk_rows(docs):
    """Distinct (doc_id, chunk_md5) rows of the doc_chunks sliding grid —
    the chunk store's row format (shared by the batch and incremental
    paths so hashes are construction-identical)."""
    toks = tokens(F.col("text"))
    last_chunk = F.floor(
        (F.greatest(F.size(toks) - CHUNK_WIN, F.lit(0)) + CHUNK_STRIDE - 1)
        / CHUNK_STRIDE
    ).cast("int")
    ks = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), last_chunk)).alias("k"),
    )
    return ks.select(
        "doc_id",
        F.md5(
            F.concat_ws(
                " ",
                F.slice(F.col("toks"), F.col("k") * CHUNK_STRIDE + 1, CHUNK_WIN),
            )
        ).alias("chunk_md5"),
    ).distinct()


_INCR_CHUNK_SQL = _chunk_pairs_sql("AND (p.id_a % 5 = 0 OR p.id_b % 5 = 0)")


@query("chunk_overlap_pairs_incremental", oracle=_INCR_CHUNK_SQL)
def chunk_overlap_pairs_incremental(spark, sf_dir):
    """Incremental chunk-overlap dedup: docs with doc_id % 5 == 0 play the
    NEW batch; the rest are the already-chunked corpus whose persisted
    (doc_id, chunk_md5) store is probed without re-chunking. The oracle is
    the full-corpus answer restricted to pairs touching a batch doc —
    agreement proves the incremental path returns EXACTLY the batch slice
    of the full answer, at batch-join cost (the same contract the gram
    store and band store carry).

    Production notes pinned by this shape: the df boilerplate cap and the
    per-doc chunk counts are monoid summaries — persist (chunk_md5 → df)
    and (doc_id → n_chunks) beside the store and merge per batch instead
    of re-aggregating (both are trivial adds); bucket the store by
    pmod(chunk_md5, B) so batch probes prune to touched buckets, exactly
    the gram-store layout."""
    t = Tables(spark, sf_dir)
    is_new = F.col("doc_id") % 5 == 0
    store = _chunk_rows(t.documents.filter(~is_new))  # persisted in production
    batch = _chunk_rows(t.documents.filter(is_new))
    union = store.unionByName(batch)
    rare_md5 = (
        union.groupBy("chunk_md5")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= _CHUNK_DF_CAP)
        .select("chunk_md5")
    )
    sized = union.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    probe = batch.join(rare_md5, "chunk_md5")
    target = union.join(rare_md5, "chunk_md5")
    cand = (
        probe.select(F.col("doc_id").alias("_pa"), "chunk_md5")
        .join(target.select(F.col("doc_id").alias("_pb"), "chunk_md5"), "chunk_md5")
        .filter(F.col("_pa") != F.col("_pb"))
        .select(
            F.least("_pa", "_pb").alias("id_a"),
            F.greatest("_pa", "_pb").alias("id_b"),
            "chunk_md5",
        )
        .distinct()  # batch-batch pairs arrive in both orientations
    )
    pairs = cand.groupBy("id_a", "id_b").agg(F.count("*").alias("n_shared"))
    sa = sized.select(F.col("doc_id").alias("id_a"), F.col("n_chunks").alias("_ca"))
    sb = sized.select(F.col("doc_id").alias("id_b"), F.col("n_chunks").alias("_cb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.round(F.col("n_shared").cast("double") / F.col("_ca"), 6).alias(
                "frac_a"
            ),
            F.round(F.col("n_shared").cast("double") / F.col("_cb"), 6).alias(
                "frac_b"
            ),
        )
    )


# --- per-class precision / recall / F1 for the lang-ID classifier -----------
def _class_f1_sql() -> str:
    return _lang_cells_sql() + """,
rows_m AS (SELECT labeled AS cls, SUM(n) AS rn FROM cells GROUP BY 1),
cols_m AS (SELECT predicted AS cls, SUM(n) AS cn FROM cells GROUP BY 1),
diag AS (SELECT labeled AS cls, SUM(n) AS tp FROM cells
         WHERE labeled = predicted GROUP BY 1),
uni AS (
  SELECT COALESCE(r.cls, c.cls) AS cls,
    COALESCE(r.rn, 0) AS rn, COALESCE(c.cn, 0) AS cn
  FROM rows_m r FULL OUTER JOIN cols_m c ON r.cls = c.cls
),
m AS (
  SELECT u.cls, COALESCE(d.tp, 0) AS tp,
    u.cn - COALESCE(d.tp, 0) AS fp,
    u.rn - COALESCE(d.tp, 0) AS fn
  FROM uni u LEFT JOIN diag d ON d.cls = u.cls
)
SELECT cls,
  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
  CASE WHEN tp + fp > 0 THEN ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) END
    AS precision_,
  CASE WHEN tp + fn > 0 THEN ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) END
    AS recall_,
  CASE WHEN 2 * tp + fp + fn > 0 THEN
    ROUND(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6) END AS f1
FROM m
"""


@query("lang_id_class_f1", oracle=_class_f1_sql())
def lang_id_class_f1(spark, sf_dir):
    """Per-class precision/recall/F1 of the char-trigram NB lang-ID
    classifier (`lang_id_ngram_nb`) — the class breakdown kappa summarizes
    away (which languages the classifier actually finds vs which it
    hallucinates; r5's stopword heuristic had non-en recall 0 here, the NB
    is balanced across all five classes). tp/fp/fn stay exact integers
    from the confusion marginals; each metric is one guarded double
    division rounded at 6 (denominator-zero classes yield NULL, the
    stats.py convention). Same class-squared cell relation as
    lang_id_kappa — nothing downstream of the first agg is corpus-sized."""
    cells = _lang_cells(spark, sf_dir)
    rows_m = cells.groupBy(F.col("labeled").alias("cls")).agg(F.sum("n").alias("rn"))
    cols_m = cells.groupBy(F.col("predicted").alias("cls")).agg(
        F.sum("n").alias("cn")
    )
    diag = (
        cells.filter(F.col("labeled") == F.col("predicted"))
        .groupBy(F.col("labeled").alias("cls"))
        .agg(F.sum("n").alias("tp"))
    )
    uni = (
        rows_m.withColumnRenamed("cls", "_rc")
        .join(cols_m.withColumnRenamed("cls", "_cc"),
              F.col("_rc") == F.col("_cc"), "full_outer")
        .select(
            F.coalesce(F.col("_rc"), F.col("_cc")).alias("cls"),
            F.coalesce(F.col("rn"), F.lit(0)).alias("rn"),
            F.coalesce(F.col("cn"), F.lit(0)).alias("cn"),
        )
    )
    m = uni.join(diag, "cls", "left").select(
        "cls",
        F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
        (F.col("cn") - F.coalesce(F.col("tp"), F.lit(0))).alias("fp"),
        (F.col("rn") - F.coalesce(F.col("tp"), F.lit(0))).alias("fn"),
    )
    def ratio(num, den):
        return F.when(den > 0, F.round(num.cast("double") / den, 6))
    return m.select(
        "cls",
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.col("fn").cast("bigint").alias("fn"),
        ratio(F.col("tp"), F.col("tp") + F.col("fp")).alias("precision_"),
        ratio(F.col("tp"), F.col("tp") + F.col("fn")).alias("recall_"),
        ratio(2 * F.col("tp"), 2 * F.col("tp") + F.col("fp") + F.col("fn")).alias(
            "f1"
        ),
    )
