"""Text-analysis operators for LLM-data pipelines (BASELINE.json north star):
tokenization, shingling, language-ID scoring, quality scoring, fingerprints,
MinHash signatures, SimHash. All pure Column expressions over arrays — no
Python UDFs, so everything stays JVM-side and codegen-eligible; at 100 TB the
per-row cost is a handful of hash calls.

Hashing convention: md5 hex strings compared lexicographically. This is
engine-portable (identical in any md5+utf8 system), unlike 64-bit integer
hashes whose overflow semantics differ.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX = "0123456789abcdef"

STOPWORDS = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "das", "und"],
    "es": ["el", "la", "los", "y"],
    "fr": ["le", "les", "et", "dans"],
    "zh": ["的", "是", "了", "在"],
}
LANG_PRECEDENCE = ["en", "de", "es", "fr", "zh"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (documents are single-spaced)."""
    return F.split(text, " ")


def quality_score(text: Column) -> Column:
    """Length/diversity/char-density quality composite — the SAME formula
    the oracle-certified `doc_quality_scores` query (queries/llm_text.py)
    and the `dedup_keep_best` survivor policy pin; exposed as a Column
    function so pipelines (e.g. the `refine` CLI) can score arbitrary text
    columns without re-deriving it. Rounded to 6 places (house rule)."""
    t = tokens(text)
    nt = F.size(t)
    diversity = F.size(F.array_distinct(t)).cast("double") / F.nullif(nt, F.lit(0))
    return F.round(
        F.least(F.lit(100.0), nt / 5.0) * 0.4
        + diversity * 100.0 * 0.4
        + F.least(
            F.lit(100.0),
            F.length(text).cast("double") / F.nullif(nt, F.lit(0)) * 10.0,
        )
        * 0.2,
        6,
    )


def unigram_avg_logprob(df, id_col: str, text_col: str):
    """Unigram-LM fluency scores with the corpus itself as the LM — the
    DataFrame-level core of the oracle-certified `unigram_logprob_scores`
    query (queries/llm_text.py), factored out so pipelines (the `refine`
    CLI, cleaned-text scoring) compose the SAME certified derivation
    instead of re-implementing it. Returns (id_col, n_tokens,
    avg_logprob): token log-probs from corpus frequencies rounded to 9
    places at birth, summed as exact DECIMAL(18,9), ONE double divide
    rounded to 6 (the repo's cross-engine determinism convention).

    Scale shape: one token explode feeds both the vocabulary build and the
    scoring join; the one-row total broadcasts back; the score join keys
    on the token (AQE broadcasts the vocab while it fits)."""
    tok = df.select(id_col, F.explode(tokens(F.col(text_col))).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        F.round(F.log(F.col("cnt").cast("double") / F.col("total")), 9)
        .cast("decimal(18,9)")
        .alias("lp"),
    )
    per = (
        tok.join(lp, "tok")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_tokens"), F.sum("lp").alias("s"))
    )
    return per.select(
        id_col,
        "n_tokens",
        F.round(F.col("s").cast("double") / F.col("n_tokens"), 6).alias(
            "avg_logprob"
        ),
    )


def value_tercile_buckets(
    df,
    part_cols: list[str],
    val_col: str,
    out_col: str = "bucket",
    labels: tuple[str, str, str] = ("head", "middle", "tail"),
):
    """CCNet-style head/middle/tail tiers by VALUE thresholds: per
    partition key, exact tercile cut points come out of ONE aggregation (a
    keys-sized relation that broadcasts back) and each row's tier is a
    comparison against its key's cuts — no per-key global sort (the
    single-task-window anti-pattern). The certified
    `ccnet_perplexity_buckets` query runs exactly this shape; the tie
    analysis lives in its docstring (pre-rounded values vs interpolated
    cuts). Ties on a cut value land in the upper tier.

    NULL partition keys are a rankable partition, not dropped (the
    PARTITION BY convention, same as operators/ranks.grouped_row_number):
    the cuts relation joins back null-safely, so e.g. NULL-lang documents
    get tiered within their own cohort instead of silently vanishing from
    the output — the r5-advice refine-CLI data-loss path."""
    from importer_spark.operators.ranks import null_safe_key_join

    cuts = df.groupBy(*part_cols).agg(
        F.percentile(F.col(val_col), F.lit(1.0 / 3.0)).alias("_q1"),
        F.percentile(F.col(val_col), F.lit(2.0 / 3.0)).alias("_q2"),
    )
    bucket = (
        F.when(F.col(val_col) >= F.col("_q2"), F.lit(labels[0]))
        .when(F.col(val_col) >= F.col("_q1"), F.lit(labels[1]))
        .otherwise(F.lit(labels[2]))
    )
    return (
        null_safe_key_join(df, F.broadcast(cuts), part_cols)
        .withColumn(out_col, bucket)
        .drop("_q1", "_q2")
    )


def lsh_band_keys(sig_cols: list[Column], band_size: int) -> list[Column]:
    """Group signature components into bands; equal band key → candidate pair.
    With r rows/band and b bands, P(candidate) = 1-(1-j^r)^b."""
    assert len(sig_cols) % band_size == 0
    return [
        F.md5(F.concat_ws("|", *sig_cols[b : b + band_size]))
        for b in range(0, len(sig_cols), band_size)
    ]


def jaccard(a: Column, b: Column, scale: int | None = None) -> Column:
    """Set Jaccard of two string arrays (exact int/int division — portable)."""
    j = F.size(F.array_intersect(a, b)).cast("double") / F.size(F.array_union(a, b))
    return F.round(j, scale) if scale is not None else j


def lang_scores(toks: Column) -> dict[str, Column]:
    """Stopword-hit count per language, with term frequency (the n-gram
    heuristic from SURVEY §7.4 / BASELINE text-analysis ops)."""
    def hits(ws):
        def pred(t):
            cond = t == ws[0]
            for w in ws[1:]:
                cond = cond | (t == w)
            return cond

        return F.size(F.filter(toks, pred))

    return {lang: hits(ws) for lang, ws in STOPWORDS.items()}


def lang_predict(scores: dict[str, Column]) -> Column:
    """Argmax with fixed precedence order for ties; 'unknown' when all zero."""
    g = F.greatest(*scores.values())
    expr = F.when(g == 0, "unknown")
    for lang in LANG_PRECEDENCE:
        expr = expr.when(scores[lang] == g, lang)
    return expr.otherwise("unknown")


def simhash32(md5_hex: Column, bit: int) -> Column:
    """±1 contribution of one token's hash to SimHash bit ``bit`` (0..31):
    bit b of the first 8 hex chars of md5 (big-endian nibbles, so bit b is
    (value >> (31-b)) & 1). Decode with :func:`simhash_prefix_long` once per
    token and pass the LONG here — 32 integer shift/mask votes on one
    column stay in whole-stage codegen, vs. the per-bit substring+strpos
    string decode this replaces (measured ~2× on the fingerprint agg at
    10× bench scale). The SQL oracle keeps the per-hex-char form; the bit
    arithmetic is provably identical: 4·(7−b÷4)+(3−b%4) = 31−b."""
    b = F.shiftright(md5_hex, 31 - bit).bitwiseAND(F.lit(1))
    return F.when(b == 1, 1).otherwise(-1)


def simhash_prefix_long(md5_hex: Column) -> Column:
    """First 8 hex chars of an md5 digest as a BIGINT (one string decode
    per token; every SimHash bit then reads this long)."""
    return F.conv(F.substring(md5_hex, 1, 8), 16, 10).cast("bigint")


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace,
    strip (reference X3 normalize_customer_name analog:
    domain_consolidation.py:102-132)."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
