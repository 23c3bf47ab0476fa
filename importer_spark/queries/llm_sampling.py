"""Corpus curation operators: stratified sampling, PII redaction, sequence
packing, and per-document top terms — the selection/safety/batching steps of
a training-data pipeline (BASELINE.json LLM-pipeline operators; complements
the dedup/quality operators in llm_dedup.py / llm_text.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from importer_spark.io import Tables
from importer_spark.queries.llm_tfidf import _TFIDF_SQL, tfidf_weights
from importer_spark.queries.registry import query

# Per-language keep rates expressed as md5-hex-prefix buckets (x/16). A
# deterministic hash gate — not rand() — so the sample is reproducible across
# engines, runs, and retries (rand() would also break oracle parity).
_LANG_BUCKETS = {"en": 8, "de": 4, "es": 4, "fr": 4, "zh": 2}
_DEFAULT_BUCKETS = 1

_STRAT_CASE = "CASE lang {} ELSE {} END".format(
    " ".join(f"WHEN '{lang}' THEN {k}" for lang, k in _LANG_BUCKETS.items()),
    _DEFAULT_BUCKETS,
)

_STRAT_SQL = f"""
WITH g AS (
  SELECT doc_id, lang,
    strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
      AS bucket,
    {_STRAT_CASE} AS keep_buckets
  FROM documents
)
SELECT doc_id, lang, CAST(bucket AS INTEGER) AS bucket
FROM g WHERE bucket < keep_buckets
"""


def _bucket_expr():
    """0-15 sampling bucket from the first md5-hex char of the doc id."""
    return (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
        )
        - 1
    )


def _keep_expr():
    """Per-language keep-bucket count (the _LANG_BUCKETS rate table)."""
    keep = F.lit(_DEFAULT_BUCKETS)
    for lang, k in reversed(_LANG_BUCKETS.items()):
        keep = F.when(F.col("lang") == lang, F.lit(k)).otherwise(keep)
    return keep


_PACK_ID_BUCKET_WIDTH = 256


def with_pack_id(df, bucket_width: int = _PACK_ID_BUCKET_WIDTH):
    """Add ``pack_id`` = floor(preceding-token-sum / budget) per language
    stream, via DISTRIBUTED prefix sum — a naive one-window form funnels an
    entire language through a single task at 100 TB.

    Exact two-phase cumsum (integer sums are associative, so the split is
    lossless): doc_id ranges bucket the stream order-preservingly; a
    running sum WITHIN each (lang, bucket) runs parallel across buckets,
    while the per-lang sequential window runs only over the per-bucket
    totals to produce each bucket's offset; before = offset + within.
    ``df`` must carry (doc_id, lang, n_tokens); a NULL lang forms its own
    stream (null-safe join), matching the window form it replaces.

    ``bucket_width``: any value preserves results — it only trades the
    offsets relation's size (n_docs/width rows) against within-bucket
    parallelism; size it so that relation stays comfortably joinable, and
    recurse the same construction if one level cannot."""
    bucket = F.floor(F.col("doc_id") / bucket_width)
    w_in = (
        Window.partitionBy("lang", "_pb")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_off = (
        Window.partitionBy("lang")
        .orderBy("_pb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = df.withColumn("_pb", bucket)
    offs = (
        toks.groupBy("lang", "_pb")
        .agg(F.sum("n_tokens").alias("_bsum"))
        .withColumn("_off", F.coalesce(F.sum("_bsum").over(w_off), F.lit(0)))
        .select(
            F.col("lang").alias("_olang"), F.col("_pb").alias("_opb"), "_off"
        )
    )
    before = F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)) + F.col("_off")
    # deliberately NOT broadcast-hinted: a hint would force collecting offs
    # to the driver at ANY size (n_docs/bucket_width rows can be large at
    # corpus scale); AQE promotes this join to broadcast at runtime whenever
    # offs is actually small, which is the right call in both regimes
    return (
        toks.join(
            offs,
            F.col("lang").eqNullSafe(F.col("_olang")) & (F.col("_pb") == F.col("_opb")),
        )
        .withColumn("pack_id", F.floor(before / _PACK_BUDGET).cast("bigint"))
        .drop("_pb", "_off", "_olang", "_opb")
    )


@query("stratified_sample", oracle=_STRAT_SQL)
def stratified_sample(spark, sf_dir):
    """Stratified downsampling by language with per-stratum rates (en 50%,
    de/es/fr 25%, zh 12.5%) — the language-rebalancing step of corpus
    curation. The gate is a pure column expression on a content-independent
    hash: no shuffle, no state, embarrassingly parallel, and adding strata
    never resamples existing ones."""
    t = Tables(spark, sf_dir)
    return (
        t.documents.select(
            "doc_id", "lang", _bucket_expr().cast("int").alias("bucket"),
            _keep_expr().alias("k"),
        )
        .filter(F.col("bucket") < F.col("k"))
        .drop("k")
    )


# Synthetic contact blob: the customer table carries no phone/email columns,
# so we derive a deterministic one per row — the REDACTION path (regex find /
# count / replace) is the operator under test, and it sees realistic shapes.
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"

_PII_SQL = f"""
WITH blob AS (
  SELECT c_custkey,
    lower(replace(c_name, ' ', '.')) || '@example.com contact ' ||
    '+1-' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
    lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0') || '-' ||
    lpad(CAST((c_custkey * 13) % 10000 AS VARCHAR), 4, '0') AS contact
  FROM customer
)
SELECT c_custkey,
  len(regexp_extract_all(contact, '{_EMAIL_RE}')) AS n_emails,
  len(regexp_extract_all(contact, '{_PHONE_RE}')) AS n_phones,
  regexp_replace(regexp_replace(contact, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM blob
"""


@query("pii_redaction", oracle=_PII_SQL)
def pii_redaction(spark, sf_dir):
    """PII scrubbing: count + mask emails and phone numbers with global
    regex replace (ASCII character classes only, so Java and RE2 regex
    engines agree). Pure per-row column expressions — the 100 TB plan is a
    map-only scan with zero shuffle.

    Known engine-semantics boundary (Unicode gate, one_to_many_case
    class): the blob's `lower()` uses the JVM's FULL case mapping (İ →
    'i'+U+0307, two codepoints) while DuckDB's utf8proc uses the simple
    map (İ → 'i') — the redacted text then differs on exactly those
    codepoints. Routed via run_local_gate
    `--boundary pii_redaction=values~in \\['redacted'\\]~…`; the regex/count
    semantics themselves are engine-identical (ASCII classes)."""
    t = Tables(spark, sf_dir)
    pad3 = lambda c: F.lpad(c.cast("string"), 3, "0")  # noqa: E731
    contact = F.concat(
        F.lower(F.replace(F.col("c_name"), F.lit(" "), F.lit("."))),
        F.lit("@example.com contact +1-"),
        pad3(F.col("c_custkey") % 1000),
        F.lit("-"),
        pad3((F.col("c_custkey") * 7) % 1000),
        F.lit("-"),
        F.lpad(((F.col("c_custkey") * 13) % 10000).cast("string"), 4, "0"),
    )
    blob = t.customer.select("c_custkey", contact.alias("contact"))
    return blob.select(
        "c_custkey",
        F.size(F.regexp_extract_all(F.col("contact"), F.lit(_EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(F.col("contact"), F.lit(_PHONE_RE), F.lit(0))).alias(
            "n_phones"
        ),
        F.regexp_replace(
            F.regexp_replace(F.col("contact"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
    )


_PACK_BUDGET = 2048

_PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, lang, n_tokens,
    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS before
  FROM toks
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(COALESCE(before, 0) // {_PACK_BUDGET} AS BIGINT) AS pack_id
FROM cum
"""


@query("sequence_packing", oracle=_PACK_SQL)
def sequence_packing(spark, sf_dir):
    """Sequence packing: assign documents to fixed token-budget training
    batches (2048 tokens) by running token count within each language
    stream — the batch-construction step before tokenized examples ship to
    trainers. Streaming-shaped (one window pass, no driver loop); packs are
    contiguous in doc_id order so shard boundaries are reproducible. A
    straddling doc belongs to the pack its FIRST token falls in (floor of
    the preceding cumulative count / budget)."""
    t = Tables(spark, sf_dir)
    toks = t.documents.select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    return with_pack_id(toks).select("doc_id", "lang", "n_tokens", "pack_id")


_TOP_TERMS_SQL = """
WITH base AS ({base}),
ranked AS (
  SELECT doc_id, term, tfidf,
    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
  FROM base
)
SELECT doc_id, term, tfidf, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 3
""".format(base=_TFIDF_SQL.strip())


@query("top_terms_per_doc", oracle=_TOP_TERMS_SQL)
def top_terms_per_doc(spark, sf_dir):
    """Per-document top-3 distinguishing terms: row_number over the TF-IDF
    relation with a deterministic tie-break (score desc, term asc — scores
    are 6dp-rounded identically in both engines, so ordering is total and
    portable). The keyword-extraction step of corpus indexing."""
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        tfidf_weights(spark, sf_dir)
        .select("doc_id", "term", "tfidf", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


_CAP_K = 50

_CAP_SQL = f"""
WITH ranked AS (
  SELECT doc_id, lang,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rnk
  FROM documents
)
SELECT doc_id, lang, rnk FROM ranked WHERE rnk <= {_CAP_K}
"""


_CAP_BUCKETS = 8


@query("language_capped_sample", oracle=_CAP_SQL)
def language_capped_sample(spark, sf_dir):
    """Per-stratum cap: at most K docs per language, selected by
    deterministic hash order (a seeded shuffle that never resamples).
    Complement of stratified_sample's rate gate — rates bound proportions,
    caps bound absolute volume (the 'no language may exceed K examples'
    curriculum rule).

    Two-phase rank so no single stratum ever funnels through one task:
    phase 1 ranks within (lang, hash-bucket) and keeps each bucket's top K
    — any global top-K row is also top-K in its own bucket, so nothing is
    lost — then phase 2 ranks the surviving ≤ K·n_buckets rows per lang.
    The full stratum never sorts in one partition; only K·n_buckets
    finalists do."""
    t = Tables(spark, sf_dir)
    order = [F.md5(F.col("doc_id").cast("string")), F.col("doc_id")]
    bucket = F.pmod(F.xxhash64("doc_id"), F.lit(_CAP_BUCKETS))
    w1 = Window.partitionBy("lang", bucket).orderBy(*order)
    finalists = (
        t.documents.select("doc_id", "lang")
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= _CAP_K)
    )
    w2 = Window.partitionBy("lang").orderBy(*order)
    return (
        finalists.select(
            "doc_id", "lang", F.row_number().over(w2).cast("int").alias("rnk")
        )
        .filter(F.col("rnk") <= _CAP_K)
    )


# floor(log2) via the BINARY-STRING length of the integer — genuinely
# integer-portable. A floating ln(n+1)/ln(2) sits exactly on an integer when
# n+1 is a power of two, where a 1-ulp libm disagreement between engines
# flips the bucket.
_HIST_SQL = """
WITH toks AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
),
b AS (
  SELECT CAST(length(bin(n + 1)) - 1 AS INTEGER) AS log2_bucket, n FROM toks
)
SELECT log2_bucket,
  CAST(POWER(2, log2_bucket) AS BIGINT) AS bucket_floor,
  COUNT(*) AS n_docs,
  CAST(MIN(n) AS BIGINT) AS min_tokens,
  CAST(MAX(n) AS BIGINT) AS max_tokens
FROM b GROUP BY 1 ORDER BY 1
"""


@query("doc_length_histogram", oracle=_HIST_SQL)
def doc_length_histogram(spark, sf_dir):
    """Token-length histogram in log2 buckets — the length profile that
    drives context-budget and truncation decisions before packing. The
    bucket is the binary-string length of n+1 minus one (exact integer
    floor(log2) — see the SQL comment on why a floating log is NOT
    portable); one map-side combinable agg."""
    t = Tables(spark, sf_dir)
    n = F.size(F.split("text", " "))
    bucket = (F.length(F.bin((n + 1).cast("bigint"))) - 1).cast("int")
    return (
        t.documents.select(n.alias("n"), bucket.alias("log2_bucket"))
        .groupBy("log2_bucket")
        .agg(
            F.pow(F.lit(2.0), F.col("log2_bucket")).cast("bigint").alias("bucket_floor"),
            F.count("*").alias("n_docs"),
            F.min("n").cast("bigint").alias("min_tokens"),
            F.max("n").cast("bigint").alias("max_tokens"),
        )
        .select("log2_bucket", "bucket_floor", "n_docs", "min_tokens", "max_tokens")
    )


_CURATION_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, text,
    len(string_split(text, ' ')) AS n_tokens,
    len(list_distinct(string_split(text, ' '))) AS n_unique
  FROM documents
),
quality AS (
  SELECT * FROM toks
  WHERE n_tokens BETWEEN 20 AND 2000
    AND n_unique::DOUBLE / NULLIF(n_tokens, 0) > 0.05
),
canonical AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM quality
),
deduped AS (SELECT doc_id, lang, n_tokens FROM canonical WHERE rn = 1),
sampled AS (
  SELECT * FROM deduped
  WHERE strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
        < {_STRAT_CASE}
),
packed AS (
  SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // {_PACK_BUDGET}
      AS BIGINT) AS pack_id
  FROM sampled
)
SELECT * FROM packed
"""


@query("curation_pipeline", oracle=_CURATION_SQL)
def curation_pipeline(spark, sf_dir):
    """The capstone composition: quality gate → exact-dedup canonicalization
    → stratified hash sampling → sequence packing, as ONE declarative plan.
    Each stage narrows the data before the next (filter pushes into the
    scan; dedup and packing share nothing but survive in one pipeline), and
    Catalyst fuses the whole chain — no intermediate materialization. This
    is the shape a production corpus build ships as a single job."""
    t = Tables(spark, sf_dir)
    toks = F.split("text", " ")
    base = t.documents.select(
        "doc_id",
        "lang",
        "text",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
    )
    quality = base.filter(
        F.col("n_tokens").between(20, 2000)
        & (F.col("n_unique").cast("double") / F.nullif(F.col("n_tokens"), F.lit(0)) > 0.05)
    )
    w_dedup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        quality.withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "n_tokens")
    )
    sampled = deduped.filter(_bucket_expr() < _keep_expr()).select(
        "doc_id", "lang", F.col("n_tokens").cast("bigint").alias("n_tokens")
    )
    return with_pack_id(sampled).select("doc_id", "lang", "n_tokens", "pack_id")


# --- temperature-scaled domain mixture --------------------------------------
_MIX_TOTAL = 600  # target corpus size after reweighting
# alpha = 0.5 temperature: weight_d = isqrt(n_d). Integer square roots keep
# the whole weight computation in exact integer arithmetic (IEEE sqrt of an
# int is correctly rounded, so floor(sqrt(n)) is stable in both engines) —
# no float summation order to diverge between Spark and the oracle.

_MIX_SQL = f"""
WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
w AS (SELECT source, n, CAST(FLOOR(SQRT(n)) AS BIGINT) AS wt FROM counts),
s AS (SELECT SUM(wt) AS total_wt FROM w),
t AS (
  SELECT source, n, CAST(LEAST(({_MIX_TOTAL} * wt) // s.total_wt, n) AS BIGINT) AS domain_target
  FROM w, s
),
ranked AS (
  SELECT d.doc_id, d.source, t.n AS domain_docs, t.domain_target,
         ROW_NUMBER() OVER (
           PARTITION BY d.source
           ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
         ) AS rn
  FROM documents d JOIN t USING (source)
)
SELECT doc_id, source, domain_docs, domain_target
FROM ranked WHERE rn <= domain_target
"""


@query("domain_mixture_sample", oracle=_MIX_SQL)
def domain_mixture_sample(spark, sf_dir):
    """Temperature-scaled domain mixture (the Pile/DoReMi reweighting step):
    sample each source domain proportionally to n_d^0.5, so rare domains are
    upweighted relative to their natural share before training. Weights are
    integer square roots and the per-domain quota is exact integer division
    — bit-identical across engines — and the rows kept are the quota's
    smallest md5(doc_id) values: a reproducible hash gate, not rand(), so
    retries and backfills select the same sample.

    Scale shape: the domain→quota table is a tiny broadcast; the corpus
    pays one hash evaluation and one per-domain top-quota window. At 100 TB
    the window is the only shuffle, keyed by domain — skewed domains are
    exactly the capped ones, and the two-phase top-K rewrite used by
    language_capped_sample applies unchanged if a single domain dominates."""
    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "source")
    counts = docs.groupBy("source").agg(F.count("*").alias("n"))
    w = counts.select(
        "source", "n", F.floor(F.sqrt(F.col("n"))).cast("bigint").alias("wt")
    )
    s = w.agg(F.sum("wt").alias("total_wt"))
    targets = w.crossJoin(F.broadcast(s)).select(
        "source",
        F.col("n").alias("domain_docs"),
        F.least(
            F.expr(f"({_MIX_TOTAL} * wt) div total_wt"), F.col("n")
        ).alias("domain_target"),
    )
    ranked = docs.join(F.broadcast(targets), "source").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
            )
        ),
    )
    return ranked.filter(F.col("rn") <= F.col("domain_target")).select(
        "doc_id", "source", "domain_docs", "domain_target"
    )


_ORDER_SQL = f"""
WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
w AS (SELECT source, n, CAST(FLOOR(SQRT(n)) AS BIGINT) AS wt FROM counts),
s AS (SELECT SUM(wt) AS total_wt FROM w),
t AS (
  SELECT source, n, CAST(LEAST(({_MIX_TOTAL} * wt) // s.total_wt, n) AS BIGINT) AS domain_target
  FROM w, s
),
ranked AS (
  SELECT d.doc_id, d.source, t.domain_target,
         ROW_NUMBER() OVER (
           PARTITION BY d.source
           ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
         ) AS rn
  FROM documents d JOIN t USING (source)
),
sampled AS (SELECT doc_id, source, rn FROM ranked WHERE rn <= domain_target)
SELECT doc_id, source,
  CAST(ROW_NUMBER() OVER (ORDER BY rn, source) AS BIGINT) AS train_pos
FROM sampled
"""


@query("training_order_manifest", oracle=_ORDER_SQL)
def training_order_manifest(spark, sf_dir):
    """Deterministic training-order manifest over the mixture sample:
    round-robin interleave of domains (sort by per-domain sequence, then
    domain) so no contiguous run of one domain appears in the training
    stream — the data-ordering step after mixture sampling, reproducible
    across retries because every key is a hash rank, not a shuffle. The
    global position window runs over the SAMPLED rows only (quota-bounded,
    tiny); at larger sample sizes the distributed-rank operator
    (operators/ranks.py) swaps in for the final window unchanged."""
    sampled = domain_mixture_sample(spark, sf_dir)
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    seq = sampled.withColumn("rn", rn)
    return seq.select(
        "doc_id",
        "source",
        F.row_number()
        .over(Window.orderBy("rn", "source"))
        .cast("bigint")
        .alias("train_pos"),
    )
