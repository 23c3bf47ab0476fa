"""Training-mixture construction: leakage-safe corpus splits and UniMax
language-budget allocation.

Two shapes every pretraining-data pipeline needs downstream of dedup and
quality filtering:

- ``leakage_safe_split``: train/val/test assignment where every exact-dup
  GROUP lands in one split (hash the group's representative, not the doc),
  so evaluation never sees a byte-identical copy of a training document —
  the split-leakage bug behind inflated benchmark numbers.
- ``unimax_language_budget``: UniMax (Chung et al. 2023, "UniMax: Fairer
  and More Effective Language Sampling for Large-Scale Multilingual
  Pretraining") — waterfilling a total token budget across languages under
  a per-language epoch cap, expressed as two window passes over the
  language-size relation (the closed form of the paper's greedy loop).

Determinism conventions as repo-wide: md5 hash gates (cross-engine), all
waterfilling in exact BIGINT arithmetic, one final rounded double.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from importer_spark.io import Tables
from importer_spark.queries.registry import query

# Split fractions in sixteenths of the md5-hex first char: 0-b train (12/16),
# c-d val (2/16), e-f test (2/16).
_SPLIT_SQL = """
WITH groups AS (
  -- exact-dup group representative: MIN doc_id over byte-identical text;
  -- a NULL text is its own singleton group (md5(NULL) would lump them)
  SELECT doc_id, lang, source,
    MIN(doc_id) OVER (
      PARTITION BY coalesce(md5(text), 'null-doc-' || CAST(doc_id AS VARCHAR))
    ) AS group_rep
  FROM documents
)
SELECT doc_id, lang, source, group_rep,
  CASE
    WHEN bucket < 12 THEN 'train'
    WHEN bucket < 14 THEN 'val'
    ELSE 'test'
  END AS split
FROM (
  SELECT *,
    strpos('0123456789abcdef',
           substr(md5(CAST(group_rep AS VARCHAR)), 1, 1)) - 1 AS bucket
  FROM groups
)
"""


@query("leakage_safe_split", oracle=_SPLIT_SQL)
def leakage_safe_split(spark, sf_dir):
    """Leakage-safe train/val/test split: docs are assigned by the md5
    bucket of their exact-dup GROUP representative (min doc_id per
    byte-identical text), so duplicated documents can never straddle the
    train/eval boundary. The deterministic-hash-gate pattern of
    llm_sampling (reproducible, no rand(), no state), composed with the
    dedup-group identity of docs_exact_dedup.

    Plan: ONE shuffle on the text hash (a window MIN over the group — at
    corpus scale the same shuffle exact dedup already pays, and the md5
    key distributes uniformly so no skew); the split gate itself is a
    zero-shuffle projection. Near-dup-safe variant: feed
    near_dup_clusters' cluster_id in as the group key — the assignment
    gate is identical."""
    t = Tables(spark, sf_dir)
    group_key = F.coalesce(
        F.md5("text"),
        F.concat(F.lit("null-doc-"), F.col("doc_id").cast("string")),
    )
    rep = F.min("doc_id").over(Window.partitionBy(group_key))
    bucket = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("group_rep").cast("string")), 1, 1),
        )
        - 1
    )
    return (
        t.documents.select(
            "doc_id", "lang", "source", rep.alias("group_rep")
        )
        .withColumn(
            "split",
            F.when(bucket < 12, "train").when(bucket < 14, "val").otherwise("test"),
        )
    )


# UniMax parameters: epoch cap E and total budget B = half the corpus's
# token count — deterministic, and small enough that low-resource languages
# hit their cap while high-resource ones share the waterline.
_UNIMAX_EPOCH_CAP = 4
_UNIMAX_BUDGET_NUM, _UNIMAX_BUDGET_DEN = 1, 2  # B = total_tokens * 1/2

_UNIMAX_SQL = f"""
WITH sizes AS (
  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
  GROUP BY lang
),
budget AS (
  SELECT CAST(SUM(n_tokens) * {_UNIMAX_BUDGET_NUM} // {_UNIMAX_BUDGET_DEN}
              AS BIGINT) AS b
  FROM sizes
),
ordered AS (
  SELECT lang, n_tokens,
    n_tokens * {_UNIMAX_EPOCH_CAP} AS cap,
    ROW_NUMBER() OVER (ORDER BY n_tokens * {_UNIMAX_EPOCH_CAP}, lang) AS i,
    COUNT(*) OVER () AS k,
    SUM(n_tokens * {_UNIMAX_EPOCH_CAP}) OVER (
      ORDER BY n_tokens * {_UNIMAX_EPOCH_CAP}, lang
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
  FROM sizes
),
-- waterline: first i whose cap exceeds an equal share of what remains
-- before it; every language below the line is fully capped
marked AS (
  SELECT o.*, b.b,
    MIN(CASE WHEN o.cap * (o.k - o.i + 1) > b.b - (o.prefix - o.cap)
             THEN o.i END) OVER () AS m,
    SUM(CASE WHEN o.cap * (o.k - o.i + 1) > b.b - (o.prefix - o.cap)
             THEN 0 ELSE o.cap END) OVER () AS capped_sum
  FROM ordered o CROSS JOIN budget b
)
SELECT lang, n_tokens, CAST(cap AS BIGINT) AS cap,
  CAST(CASE WHEN m IS NULL OR i < m THEN cap
            ELSE (b - capped_sum) // (k - m + 1) END AS BIGINT) AS alloc_tokens,
  ROUND(CAST(CASE WHEN m IS NULL OR i < m THEN cap
                  ELSE (b - capped_sum) // (k - m + 1) END AS DOUBLE)
        / n_tokens, 6) AS epochs
FROM marked
"""


def unimax_budget(sizes):
    """One-row budget relation ``b`` = floor(total_tokens * NUM / DEN) in
    EXACT integer arithmetic (r5 advice): the docstring/oracle promise
    BIGINT floor division, but ``* NUM / DEN`` routes through a double
    whose 53-bit mantissa diverges from DuckDB's exact int128 ``//`` once
    total tokens exceed 2^53. DECIMAL(38,0) multiply + DIV is exact and
    can't overflow at any corpus size a BIGINT sum can represent."""
    return sizes.agg(
        F.expr(
            "CAST(CAST(SUM(n_tokens) AS DECIMAL(38,0))"
            f" * {_UNIMAX_BUDGET_NUM} DIV {_UNIMAX_BUDGET_DEN} AS BIGINT)"
        ).alias("b")
    )


@query("unimax_language_budget", oracle=_UNIMAX_SQL)
def unimax_language_budget(spark, sf_dir):
    """UniMax language sampling (Chung et al. 2023): allocate a total token
    budget B across languages so every language gets an equal share of the
    waterline EXCEPT those whose entire corpus × epoch-cap is smaller —
    they contribute everything they have (never more than E epochs, the
    paper's repetition guard). The greedy loop has a closed form over the
    cap-sorted language list: prefix sums locate the waterline index m
    (first language whose cap exceeds an equal split of what remains
    before it), languages below m are fully capped, the rest split the
    leftover evenly.

    All in BIGINT (token counts, integer floor division) — no FP in the
    allocation itself, so cross-engine parity is exact; the final epochs
    ratio is the one rounded double. The distributed work is the per-language
    token count (one scan + map-side partial agg); the waterfilling runs on
    the languages-sized relation — thousands of rows at worst, one
    partition, two window passes."""
    t = Tables(spark, sf_dir)
    e_cap = _UNIMAX_EPOCH_CAP
    sizes = (
        t.documents.filter(F.col("text").isNotNull() & F.col("lang").isNotNull())
        .groupBy("lang")
        .agg(F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"))
    )
    budget = unimax_budget(sizes)
    w_ord = Window.orderBy(F.col("cap"), F.col("lang"))
    ordered = (
        sizes.withColumn("cap", F.col("n_tokens") * e_cap)
        .withColumn("i", F.row_number().over(w_ord))
        .withColumn("k", F.count("*").over(Window.partitionBy()))
        .withColumn(
            "prefix",
            F.sum("cap").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    over_line = (
        F.col("cap") * (F.col("k") - F.col("i") + 1)
        > F.col("b") - (F.col("prefix") - F.col("cap"))
    )
    w_all = Window.partitionBy()
    marked = (
        ordered.crossJoin(F.broadcast(budget))
        .withColumn("m", F.min(F.when(over_line, F.col("i"))).over(w_all))
        .withColumn(
            "capped_sum",
            F.sum(F.when(over_line, F.lit(0)).otherwise(F.col("cap"))).over(w_all),
        )
    )
    below = F.col("m").isNull() | (F.col("i") < F.col("m"))
    # Same exact-integer rule as B: `/` + floor would round the leftover
    # through a double; DIV keeps the equal-share split exact past 2^53.
    share = F.expr("(b - capped_sum) DIV (k - m + 1)")
    alloc = F.when(below, F.col("cap")).otherwise(share).cast("bigint")
    return marked.select(
        "lang",
        "n_tokens",
        F.col("cap").cast("bigint").alias("cap"),
        alloc.alias("alloc_tokens"),
        F.round(alloc.cast("double") / F.col("n_tokens"), 6).alias("epochs"),
    )
