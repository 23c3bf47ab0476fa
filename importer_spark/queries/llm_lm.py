"""N-gram language-model scoring over the documents table — the round-4
extension of the unigram fluency filter (`llm_text.py::unigram_logprob_scores`)
to a held-out bigram LM with stupid backoff, plus DSIR-style importance
weighting (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling" — hashed n-gram bucket distributions, public paper).

Both queries follow the repo's cross-engine determinism conventions: every
per-token log-prob is rounded to 9 places and accumulated as exact
DECIMAL so partial-aggregation order can never change a document's score;
ONE final double divide produces the reported average.

Train/score split: the LM trains on the deterministic half of the corpus
whose ``md5(doc_id)`` leading byte is even, and scores EVERY document —
so unseen bigrams/tokens actually occur and the backoff path is exercised
(a same-corpus LM would trivially contain every bigram it scores).
"""

from __future__ import annotations


from pyspark.sql import Window
from pyspark.sql import functions as F

from importer_spark.io import Tables
from importer_spark.operators.text import tokens
from importer_spark.queries.registry import query

# round(ln(0.4), 9): the stupid-backoff discount (Brants et al. 2007).
_BACKOFF = "-0.916290732"
# round(ln(1e-9), 9): OOV floor for tokens absent from the train vocabulary.
_OOV = "-20.723265837"

_BIGRAM_SQL = f"""
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
train AS (
  SELECT s.* FROM seq s JOIN documents d USING (doc_id)
  WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2))::BIGINT % 2 = 0
),
uni AS (SELECT cur AS tok, COUNT(*) AS c1 FROM train GROUP BY 1),
tot AS (SELECT SUM(c1) AS t FROM uni),
lp_uni AS (
  SELECT tok,
         c1 AS c_prev,
         CAST(ROUND(ln(c1::DOUBLE / t), 9) AS DECIMAL(18,9)) AS lpu
  FROM uni, tot
),
big AS (
  SELECT prev, cur, COUNT(*) AS c2 FROM train
  WHERE prev IS NOT NULL GROUP BY 1, 2
),
lp_big AS (
  SELECT b.prev, b.cur,
         CAST(ROUND(ln(b.c2::DOUBLE / u.c_prev), 9) AS DECIMAL(18,9)) AS lpb
  FROM big b JOIN lp_uni u ON u.tok = b.prev
),
scored AS (
  SELECT s.doc_id,
    CASE
      WHEN s.pos = 1 THEN COALESCE(u.lpu, CAST({_OOV} AS DECIMAL(18,9)))
      WHEN lb.lpb IS NOT NULL THEN lb.lpb
      ELSE CAST({_BACKOFF} AS DECIMAL(18,9))
           + COALESCE(u.lpu, CAST({_OOV} AS DECIMAL(18,9)))
    END AS lp,
    CASE WHEN s.pos > 1 AND lb.lpb IS NULL THEN 1 ELSE 0 END AS backed_off
  FROM seq s
  LEFT JOIN lp_uni u ON u.tok = s.cur
  LEFT JOIN lp_big lb ON lb.prev = s.prev AND lb.cur = s.cur
)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(backed_off) AS BIGINT) AS n_backoffs,
  ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_logprob,
  ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) >= -6.0 AS keep
FROM scored
GROUP BY doc_id
"""


@query("bigram_backoff_scores", oracle=_BIGRAM_SQL)
def bigram_backoff_scores(spark, sf_dir):
    """Bigram LM with stupid backoff (the KenLM/CCNet fluency-filter shape
    one order up from `unigram_logprob_scores`): P(w_i | w_{i-1}) from the
    train half's bigram counts, falling back to 0.4·P_uni(w_i) for unseen
    bigrams and an OOV floor for unseen tokens.

    Scale shape: sequencing is pure ARRAY algebra — (cur, prev) pairs come
    from zipping the token array with its shifted self before ONE
    posexplode, so there is no per-token window and no doc_id shuffle at
    all on the sequencing path (the oracle keeps the LAG formulation, so
    parity also certifies the rewrite). Train-side n-gram counts aggregate
    with map-side partials, and scoring joins key on the token / token-pair
    (AQE broadcasts the LM tables while they fit — a Heafield-style trie is
    the >memory path, but the relational join IS the distributed
    equivalent). Zero Python in the hot path."""
    t = Tables(spark, sf_dir)
    backoff = F.lit(_BACKOFF).cast("decimal(18,9)")
    oov = F.lit(_OOV).cast("decimal(18,9)")

    toks = tokens(F.col("text"))
    n = F.size(toks)
    prevs = F.concat(
        F.array(F.lit(None).cast("string")), F.slice(toks, 1, n - 1)
    )
    is_train = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("bigint")
        % 2
        == 0
    )
    seq = t.wide("documents").select(
        "doc_id",
        is_train.alias("is_train"),
        F.posexplode(F.arrays_zip(toks.alias("cur"), prevs.alias("prev"))).alias(
            "pos0", "pc"
        ),
    ).select(
        "doc_id",
        "is_train",
        (F.col("pos0") + 1).alias("pos"),
        F.col("pc.cur").alias("cur"),
        F.col("pc.prev").alias("prev"),
    )
    train = seq.filter("is_train")

    # ONE train-side aggregation feeds both LM orders (r10, guide §2.3):
    # every train row appears in exactly one (prev, cur) group — NULL prev
    # (pos 1) is its own group — so the unigram counts are the (prev, cur)
    # counts folded by cur, and the bigram table is the same relation with
    # the NULL-prev group dropped. The r9 form re-ran the corpus explode
    # for each of uni and big; now the explode feeding a train-side count
    # runs once and uni is a model-sized fold of it.
    cnt2 = train.groupBy("prev", "cur").agg(F.count("*").alias("c2"))
    uni = cnt2.groupBy(F.col("cur").alias("tok")).agg(F.sum("c2").alias("c1"))
    tot = uni.agg(F.sum("c1").alias("t"))
    lp_uni = uni.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.col("c1").alias("c_prev"),
        F.round(F.log(F.col("c1").cast("double") / F.col("t")), 9)
        .cast("decimal(18,9)")
        .alias("lpu"),
    )
    big = cnt2.filter(F.col("prev").isNotNull())
    lp_big = big.join(
        lp_uni.select(F.col("tok").alias("prev"), "c_prev"), "prev"
    ).select(
        "prev",
        "cur",
        F.round(F.log(F.col("c2").cast("double") / F.col("c_prev")), 9)
        .cast("decimal(18,9)")
        .alias("lpb"),
    )

    scored = (
        seq.join(lp_uni.select(F.col("tok").alias("cur"), "lpu"), "cur", "left")
        .join(lp_big, ["prev", "cur"], "left")
        .select(
            "doc_id",
            F.when(F.col("pos") == 1, F.coalesce(F.col("lpu"), oov))
            .when(F.col("lpb").isNotNull(), F.col("lpb"))
            .otherwise(backoff + F.coalesce(F.col("lpu"), oov))
            .alias("lp"),
            F.when(
                (F.col("pos") > 1) & F.col("lpb").isNull(), F.lit(1)
            )
            .otherwise(F.lit(0))
            .alias("backed_off"),
        )
    )
    avg = F.round(F.sum("lp").cast("double") / F.count("*"), 6)
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum("backed_off").cast("bigint").alias("n_backoffs"),
        avg.alias("avg_logprob"),
        (avg >= -6.0).alias("keep"),
    )


_N_BUCKETS = 1024

_DSIR_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         UNNEST(string_split(text, ' ')) AS cur,
         UNNEST(range(1, len(string_split(text, ' ')) + 1)) AS pos
  FROM documents
),
seq AS (
  SELECT doc_id, cur,
         LAG(cur) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM tok
),
feats AS (
  SELECT doc_id,
    ('0x' || substr(md5(cur), 1, 6))::BIGINT % {_N_BUCKETS} AS bucket
  FROM seq
  UNION ALL
  SELECT doc_id,
    ('0x' || substr(md5(prev || ' ' || cur), 1, 6))::BIGINT % {_N_BUCKETS} AS bucket
  FROM seq WHERE prev IS NOT NULL
),
raw_cnt AS (SELECT bucket, COUNT(*) AS cr FROM feats GROUP BY 1),
tgt_cnt AS (
  SELECT f.bucket, COUNT(*) AS ct
  FROM feats f JOIN documents d USING (doc_id)
  WHERE d.lang = 'en'
  GROUP BY 1
),
tots AS (
  SELECT (SELECT SUM(cr) FROM raw_cnt) AS tr,
         (SELECT COALESCE(SUM(ct), 0) FROM tgt_cnt) AS tt
),
ratio AS (
  SELECT r.bucket,
    CAST(ROUND(
      ln((COALESCE(g.ct, 0) + 1)::DOUBLE / (t.tt + {_N_BUCKETS}))
      - ln((r.cr + 1)::DOUBLE / (t.tr + {_N_BUCKETS})), 9) AS DECIMAL(18,9))
      AS log_ratio
  FROM raw_cnt r LEFT JOIN tgt_cnt g ON g.bucket = r.bucket
  CROSS JOIN tots t
)
SELECT f.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_feats,
  ROUND(CAST(SUM(r.log_ratio) AS DOUBLE) / COUNT(*), 6) AS avg_log_ratio,
  ROUND(CAST(SUM(r.log_ratio) AS DOUBLE) / COUNT(*), 6) > 0.0 AS selected
FROM feats f JOIN ratio r USING (bucket)
GROUP BY f.doc_id
"""


@query("dsir_importance_weights", oracle=_DSIR_SQL)
def dsir_importance_weights(spark, sf_dir):
    """DSIR importance weights: hashed n-gram features (unigrams + bigrams →
    md5 buckets), Laplace-smoothed bucket distributions for the target
    domain (lang='en') vs the raw corpus, and each document scored by its
    mean feature log importance ratio ln(p_target/p_raw). Documents whose
    n-gram profile looks like the target domain score positive and are
    selected — the paper's resampling gate with a deterministic threshold.

    Scale shape: the feature stream is ONE explode of the concatenated
    unigram+bigram array (bigrams by zipping the token array with its
    shifted self — no window, no doc_id shuffle, ONE scan of documents);
    both distributions are {_N_BUCKETS}-bucket aggregates with map-side
    combine, and the {_N_BUCKETS}-row ratio table broadcasts into the
    scoring join — per-document cost is O(features), global state is
    O(buckets). Hash-bucketing is exactly what makes this 100 TB-safe: the
    LM never materializes a vocabulary."""
    t = Tables(spark, sf_dir)

    def bucket_of(col):
        return (
            F.conv(F.substring(F.md5(col), 1, 6), 16, 10).cast("bigint")
            % _N_BUCKETS
        )

    toks = tokens(F.col("text"))
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    # r10: the raw and target distributions come out of ONE aggregation
    # over ONE feature stream — the r9 form joined the stream against an
    # en-doc id relation (a second full tokenize+explode pass plus an SMJ
    # that shuffled every feature row) and then aggregated raw and target
    # in separate branches. Carrying the is-target flag on the stream
    # (computed from `lang` before the explode) makes the target count a
    # conditional aggregate of the same pass: two fewer evaluations of the
    # corpus-wide feature pipeline and no feature-stream join at all. The
    # totals ride a single-partition window over the ≤_N_BUCKETS count
    # rows (bounded model state, same pattern as operators/ranks offsets)
    # instead of two more aggregation branches + a nested-loop cross join.
    feats = t.wide("documents").select(
        "doc_id",
        (F.col("lang") == "en").alias("_en"),
        F.explode(F.concat(toks, bigrams)).alias("feat"),
    ).select("doc_id", "_en", bucket_of(F.col("feat")).alias("bucket"))
    cnt = feats.groupBy("bucket").agg(
        F.count("*").alias("cr"),
        F.count(F.when(F.col("_en"), F.lit(1))).alias("ct0"),
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ratio = (
        cnt.select(
            "bucket",
            "cr",
            # ct=NULL never reaches the log: the r9 left join produced NULL
            # for en-empty buckets and coalesced to 0; the conditional
            # count produces 0 directly. NULLIF restores the exact r9
            # column so the expression below is character-identical.
            F.nullif(F.col("ct0"), F.lit(0)).alias("ct"),
            F.sum("cr").over(w_all).alias("tr"),
            F.coalesce(F.sum(F.col("ct0")).over(w_all), F.lit(0)).alias("tt"),
        )
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                    / (F.col("tt") + _N_BUCKETS)
                )
                - F.log((F.col("cr") + 1).cast("double") / (F.col("tr") + _N_BUCKETS)),
                9,
            )
            .cast("decimal(18,9)")
            .alias("log_ratio"),
        )
    )
    avg = F.round(F.sum("log_ratio").cast("double") / F.count("*"), 6)
    return (
        feats.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_feats"),
            avg.alias("avg_log_ratio"),
            (avg > 0.0).alias("selected"),
        )
    )
