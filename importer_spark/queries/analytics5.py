"""Round-5 analytics extensions: learned text classification and
distribution-drift measurement over the documents table — the two
model-driven curation steps between dedup and sampling in an LLM data
pipeline (CCNet/Gopher-style source/quality classifiers; per-source drift
monitors).

Cross-engine determinism follows the llm_lm.py convention: every log
term is rounded to 9 places and accumulated as exact DECIMAL, so
partial-aggregation order can never change a score; the ONLY doubles that
cross an aggregation boundary are already-quantized decimals. Train/score
split reuses the md5(doc_id)-even rule so unseen tokens genuinely occur.

Reference parity: the reference pipeline has no learned curation — its
quality layer is declarative rules (models/staging/schema.yml
accepted-values/not-null tests; dbt singular tests). These queries extend
that layer with the model-driven steps a training-data pipeline adds on
top: Naive Bayes (Manning et al., IR book ch.13 — public), KL drift, E-S
weighted reservoir sampling (Efraimidis & Spirakis 2006), SemDeDup-cell
hard negatives (Abbas et al. 2023).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from importer_spark.io import Tables
from importer_spark.operators.text import tokens
from importer_spark.queries.registry import query

_DEC = "decimal(18,9)"

# md5(doc_id) leading byte even -> train (same rule as llm_lm.py).
_TRAIN_SQL = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT % 2 = 0"

_NB_SQL = f"""
WITH tok AS (
  SELECT doc_id, source, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
train AS (SELECT * FROM tok WHERE {_TRAIN_SQL} AND source IS NOT NULL),
cnt AS (SELECT source AS cls, tok, COUNT(*) AS c FROM train GROUP BY 1, 2),
tot AS (SELECT cls, SUM(c) AS t FROM cnt GROUP BY 1),
vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM train),
trdocs AS (
  SELECT source AS cls, COUNT(*) AS nd FROM documents
  WHERE {_TRAIN_SQL} AND source IS NOT NULL GROUP BY 1
),
tottr AS (SELECT SUM(nd) AS ndt FROM trdocs),
lp AS (
  SELECT cls, tok,
    CAST(ROUND(ln(CAST(c + 1 AS DOUBLE) / CAST(t + v AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lp
  FROM cnt JOIN tot USING (cls), vocab
),
lp0 AS (
  SELECT cls,
    CAST(ROUND(ln(1.0 / CAST(t + v AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lp0
  FROM tot, vocab
),
pri AS (
  SELECT cls,
    CAST(ROUND(ln(CAST(nd AS DOUBLE) / CAST(ndt AS DOUBLE)), 9) AS DECIMAL(18,9)) AS pri
  FROM trdocs, tottr
),
scored AS (
  SELECT k.doc_id, l0.cls, SUM(COALESCE(lp.lp, l0.lp0)) AS s
  FROM tok k
  CROSS JOIN lp0 l0
  LEFT JOIN lp ON lp.cls = l0.cls AND lp.tok = k.tok
  GROUP BY 1, 2
),
full_score AS (
  SELECT s.doc_id, s.cls, s.s + p.pri AS score
  FROM scored s JOIN pri p ON p.cls = s.cls
),
ranked AS (
  SELECT doc_id, cls, score,
    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cls ASC) AS rk
  FROM full_score
)
SELECT r.doc_id, r.cls AS pred_source, CAST(r.score AS DOUBLE) AS nb_logprob,
       d.source AS actual_source,
       CAST(r.cls = d.source AS BOOLEAN) AS is_correct
FROM ranked r JOIN documents d USING (doc_id)
WHERE rk = 1
"""


def _nb_scores(spark, sf_dir):
    """Shared NB train+score pipeline: returns (scores, classes) where
    ``scores`` has one row per (doc_id, source) with per-class decimal
    score columns _s_0.._s_{C-1} plus n_tokens — consumed by both the
    argmax classifier and the margin-calibration query."""
    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "source", "text")
    is_train = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("bigint")
        % 2
        == 0
    )
    def _toks(rel):
        return rel.select(
            "doc_id", "source", is_train.alias("is_train"),
            F.explode(tokens(F.col("text"))).alias("tok"),
        )

    # Two toks INSTANCES, one per action (r10, the _nb_base_toks wide-split
    # lesson): the train stream feeds the model checkpoint action and stays
    # unwidened (a shared widened toks re-paid the repartition per action —
    # measured 2× regression, OPTIMIZATION_r10.md §E); the scoring stream
    # below feeds exactly ONE action per consumer and gets the
    # scan-parallelism guard so the corpus-sized explode + model join run
    # at session parallelism instead of one task per parquet row group.
    toks = _toks(docs)
    score_toks = _toks(t.wide("documents").select("doc_id", "source", "text"))
    # NULL-labelled docs cannot train (no class to credit) but are still
    # scored; their is_correct comes out NULL on both engines (3VL
    # equality). The oracle carries the same source IS NOT NULL guard.
    train = toks.filter(F.col("is_train") & F.col("source").isNotNull())

    # ONE token pass for the whole model (r10, guide §2.3/§2.4 — the
    # _build_lang_nb_model convention): the (cls, tok, c) count relation is
    # model-sized (C × vocab), localCheckpointed eagerly, and every model
    # scalar derives from it — v_size and per-class totals come out of one
    # rollup over counts already in hand. The r9 form paid three separate
    # full evaluations of the exploded token stream (distinct-count,
    # per-class totals, and the lp build) before scoring even started.
    cnt = (
        train.groupBy(F.col("source").alias("cls"), "tok")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    roll = cnt.rollup("cls").agg(
        F.sum("c").alias("t"), F.countDistinct("tok").alias("vg")
    ).collect()
    v_size = next(int(r["vg"]) for r in roll if r["cls"] is None)
    tot = {r["cls"]: int(r["t"]) for r in roll if r["cls"] is not None}
    tr_docs = (
        docs.filter(is_train & F.col("source").isNotNull())
        .groupBy("source")
        .agg(F.count("*").alias("nd"))
    ).collect()
    classes = sorted(r["source"] for r in tr_docs)
    nd = {r["source"]: r["nd"] for r in tr_docs}
    ndt = sum(nd.values())

    def _lndec(num: int | float, den: int) -> F.Column:
        # round(ln(num/den), 9) computed IN the engine (identical double
        # division of exact integers on both sides; llm_lm.py convention)
        return F.round(
            F.log(F.lit(float(num)) / F.lit(float(den))), 9
        ).cast(_DEC)

    # Per-(class, tok) smoothed log-probs, pivoted to one row per token —
    # read from the checkpointed cnt, not a fresh token pass.
    den = F.when(
        F.col("cls") == classes[0], F.lit(float(tot[classes[0]] + v_size))
    )
    for c in classes[1:]:
        den = den.when(F.col("cls") == c, F.lit(float(tot[c] + v_size)))
    lp_long = cnt.select(
        "cls", "tok",
        F.round(F.log((F.col("c") + 1).cast("double") / den), 9)
        .cast(_DEC)
        .alias("lp"),
    )
    lp_wide = lp_long.groupBy("tok").pivot("cls", classes).agg(F.first("lp"))

    joined = score_toks.join(F.broadcast(lp_wide), "tok", "left")
    score_cols = [
        (
            F.sum(F.coalesce(F.col(f"`{c}`"), _lndec(1, tot[c] + v_size)))
            + _lndec(nd[c], ndt)
        ).cast("decimal(38,9)").alias(f"_s_{i}")
        for i, c in enumerate(classes)
    ]
    scores = joined.groupBy("doc_id", "source").agg(
        *score_cols, F.count("*").alias("n_tokens")
    )
    return scores, classes


@query("nb_source_classifier", oracle=_NB_SQL)
def nb_source_classifier(spark, sf_dir):
    """Multinomial Naive Bayes source classifier, trained and applied in
    one plan — the closed-form stand-in for the fastText domain/quality
    classifiers of the CCNet/Gopher pipelines (the only classifier family
    whose training IS two aggregations, so both engines can derive the
    identical model independently). Laplace-smoothed per-class token
    log-probs and priors quantize to DECIMAL(18,9) at birth; scoring is
    one broadcast join of the exploded corpus against the V×C model
    PIVOTED to per-class columns, then ONE groupBy(doc_id) computing all C
    class scores as conditional decimal sums — a single shuffle for the
    whole train+score pipeline, no per-(doc,class) row blowup (the oracle
    keeps the naive doc×class formulation; parity certifies the pivot
    rewrite). Argmax over the C score columns via the quantized
    array_position idiom (ties to the lexicographically smaller class).
    Driver state: C priors + per-class totals — model parameters, never
    corpus-sized. At 100 TB the only change is the broadcast threshold:
    a vocab past memory turns the model join into a shuffle join on tok,
    same plan shape."""
    scores, classes = _nb_scores(spark, sf_dir)
    arr = F.array(*[F.col(f"_s_{i}") for i in range(len(classes))])
    idx = F.array_position(arr, F.array_max(arr)).cast("int")
    cls_arr = F.array(*[F.lit(c) for c in classes])
    return scores.select(
        "doc_id",
        F.element_at(cls_arr, idx).alias("pred_source"),
        F.array_max(arr).cast("double").alias("nb_logprob"),
        F.col("source").alias("actual_source"),
        (F.element_at(cls_arr, idx) == F.col("source")).alias("is_correct"),
    )


_KL_SQL = """
WITH tok AS (
  SELECT doc_id, source, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
g AS (SELECT tok, COUNT(*) AS cg FROM tok GROUP BY 1),
gt AS (SELECT SUM(cg) AS tg FROM g),
s AS (SELECT source, tok, COUNT(*) AS cs FROM tok GROUP BY 1, 2),
st AS (SELECT source, SUM(cs) AS ts FROM s GROUP BY 1),
terms AS (
  SELECT s.source,
    CAST(ROUND(
      (CAST(s.cs AS DOUBLE) / CAST(st.ts AS DOUBLE))
      * ROUND(ln(CAST(s.cs * gt.tg AS DOUBLE) / CAST(st.ts * g.cg AS DOUBLE)), 9),
    12) AS DECIMAL(28,12)) AS term
  FROM s JOIN st USING (source) JOIN g USING (tok), gt
)
SELECT t.source, ROUND(CAST(SUM(t.term) AS DOUBLE), 6) AS kl_nats,
       CAST(MAX(st.ts) AS BIGINT) AS n_tokens
FROM terms t JOIN st ON st.source = t.source
GROUP BY 1
"""


@query("source_kl_drift", oracle=_KL_SQL)
def source_kl_drift(spark, sf_dir):
    """Per-source distribution drift: KL(P_source || P_corpus) over unigram
    token distributions — the data-mixture monitor that flags a source
    whose content shifted away from the corpus it is supposed to resemble
    (the drift alarm in front of DSIR-style mixture reweighting; every
    source token is in the corpus by construction, so the divergence is
    always finite). Determinism: each token's term p·ln(p/q) is computed
    from EXACT integer counts (one double division of bigint products, ln
    rounded to 9, the product rounded to 12) and summed as DECIMAL — the
    accumulation order cannot change a source's score — and the final
    double is rounded to 6 (house rule): the JVM's Math.log and libm's
    log may differ in the last ulp, which at a rounding boundary shifts
    one 12-digit term by 1e-12 (observed once under the sf0.01 Unicode
    fuzz gate); the final round absorbs it. Scale shape: one
    explode, two map-side-combined count aggregations, a model-sized join
    on tok, one final groupBy(source); corpus totals ride as a 1-row
    broadcast. BIGINT products cs·tg bound the exactness at ~1e18 tokens —
    past that, pre-divide (cs/ts)·(tg/cg) in two steps."""
    t = Tables(spark, sf_dir)
    toks = t.documents.select(
        "source", F.explode(tokens(F.col("text"))).alias("tok")
    )
    # The raw token stream shuffles ONCE (into per-(source, tok) counts);
    # corpus-level counts derive from those partials, so g/gt/st shuffle
    # model-sized rows, never tokens. The counts relation feeds FOUR
    # consumers whose pushed null-filters defeat exchange reuse (verified:
    # 4 identical hashpartitioning(source, tok) exchanges executed) —
    # localCheckpoint pins the one materialization, the copurchase_*
    # pattern.
    s = (
        toks.groupBy("source", "tok")
        .agg(F.count("*").alias("cs"))
        .localCheckpoint(eager=True)
    )
    g = s.groupBy("tok").agg(F.sum("cs").alias("cg"))
    gt = g.agg(F.sum("cg").alias("tg"))
    st = s.groupBy("source").agg(F.sum("cs").alias("ts"))
    terms = (
        s.join(st, "source")
        .join(g, "tok")
        .crossJoin(F.broadcast(gt))
        .select(
            "source",
            "ts",
            F.round(
                (F.col("cs").cast("double") / F.col("ts").cast("double"))
                * F.round(
                    F.log(
                        (F.col("cs") * F.col("tg")).cast("double")
                        / (F.col("ts") * F.col("cg")).cast("double")
                    ),
                    9,
                ),
                12,
            )
            .cast("decimal(28,12)")
            .alias("term"),
        )
    )
    return terms.groupBy("source").agg(
        F.round(F.sum("term").cast("double"), 6).alias("kl_nats"),
        F.max("ts").alias("n_tokens"),
    )


# Hard-negative band: same-cell pairs BELOW the dup threshold — similar
# enough to be informative, distinct enough to be true negatives.
_HN_TAU = 0.45   # upper bound = the SemDeDup dup threshold
_HN_TOPK = 3

_HN_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
seeds AS (SELECT vec_id AS seed_id, emb AS semb FROM e WHERE vec_id < 8),
assign AS (
  SELECT vec_id, emb, seed_id,
    ROW_NUMBER() OVER (
      PARTITION BY vec_id
      ORDER BY ROUND(list_cosine_similarity(emb, semb), 9) DESC, seed_id ASC
    ) AS rk
  FROM e CROSS JOIN seeds
),
cells AS (SELECT vec_id, emb, seed_id AS cell FROM assign WHERE rk = 1),
cand AS (
  SELECT a.vec_id AS anchor_id, b.vec_id AS negative_id, a.cell,
    ROUND(list_cosine_similarity(a.emb, b.emb), 9) AS c9,
    ROUND(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id != b.vec_id
),
ranked AS (
  SELECT anchor_id, negative_id, cell, cosine,
    ROW_NUMBER() OVER (
      PARTITION BY anchor_id ORDER BY c9 DESC, negative_id ASC
    ) AS rank
  FROM cand WHERE c9 < {_HN_TAU}
)
SELECT anchor_id, negative_id, cell, rank, cosine
FROM ranked WHERE rank <= {_HN_TOPK}
"""


@query("hard_negative_pairs", oracle=_HN_SQL)
def hard_negative_pairs(spark, sf_dir):
    """Contrastive hard-negative mining for embedding training: each
    vector's top-3 most-similar SAME-CELL neighbors whose cosine
    is still below the SemDeDup dup threshold — the "hard but true"
    negatives that make contrastive fine-tuning work (easy negatives from
    random cells teach nothing; above-τ pairs are near-dups, not
    negatives). Reuses the argmax-cosine cells from operators/semdedup
    (assignment is a pure projection), so the quadratic candidate stage is
    cell-bucketed exactly like the dedup scorer; per-cell top-k runs in
    chunked numpy inside ONE applyInPandas. Cosines quantize to 1e-9
    before banding/ranking on both engines (the semdedup ADVICE rule), so
    FP noise cannot move a pair across the band edge or reorder the
    ranking; the oracle keeps the naive pair-join + window form."""
    from importer_spark.operators.semdedup import (
        assign_seed_cells,
        lowest_id_seeds,
    )

    t = Tables(spark, sf_dir)
    e = t.wide("embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    seeds = lowest_id_seeds(e, "vec_id", "emb", 8)
    cells = assign_seed_cells(e, "vec_id", "emb", seeds)

    def topk_negs(pdf):
        import numpy as np
        import pandas as pd

        order = np.argsort(pdf["vec_id"].to_numpy())
        ids = pdf["vec_id"].to_numpy()[order]
        from importer_spark.operators.similarity import row_normalize

        m = np.vstack(pdf["emb"].to_numpy()[order]).astype("float64")
        row_normalize(m)  # zero-norm rows stay zero, never NaN (r5 advice)
        n = len(ids)
        out_a, out_n, out_r, out_c = [], [], [], []
        chunk = max(256, int(1.5e7 / max(n, 1)))
        for s in range(0, n, chunk):
            end = min(s + chunk, n)
            sims = m[s:end] @ m.T
            # band + rank on the 1e-9 grid; the OUTPUT rounds the RAW value
            # once (the sf1 gate caught a double-rounding divergence: a
            # cosine of ...94998 quantizes to the exact 6dp half boundary
            # at 1e-9, and round(round(x,9),6) != round(x,6) there)
            sims9 = np.round(sims, 9)
            for i in range(end - s):
                row = sims9[i].copy()
                row[s + i] = 2.0  # exclude self
                mask = row < _HN_TAU
                if not mask.any():
                    continue
                cand = np.nonzero(mask)[0]
                # top-k by (cosine desc, id asc): ids are ascending, so a
                # stable sort on -cosine breaks ties toward the lower id
                top = cand[np.argsort(-row[cand], kind="stable")][:_HN_TOPK]
                k = len(top)
                out_a.extend([ids[s + i]] * k)
                out_n.extend(ids[top])
                out_r.extend(range(1, k + 1))
                out_c.extend(np.round(sims[i][top], 6))
        return pd.DataFrame(
            {
                "anchor_id": out_a,
                "negative_id": out_n,
                "cell": pdf["cell"].iat[0],
                "rank": out_r,
                "cosine": out_c,
            }
        )

    return cells.groupBy("cell").applyInPandas(
        topk_negs,
        schema="anchor_id bigint, negative_id bigint, cell bigint, rank int, cosine double",
    )


_ES_K = 10  # kept docs per source

_ES_SQL = f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
    -- u in (0,1) from the md5 hash (deterministic, engine-portable), then
    -- the Efraimidis-Spirakis exponential sort key e = -ln(u)/w, each log
    -- term and the quotient quantized to 9 places
    ROUND(
      -ROUND(ln(
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1 AS DOUBLE)
        / CAST(4294967297 AS DOUBLE)
      ), 9) / CAST(n_chars AS DOUBLE),
    9) AS es_key
  FROM documents
  WHERE n_chars IS NOT NULL
),
ranked AS (
  SELECT doc_id, source, n_chars, es_key,
    ROW_NUMBER() OVER (PARTITION BY source ORDER BY es_key ASC, doc_id ASC) AS rank
  FROM keyed
)
SELECT doc_id, source, n_chars, CAST(es_key AS DOUBLE) AS es_key, rank
FROM ranked WHERE rank <= {_ES_K}
"""


@query("weighted_sample_es", oracle=_ES_SQL)
def weighted_sample_es(spark, sf_dir):
    """Weight-proportional sampling WITHOUT replacement, per source:
    Efraimidis-Spirakis (2006, "Weighted random sampling with a
    reservoir") — each doc draws an exponential sort key e = -ln(u)/w and
    the K smallest keys per stratum are exactly a w-proportional sample
    without replacement (here w = n_chars: longer docs proportionally
    likelier, the quality-weighted data-selection move; swap any score
    column in). u comes from the md5 hash, not rand(), so the sample is
    reproducible across engines/runs/retries — the repo's deterministic
    hash-gate convention (stratified_sample), upgraded from Bernoulli
    keep/drop to weighted-without-replacement. ln and the quotient
    quantize to 9 places before ranking (cross-engine rule). One shuffle:
    the per-source window; a skewed stratum takes the two-phase top-K
    escape hatch (llm_sampling.language_capped_sample documents it)."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
    )
    u = (h + 1).cast("double") / F.lit(4294967297.0)
    es_key = F.round(-F.round(F.log(u), 9) / F.col("n_chars").cast("double"), 9)
    # a NULL weight cannot be sampled proportionally — excluded on both
    # engines (also sidesteps the NULLS FIRST/LAST sort divergence)
    keyed = t.documents.filter(F.col("n_chars").isNotNull()).select(
        "doc_id", "source", "n_chars", es_key.alias("es_key")
    )
    w = Window.partitionBy("source").orderBy(F.col("es_key").asc(), F.col("doc_id").asc())
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _ES_K)
        .select("doc_id", "source", "n_chars", F.col("es_key").cast("double"), "rank")
    )


# Calibration SQL reuses the whole certified NB chain up through `ranked`
# (split at the final SELECT), then takes per-doc top-2 scores.
_NB_CTES = _NB_SQL[: _NB_SQL.rindex("SELECT r.doc_id")]

_CALIB_SQL = (
    _NB_CTES
    + """, top2 AS (
  SELECT doc_id,
    MAX(CASE WHEN rk = 1 THEN score END) AS s1,
    MAX(CASE WHEN rk = 1 THEN cls END) AS c1,
    MAX(CASE WHEN rk = 2 THEN score END) AS s2
  FROM ranked WHERE rk <= 2 GROUP BY doc_id
),
pd AS (
  SELECT t.doc_id,
    ROUND(CAST(t.s1 - t.s2 AS DOUBLE) / len(string_split(d.text, ' ')), 6)
      AS mpt,
    CAST(t.c1 = d.source AS INT) AS ok
  FROM top2 t JOIN documents d USING (doc_id)
)
SELECT LEAST(CAST(FLOOR(mpt * 100) AS INT), 9) AS margin_bucket,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  ROUND(SUM(ok)::DOUBLE / COUNT(*), 6) AS accuracy,
  ROUND(CAST(SUM(CAST(mpt AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
    AS avg_margin
FROM pd GROUP BY 1
"""
)


@query("nb_confidence_calibration", oracle=_CALIB_SQL)
def nb_confidence_calibration(spark, sf_dir):
    """Classifier-confidence calibration (reliability bins): bucket every
    document by the NB decision MARGIN per token — (top1 − top2 class
    score) / n_tokens — and report each bucket's empirical accuracy (0.01-nat bins, capped at 9). The
    production question behind it: at what confidence cutoff can the
    source/quality classifier's labels be trusted for routing or
    filtering? A well-calibrated margin shows accuracy rising monotonically
    with the bucket; a flat profile says the scores are uninformative.

    Margins use the DECIMAL score columns directly — top-2 via one
    sort_array over the C-element score vector, the difference exact, ONE
    double division per doc rounded to 1e-6 before binning (no softmax/exp,
    whose cross-libm rounding is not reproducible across engines). Bucket
    edges are double products of grid values — identical IEEE ops on both
    engines. Beyond the shared scoring pipeline this adds only a C-element
    array sort per doc and a 10-group aggregation: no new shuffle of
    anything corpus-sized. Bin averages accumulate as DECIMAL (house
    convention) so partial-aggregation order cannot move a rounded edge."""
    scores, classes = _nb_scores(spark, sf_dir)
    arr = F.array(*[F.col(f"_s_{i}") for i in range(len(classes))])
    srt = F.sort_array(arr, asc=False)
    idx = F.array_position(arr, F.array_max(arr)).cast("int")
    cls_arr = F.array(*[F.lit(c) for c in classes])
    margin = (F.element_at(srt, 1) - F.element_at(srt, 2)).cast("double")
    mpt = F.round(margin / F.col("n_tokens"), 6)
    ok = (F.element_at(cls_arr, idx) == F.col("source")).cast("int")
    per_doc = scores.select(mpt.alias("mpt"), ok.alias("ok"))
    bucket = F.least(F.floor(F.col("mpt") * 100).cast("int"), F.lit(9))
    return per_doc.groupBy(bucket.alias("margin_bucket")).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(F.sum("ok").cast("double") / F.count("*"), 6).alias("accuracy"),
        F.round(
            F.sum(F.col("mpt").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_margin"),
    )
