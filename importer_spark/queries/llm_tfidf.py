"""TF-IDF weighting and near-duplicate clustering (connected components)
(BASELINE.json LLM-pipeline operators; SURVEY §7.4 dedup family).

TF-IDF is the classic distributed doc-term weighting; clustering turns
near-dup PAIRS into dedup GROUPS (what a corpus dedup actually deletes by) —
an iterative label-propagation algorithm on the Spark side, checked against a
recursive-CTE transitive closure in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from importer_spark.io import Tables
from importer_spark.operators.dedup import near_dup_pairs
from importer_spark.queries.llm_dedup import _index_pairs_cte
from importer_spark.queries.registry import query

_TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT tf.doc_id, tf.term, tf.tf, df.df,
  ROUND(tf.tf * ln(n.n_docs::DOUBLE / df.df), 6) AS tfidf
FROM tf JOIN df USING (term) CROSS JOIN n
"""


@query("tfidf_weights", oracle=_TFIDF_SQL)
def tfidf_weights(spark, sf_dir):
    """TF-IDF: term frequency per doc × ln(N/df). One aggregation over the
    exploded token stream (tf keyed on doc+term); df folds tf by term + a
    broadcast scalar N; the df side is vocabulary-sized, so its join
    broadcasts."""
    t = Tables(spark, sf_dir)
    tok = t.documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # df derives from tf (rows per term = distinct docs containing it), not
    # a second explode of the corpus — see _bm25_ranked (r10, guide §2.3).
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = t.documents.agg(F.count("*").alias("n_docs"))
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


# Pairs come from the inverted-index ground truth (see llm_dedup._index_pairs_cte);
# the recursive closure over them is unchanged.
_CLUSTERS_SQL = (
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
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM labels
"""
)


@query("near_dup_clusters", oracle=_CLUSTERS_SQL)
def near_dup_clusters(spark, sf_dir):
    """Dedup GROUPS from near-dup pairs: iterative min-label propagation
    (connected components) until fixpoint — the iterative-algorithm pattern
    (each round: join labels to edges, take min over neighborhood; converges
    in O(graph diameter) rounds). Oracle: recursive-CTE transitive closure —
    an entirely different evaluation strategy reaching the same fixpoint."""
    from importer_spark.operators.graph import connected_components

    pairs = near_dup_pairs(
        Tables(spark, sf_dir).wide("documents"), "doc_id", "text"
    )
    return connected_components(pairs, out_id="doc_id")


@query("near_dup_clusters_star", oracle=_CLUSTERS_SQL)
def near_dup_clusters_star(spark, sf_dir):
    """Same dedup groups via the DISTRIBUTED large-star/small-star
    contraction (Kiveris et al., O(log d) rounds — the 100 TB regime of
    connected_components, which small graphs normally bypass for local
    union-find). Forcing max_local_edges=0 makes the driver's oracle gate
    certify the star algorithm itself against the recursive-CTE closure:
    three independent evaluation strategies, one fixpoint."""
    from importer_spark.operators.graph import connected_components

    pairs = near_dup_pairs(
        Tables(spark, sf_dir).wide("documents"), "doc_id", "text"
    )
    return connected_components(pairs, out_id="doc_id", max_local_edges=0)


# --- BM25 lexical retrieval ------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10
_BM25_N_QUERIES = 3  # the lowest doc_ids with non-null text act as queries

# Shared CTE block (docs → ranked): consumed by bm25_topk's oracle and by
# the hybrid RRF oracle below, so the lexical arm is one definition.
_BM25_CTES = f"""docs AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM docs
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
),
dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
),
stats AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
qterms AS (
  SELECT doc_id AS query_id, term
  FROM tf
  WHERE doc_id IN (SELECT doc_id FROM docs ORDER BY doc_id LIMIT {_BM25_N_QUERIES})
  GROUP BY 1, 2
),
partials AS (
  SELECT q.query_id, tf.doc_id,
    CAST(ROUND(
      ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
      * (tf.tf * ({_BM25_K1} + 1))
      / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / s.avgdl)),
    9) AS DECIMAL(18,9)) AS w
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN df ON df.term = tf.term
  CROSS JOIN stats s
  WHERE tf.doc_id <> q.query_id
),
scored AS (
  SELECT query_id, doc_id, SUM(w) AS score_exact
  FROM partials GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, score_exact,
    ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY score_exact DESC, doc_id ASC) AS rank
  FROM scored
)"""

_BM25_SQL = f"""
WITH {_BM25_CTES}
SELECT query_id, doc_id, CAST(rank AS INTEGER) AS rank,
  ROUND(CAST(score_exact AS DOUBLE), 6) AS bm25
FROM ranked WHERE rank <= {_BM25_TOPK}
"""


@query("bm25_topk", oracle=_BM25_SQL)
def bm25_topk(spark, sf_dir):
    """Okapi BM25 top-k lexical retrieval (Robertson & Zaragoza 2009; the
    Lucene idf form ln(1+(N-df+.5)/(df+.5)), always positive): the lowest
    3 doc_ids act as queries, every other document is
    scored over the shared-term inverted index, top-10 per query. The
    lexical twin of `embedding_cosine_topk` — the other half of a hybrid
    retrieval stack for corpus curation (contamination triage, hard-negative
    mining against sparse matches).

    Plan shape (the 100 TB formulation): tf is the inverted index (one
    shuffle on term from the exploded token stream); query terms and the
    vocabulary-sized df/stats relations BROADCAST onto it, so candidate
    generation — the only corpus-sized work — is shuffle-free after the
    index build; one co-shuffle on doc_id attaches doc length; the
    per-(query, doc) sum is a map-side-partial hash agg. Scores are exact
    DECIMAL(18,9) sums of per-term weights rounded at 9 places (the
    llm_lm.py convention), so aggregation order can never flip a rank
    across engines; ranking is a per-query window with doc_id tie-break —
    #queries is small here, swap in operators/ranks.partitioned_rank when
    the query set itself is corpus-sized."""
    return _bm25_ranked(spark, sf_dir).select(
        "query_id",
        "doc_id",
        F.col("rank").cast("int").alias("rank"),
        F.round(F.col("score_exact").cast("double"), 6).alias("bm25"),
    )


def _bm25_ranked(spark, sf_dir):
    """The BM25 pipeline up to (query_id, doc_id, score_exact, rank ≤ 10) —
    shared by bm25_topk and the hybrid RRF fusion."""
    t = Tables(spark, sf_dir)
    k1, b = _BM25_K1, _BM25_B
    docs = t.documents.filter(F.col("text").isNotNull())
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # dl and df derive from tf, not from fresh token passes (r10, guide
    # §2.3 "aggregate before you shuffle" / §2.4): Σ tf per doc IS the doc
    # length, and tf's row count per term IS the distinct-doc frequency —
    # so the corpus is exploded once and everything downstream aggregates
    # the (doc, term, tf) relation. The r9 form re-ran split+explode for
    # each of dl and df (and the tf exchange is shared at runtime by
    # ReusedExchange once the subtrees are identical).
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    qids = [
        r["doc_id"]
        for r in docs.select("doc_id").orderBy("doc_id").limit(_BM25_N_QUERIES).collect()
    ]
    qterms = (
        tf.filter(F.col("doc_id").isin(qids))
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
    )
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    w = F.round(
        idf
        * (F.col("tf") * (k1 + 1))
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        9,
    ).cast("decimal(18,9)")
    partials = (
        tf.join(F.broadcast(qterms), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(dl, "doc_id")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", w.alias("w"))
    )
    scored = partials.groupBy("query_id", "doc_id").agg(
        F.sum("w").alias("score_exact")
    )
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("score_exact").desc(), F.col("doc_id").asc()
        )
    )
    return scored.withColumn("rank", rk).filter(F.col("rank") <= _BM25_TOPK)


# --- Hybrid retrieval: reciprocal-rank fusion ------------------------------

_RRF_C = 60  # the standard RRF constant (Cormack et al. 2009)

def _hybrid_sql() -> str:
    return f"""
WITH {_BM25_CTES},
lex AS (
  SELECT query_id, doc_id, CAST(rank AS INTEGER) AS lex_rank
  FROM ranked WHERE rank <= {_BM25_TOPK}
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
dense_pairs AS (
  SELECT p.vec_id AS query_id, c.vec_id AS doc_id,
    list_cosine_similarity(p.emb, c.emb) AS cos
  FROM e p JOIN e c ON c.vec_id <> p.vec_id
  WHERE p.vec_id IN (SELECT doc_id FROM docs ORDER BY doc_id LIMIT {_BM25_N_QUERIES})
),
dense AS (
  SELECT query_id, doc_id, CAST(rank AS INTEGER) AS dense_rank
  FROM (
    SELECT query_id, doc_id,
      ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, doc_id ASC) AS rank
    FROM dense_pairs
  ) WHERE rank <= {_BM25_TOPK}
),
fused AS (
  SELECT
    coalesce(l.query_id, d.query_id) AS query_id,
    coalesce(l.doc_id, d.doc_id) AS doc_id,
    l.lex_rank, d.dense_rank,
    CAST(coalesce(CAST(ROUND(1.0 / ({_RRF_C} + l.lex_rank), 9) AS DECIMAL(18,9)), 0)
       + coalesce(CAST(ROUND(1.0 / ({_RRF_C} + d.dense_rank), 9) AS DECIMAL(18,9)), 0)
       AS DECIMAL(18,9)) AS rrf_exact
  FROM lex l FULL OUTER JOIN dense d
    ON l.query_id = d.query_id AND l.doc_id = d.doc_id
)
SELECT query_id, doc_id, lex_rank, dense_rank,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY rrf_exact DESC, doc_id ASC) AS INTEGER) AS rank,
  CAST(rrf_exact AS DOUBLE) AS rrf
FROM fused
QUALIFY rank <= {_BM25_TOPK}
"""


@query("hybrid_rrf_topk", oracle=_hybrid_sql())
def hybrid_rrf_topk(spark, sf_dir):
    """Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009,
    score = Σ 1/(60+rank)) of the BM25 lexical arm and the brute-force
    cosine dense arm over the SAME query ids (the lowest 3 doc_ids with
    text; documents and embeddings share the id space). The canonical
    two-tower curation stack — sparse matches catch exact phrasing, dense
    matches catch paraphrase, RRF needs no score calibration between them.

    Plan: the two arms are independent subplans (each as in its standalone
    query — inverted-index broadcasts on one side, triangle-free cosine
    top-k on the other); fusion is a FULL OUTER join on the tiny
    (query, candidate) top-k relations — broadcast-sized at any corpus
    scale since both sides are ≤ queries×k rows. RRF contributions are
    ROUND(·,9) DECIMAL(18,9) adds, so fused ordering is exact on both
    engines."""
    from importer_spark.operators.similarity import as_double_array, cosine_topk

    t = Tables(spark, sf_dir)
    lex = _bm25_ranked(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").cast("int").alias("lex_rank")
    )
    docs = t.documents.filter(F.col("text").isNotNull())
    qids = [
        r["doc_id"]
        for r in docs.select("doc_id").orderBy("doc_id").limit(_BM25_N_QUERIES).collect()
    ]
    e = t.wide("embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    probes = e.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("probe_emb")
    )
    dense = cosine_topk(
        probes,
        e.select(F.col("vec_id"), F.col("emb").alias("corpus_emb")),
        probe_id="query_id",
        corpus_id="vec_id",
        probe_vec="probe_emb",
        corpus_vec="corpus_emb",
        k=_BM25_TOPK,
    ).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("int").alias("dense_rank"),
    )
    contrib = lambda rank_col: F.coalesce(  # noqa: E731
        F.round(1.0 / (_RRF_C + F.col(rank_col)), 9).cast("decimal(18,9)"),
        F.lit(0).cast("decimal(18,9)"),
    )
    fused = (
        lex.withColumnRenamed("query_id", "_lq").withColumnRenamed("doc_id", "_ld")
        .join(
            dense.withColumnRenamed("query_id", "_dq").withColumnRenamed(
                "doc_id", "_dd"
            ),
            (F.col("_lq") == F.col("_dq")) & (F.col("_ld") == F.col("_dd")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("_lq"), F.col("_dq")).alias("query_id"),
            F.coalesce(F.col("_ld"), F.col("_dd")).alias("doc_id"),
            "lex_rank",
            "dense_rank",
            (contrib("lex_rank") + contrib("dense_rank"))
            .cast("decimal(18,9)")
            .alias("rrf_exact"),
        )
    )
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("rrf_exact").desc(), F.col("doc_id").asc()
        )
    )
    return (
        fused.withColumn("rank", rk.cast("int"))
        .filter(F.col("rank") <= _BM25_TOPK)
        .select(
            "query_id",
            "doc_id",
            "lex_rank",
            "dense_rank",
            "rank",
            F.col("rrf_exact").cast("double").alias("rrf"),
        )
    )


# --- retrieval-stack evaluation: arm agreement + pseudo-relevance nDCG ------

def _arm_eval_sql() -> str:
    return f"""
WITH {_BM25_CTES},
lex AS (
  SELECT query_id, doc_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY score_exact DESC, doc_id ASC) AS INTEGER) AS lex_rank
  FROM scored QUALIFY lex_rank <= {_BM25_TOPK}
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
dense AS (
  SELECT query_id, doc_id, CAST(rank AS INTEGER) AS dense_rank FROM (
    SELECT p.vec_id AS query_id, c.vec_id AS doc_id,
      ROW_NUMBER() OVER (PARTITION BY p.vec_id
        ORDER BY list_cosine_similarity(p.emb, c.emb) DESC, c.vec_id ASC) AS rank
    FROM e p JOIN e c ON c.vec_id <> p.vec_id
    WHERE p.vec_id IN (SELECT doc_id FROM docs ORDER BY doc_id LIMIT {_BM25_N_QUERIES})
  ) WHERE rank <= {_BM25_TOPK}
),
paired AS (
  SELECT COALESCE(l.query_id, d.query_id) AS query_id,
    l.lex_rank, d.dense_rank
  FROM lex l FULL OUTER JOIN dense d
    ON l.query_id = d.query_id AND l.doc_id = d.doc_id
),
agg AS (
  SELECT query_id,
    COUNT(lex_rank) AS n_lex,
    COUNT(dense_rank) AS n_dense,
    SUM(CASE WHEN lex_rank IS NOT NULL AND dense_rank IS NOT NULL
        THEN 1 ELSE 0 END) AS overlap,
    SUM(CASE WHEN lex_rank IS NOT NULL AND dense_rank IS NOT NULL THEN
      CAST(ROUND(1.0 / log2(dense_rank + 1), 9) AS DECIMAL(18,9))
      ELSE CAST(0 AS DECIMAL(18,9)) END) AS dcg_exact,
    SUM(CASE WHEN lex_rank IS NOT NULL THEN
      CAST(ROUND(1.0 / log2(lex_rank + 1), 9) AS DECIMAL(18,9))
      ELSE CAST(0 AS DECIMAL(18,9)) END) AS idcg_exact
  FROM paired GROUP BY 1
)
SELECT query_id,
  CAST(n_lex AS BIGINT) AS n_lex,
  CAST(n_dense AS BIGINT) AS n_dense,
  CAST(overlap AS BIGINT) AS overlap,
  ROUND(CAST(overlap AS DOUBLE) / (n_lex + n_dense - overlap), 6) AS jaccard,
  CASE WHEN CAST(idcg_exact AS DOUBLE) > 0 THEN
    ROUND(CAST(dcg_exact AS DOUBLE) / CAST(idcg_exact AS DOUBLE), 6)
  END AS ndcg
FROM agg
"""


@query("retrieval_arm_ndcg", oracle=_arm_eval_sql())
def retrieval_arm_ndcg(spark, sf_dir):
    """Label-free retrieval-stack evaluation: per query, the dense arm's
    top-{_BM25_TOPK} scored against the LEXICAL arm's top-{_BM25_TOPK} as
    pseudo-relevance — overlap count, Jaccard@k of the two sets, and
    nDCG@k of the dense ranking with rel = membership in the lexical set
    (the standard no-labels cross-arm validation before shipping a hybrid
    stack: low agreement means the arms disagree on what matters and
    fusion weights deserve attention; nDCG localizes WHERE in the dense
    ranking the lexical hits land).

    Plan: both arms are the standalone subplans (inverted-index broadcasts
    / brute-force cosine top-k); everything after is arithmetic over
    queries×k rows — broadcast-sized at any corpus. Per-position discounts
    1/log2(rank+1) are ROUND(·,9) DECIMAL(18,9) terms (rank ∈ 1..k, a
    fixed constant table in effect), so DCG sums are exact and the final
    nDCG/Jaccard are single double divisions rounded at 6."""
    lex = _bm25_ranked(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").cast("int").alias("lex_rank")
    )
    t = Tables(spark, sf_dir)
    docs = t.documents.filter(F.col("text").isNotNull())
    qids = [
        r["doc_id"]
        for r in docs.select("doc_id").orderBy("doc_id").limit(_BM25_N_QUERIES).collect()
    ]
    from importer_spark.operators.similarity import as_double_array, cosine_topk

    e = t.wide("embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    probes = e.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("probe_emb")
    )
    dense = cosine_topk(
        probes,
        e.select(F.col("vec_id"), F.col("emb").alias("corpus_emb")),
        probe_id="query_id",
        corpus_id="vec_id",
        probe_vec="probe_emb",
        corpus_vec="corpus_emb",
        k=_BM25_TOPK,
    ).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("int").alias("dense_rank"),
    )
    w9 = lambda rank_col: F.round(  # noqa: E731
        1.0 / F.log2(F.col(rank_col) + 1), 9
    ).cast("decimal(18,9)")
    zero9 = F.lit(0).cast("decimal(18,9)")
    both = (
        lex.withColumnRenamed("query_id", "_lq")
        .withColumnRenamed("doc_id", "_ld")
        .join(
            dense,
            (F.col("_lq") == F.col("query_id")) & (F.col("_ld") == F.col("doc_id")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("_lq"), F.col("query_id")).alias("query_id"),
            "lex_rank",
            "dense_rank",
        )
    )
    agg = both.groupBy("query_id").agg(
        F.count("lex_rank").alias("n_lex"),
        F.count("dense_rank").alias("n_dense"),
        F.sum(
            F.when(
                F.col("lex_rank").isNotNull() & F.col("dense_rank").isNotNull(), 1
            ).otherwise(0)
        ).alias("overlap"),
        F.sum(
            F.when(
                F.col("lex_rank").isNotNull() & F.col("dense_rank").isNotNull(),
                w9("dense_rank"),
            ).otherwise(zero9)
        ).alias("dcg_exact"),
        F.sum(
            F.when(F.col("lex_rank").isNotNull(), w9("lex_rank")).otherwise(zero9)
        ).alias("idcg_exact"),
    )
    jac = F.round(
        F.col("overlap").cast("double")
        / (F.col("n_lex") + F.col("n_dense") - F.col("overlap")),
        6,
    )
    ndcg = F.when(
        F.col("idcg_exact").cast("double") > 0,
        F.round(
            F.col("dcg_exact").cast("double") / F.col("idcg_exact").cast("double"),
            6,
        ),
    )
    return agg.select(
        "query_id",
        F.col("n_lex").cast("bigint").alias("n_lex"),
        F.col("n_dense").cast("bigint").alias("n_dense"),
        F.col("overlap").cast("bigint").alias("overlap"),
        jac.alias("jaccard"),
        ndcg.alias("ndcg"),
    )
