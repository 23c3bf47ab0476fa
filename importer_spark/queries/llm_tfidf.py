"""TF-IDF weighting and near-duplicate clustering (connected components)
(BASELINE.json LLM-pipeline operators; SURVEY §7.4 dedup family).

TF-IDF is the classic distributed doc-term weighting; clustering turns
near-dup PAIRS into dedup GROUPS (what a corpus dedup actually deletes by) —
an iterative label-propagation algorithm on the Spark side, checked against a
recursive-CTE transitive closure in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from importer_spark.io import Tables
from importer_spark.operators.dedup import near_dup_pairs
from importer_spark.queries.llm_dedup import _SHINGLE_CTE
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
    """TF-IDF: term frequency per doc × ln(N/df). Two aggregations over the
    exploded token stream (tf keyed on doc+term, df on term) + a broadcast
    scalar N; the df side is vocabulary-sized, so its join broadcasts."""
    t = Tables(spark, sf_dir)
    tok = t.documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
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


_CLUSTERS_SQL = (
    _SHINGLE_CTE.replace("WITH d AS", "WITH RECURSIVE d AS", 1)
    + """,
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
),
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
    pairs = near_dup_pairs(Tables(spark, sf_dir).documents, "doc_id", "text")
    # Bidirectional edges via explode over ONE scan of `pairs`: a self-union
    # of two selects would execute the whole LSH candidate pipeline twice
    # before the cache materializes (measured 2× the pairs cost at sf0.1).
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
                    F.struct(F.col("id_b").alias("src"), F.col("id_a").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .cache()
    )
    # Round 0 fused into one aggregation: label = min(id, direct neighbors).
    # Saves a full propagation round (pair-shaped dup clusters converge here).
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("m"))
        .select(F.col("src").alias("doc_id"), F.least("src", "m").alias("cluster_id"))
        .cache()
    )
    labels.count()  # one job materializes edges + round-0 labels
    for _ in range(14):  # diameter bound; dedup graphs are shallow
        # Every node appears as an edge src, so inner joins lose no rows; the
        # changed-flag rides along in the same job (no second join + action).
        updated = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("cluster_id").alias("neighbor_min"))
            .join(labels, "doc_id")
            .select(
                "doc_id",
                F.least("cluster_id", "neighbor_min").alias("cluster_id"),
                (F.col("neighbor_min") < F.col("cluster_id")).alias("chg"),
            )
            .cache()
        )
        # cache() per round truncates the lineage (without it each iteration
        # re-evaluates the whole chain — exponential plan growth); the count
        # materializes `updated`, so the previous round can release.
        changed = updated.filter("chg").count()
        labels.unpersist()
        labels = updated.drop("chg")
        if changed == 0:
            break
    else:
        # Never return silently-wrong partial labels: a component deeper than
        # the round budget means the caller must raise it (or switch to the
        # recursive-SQL form for pathological graphs).
        raise RuntimeError(
            "near_dup_clusters: label propagation did not converge within 15 "
            "rounds — component diameter exceeds the budget"
        )
    out = labels.withColumn(
        "cluster_size", F.count("*").over(Window.partitionBy("cluster_id"))
    )
    # Materialize eagerly so the operator's internal caches can release now
    # (otherwise each invocation leaks an edges + labels InMemoryRelation for
    # the rest of the session).
    out = out.localCheckpoint(eager=True)
    edges.unpersist()
    labels.unpersist()
    return out
