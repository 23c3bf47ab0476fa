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

    pairs = near_dup_pairs(Tables(spark, sf_dir).documents, "doc_id", "text")
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

    pairs = near_dup_pairs(Tables(spark, sf_dir).documents, "doc_id", "text")
    return connected_components(pairs, out_id="doc_id", max_local_edges=0)
