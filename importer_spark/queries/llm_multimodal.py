"""Multimodal-plumbing queries (BASELINE.json multimodal columns; SURVEY
§7.4): binary columns through Arrow-batched pandas
UDFs, oracle-checked against the deterministic fake codec (SQL can mirror the
fake: bytes are the UTF-8 text itself).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from importer_spark.io import Tables
from importer_spark.operators.multimodal import (
    extract_features,
    sample_frames,
    to_media_table,
)
from importer_spark.queries.registry import query

_FEATURES_SQL = """
SELECT doc_id,
       'text/fake-image' AS media_type,
       strlen(text) AS n_bytes,
       md5(text) AS content_digest
FROM documents
"""


@query("multimodal_features", oracle=_FEATURES_SQL)
def multimodal_features(spark, sf_dir):
    """Binary payload → per-item features via mapInPandas (schema, Arrow
    batching, and digest math are the real plumbing; decode is the
    deterministic fake)."""
    t = Tables(spark, sf_dir)
    return extract_features(to_media_table(t.documents))


_FRAMES_SQL = """
SELECT d.doc_id,
       CAST(i AS INTEGER) AS frame_idx,
       strlen(substr(d.text, i * 256 + 1, 256)) AS frame_bytes,
       md5(substr(d.text, i * 256 + 1, 256)) AS frame_digest
FROM documents d, UNNEST(range(0, GREATEST((strlen(d.text) + 255) // 256, 1))) AS t(i)
WHERE strlen(d.text) = length(d.text)
"""


@query("multimodal_frame_sample", oracle=_FRAMES_SQL)
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling (video-style chunking) through the mapInPandas UDTF
    path — one row per 256-byte frame with digest.

    The operator chunks BYTES (real media is bytes); SQL's substr chunks
    CHARACTERS and DuckDB cannot slice or hash blobs, so the oracle-gated
    relation is explicitly scoped to byte-transparent (ASCII) docs on BOTH
    sides — byte and character chunking coincide there, and a future
    non-ASCII fixture cannot silently diverge the gate. Non-ASCII payloads
    still flow through the operator (unit-tested with real multi-byte
    frames)."""
    t = Tables(spark, sf_dir)
    ascii_docs = t.documents.filter(
        F.octet_length(F.col("text")) == F.length(F.col("text"))
    )
    return sample_frames(to_media_table(ascii_docs), frame_size=256)


_ALIGN_SQL = """
SELECT d.lang,
  COUNT(*) AS n_docs,
  CAST(COUNT(e.vec_id) AS BIGINT) AS n_with_embedding,
  ROUND(COUNT(e.vec_id)::DOUBLE / COUNT(*), 12) AS coverage
FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY 1
"""


@query("modality_alignment", oracle=_ALIGN_SQL)
def modality_alignment(spark, sf_dir):
    """Cross-modal completeness: how much of the text corpus has a paired
    embedding row (the text↔vector alignment check run before any
    multimodal training job; same shape for image/audio sidecar tables).
    A co-partitionable equi-join on the shared id — at 100 TB bucket both
    tables by id and this is shuffle-free."""
    t = Tables(spark, sf_dir)
    e = t.embeddings.select("vec_id")
    joined = t.documents.join(e, t.documents.doc_id == e.vec_id, "left")
    return joined.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count("vec_id").cast("bigint").alias("n_with_embedding"),
        F.round(F.count("vec_id").cast("double") / F.count("*"), 12).alias("coverage"),
    )
