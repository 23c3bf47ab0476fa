"""Multimodal-plumbing queries: binary columns through Arrow-batched pandas
UDFs, oracle-checked against the deterministic fake codec (SQL can mirror the
fake: bytes are the UTF-8 text itself).
"""

from __future__ import annotations

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
"""


@query("multimodal_frame_sample", oracle=_FRAMES_SQL)
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling (video-style chunking) through the mapInPandas UDTF
    path — one row per 256-byte frame with digest."""
    t = Tables(spark, sf_dir)
    return sample_frames(to_media_table(t.documents), frame_size=256)
