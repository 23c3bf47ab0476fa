"""Multimodal-plumbing queries (BASELINE.json multimodal columns; SURVEY
§7.4): binary columns through Arrow-batched pandas
UDFs, oracle-checked against the deterministic fake codec (SQL can mirror the
fake: bytes are the UTF-8 text itself).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from importer_spark.io import Tables
from importer_spark.operators.multimodal import (
    encode_ppm,
    encode_wav,
    extract_audio_features,
    extract_features,
    extract_image_features,
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


# --- real-codec queries ----------------------------------------------------
# Payloads are synthesized per doc_id by a fixed integer formula, encoded
# through the REAL codec (stdlib wave / binary P6 PPM), decoded back by the
# REAL parser inside the feature extractor — and the oracle recomputes the
# same features analytically from the formula in SQL. Every emitted number
# comes from exact integer sums (bit-identical float64 on both engines), so
# this is a full end-to-end encode→bytes→decode→features parity gate.

_WAV_RATE = 8000


def _synth_wav_media(docs):
    """documents → (doc_id, media: binary WAV). n = 800 + doc_id % 400
    samples of ((doc_id*31 + i*17) % 65536) - 32768, 8 kHz mono int16."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            media = []
            for doc_id in pdf["doc_id"].astype("int64"):
                n = 800 + doc_id % 400
                i = np.arange(n, dtype=np.int64)
                samples = (doc_id * 31 + i * 17) % 65536 - 32768
                media.append(encode_wav(samples, sample_rate=_WAV_RATE))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": media})

    return docs.select("doc_id").mapInPandas(batches, schema="doc_id long, media binary")


_AUDIO_SQL = f"""
WITH d AS (SELECT doc_id, 800 + doc_id % 400 AS n FROM documents),
s AS (
  SELECT d.doc_id, d.n, ((d.doc_id * 31 + t.i * 17) % 65536) - 32768 AS v
  FROM d, UNNEST(range(d.n)) AS t(i)
)
SELECT doc_id,
  {_WAV_RATE} AS sample_rate,
  1 AS n_channels,
  MAX(n) AS n_samples,
  MAX(n) / {_WAV_RATE}.0 AS duration_s,
  MAX(ABS(v)) AS peak,
  sqrt(SUM(v * v)::DOUBLE / MAX(n)) AS rms
FROM s GROUP BY doc_id
"""


@query("audio_wav_features", oracle=_AUDIO_SQL)
def audio_wav_features(spark, sf_dir):
    """Real audio pipeline: synthesize deterministic PCM per doc, encode
    through the stdlib WAV codec, decode the bytes back in
    extract_audio_features (operators/multimodal.py), and emit
    duration/peak/RMS. The oracle recomputes the features from the synthesis
    formula — any header, endianness, or framing bug in the codec path
    breaks parity. Zero shuffle: synthesis + decode are partition-local."""
    t = Tables(spark, sf_dir)
    return extract_audio_features(_synth_wav_media(t.documents))


_PPM_H = 6


def _synth_ppm_media(docs):
    """documents → (doc_id, media: binary P6 PPM). Width 8 + doc_id % 8,
    height 6, flat pixel j = (doc_id*7 + j) % 256."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            media = []
            for doc_id in pdf["doc_id"].astype("int64"):
                w = 8 + doc_id % 8
                j = np.arange(_PPM_H * w * 3, dtype=np.int64)
                px = ((doc_id * 7 + j) % 256).astype(np.uint8).reshape(_PPM_H, w, 3)
                media.append(encode_ppm(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": media})

    return docs.select("doc_id").mapInPandas(batches, schema="doc_id long, media binary")


_IMAGE_SQL = f"""
WITH d AS (SELECT doc_id, 8 + doc_id % 8 AS w FROM documents),
p AS (
  SELECT d.doc_id, d.w, (d.doc_id * 7 + t.j) % 256 AS v, t.j % 3 AS ch
  FROM d, UNNEST(range(d.w * {_PPM_H} * 3)) AS t(j)
)
SELECT doc_id,
  MAX(w)::INTEGER AS width,
  {_PPM_H} AS height,
  MAX(w) * {_PPM_H} AS n_pixels,
  SUM(CASE WHEN ch = 0 THEN v END)::DOUBLE / (MAX(w) * {_PPM_H}) AS mean_r,
  SUM(CASE WHEN ch = 1 THEN v END)::DOUBLE / (MAX(w) * {_PPM_H}) AS mean_g,
  SUM(CASE WHEN ch = 2 THEN v END)::DOUBLE / (MAX(w) * {_PPM_H}) AS mean_b
FROM p GROUP BY doc_id
"""


@query("image_ppm_features", oracle=_IMAGE_SQL)
def image_ppm_features(spark, sf_dir):
    """Real image pipeline: deterministic RGB raster per doc, encoded as
    binary P6 PPM, decoded back by the hand-written comment-tolerant parser
    in extract_image_features, emitting dimensions + channel means. Oracle
    recomputes from the raster formula. Zero shuffle."""
    t = Tables(spark, sf_dir)
    return extract_image_features(_synth_ppm_media(t.documents))


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
