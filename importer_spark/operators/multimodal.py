"""Multimodal column operators (BASELINE.json north star): image/audio/video
as opaque ``binary`` columns with typed metadata, processed by Arrow-batched
pandas functions over ``mapInPandas``.

The container has no image/audio codecs, so the actual decode is STUBBED
(``decode_media`` raises NotImplementedError for real media types) behind a
deterministic fake ('text/fake-image' → the UTF-8 bytes themselves). The
Spark-side plumbing — binary schema, batch iteration, UDF signatures, frame
explosion — is real and oracle-tested; swapping in PIL/librosa is a local
change inside ``decode_media``.

Scale notes: mapInPandas streams Arrow batches (no per-row Python overhead);
feature extraction is embarrassingly parallel over input partitions — no
shuffle at all. Frame sampling multiplies rows partition-locally.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_IMAGE = "text/fake-image"

FEATURES_SCHEMA = "doc_id long, media_type string, n_bytes long, content_digest string"
FRAMES_SCHEMA = "doc_id long, frame_idx integer, frame_bytes long, frame_digest string"


def to_media_table(docs: DataFrame) -> DataFrame:
    """Synthesize a multimodal table from documents: opaque binary payload +
    media_type + typed metadata struct (the shape a real ingest would load)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("media"),
        F.lit(FAKE_IMAGE).alias("media_type"),
        F.struct(
            F.col("n_chars").alias("declared_size"),
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
        ).alias("metadata"),
    )


def decode_media(data: bytes, media_type: str) -> bytes:
    """Decode stub. Real codecs are not available in this environment; the
    deterministic fake passes bytes through so downstream feature extraction
    is testable. Swap this function for PIL/ffmpeg/librosa in production."""
    if media_type == FAKE_IMAGE:
        return data
    raise NotImplementedError(
        f"no codec for {media_type!r} in this environment; see module docstring"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Per-item features via mapInPandas (Arrow batches, vectorized pandas)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                decode_media(m, t) for m, t in zip(pdf["media"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(d) for d in decoded],
                    "content_digest": [hashlib.md5(d).hexdigest() for d in decoded],
                }
            )

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, frame_size: int = 256) -> DataFrame:
    """Frame sampling for "video" payloads: split the binary into fixed-size
    chunks, one output row per frame (mapInPandas as a UDTF — rows multiply
    partition-locally, no shuffle)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, sizes, digests = [], [], [], []
            for doc_id, m, t in zip(pdf["doc_id"], pdf["media"], pdf["media_type"]):
                data = decode_media(m, t)
                for i in range(0, max(len(data), 1), frame_size):
                    chunk = data[i : i + frame_size]
                    ids.append(doc_id)
                    idxs.append(i // frame_size)
                    sizes.append(len(chunk))
                    digests.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_bytes": sizes,
                    "frame_digest": digests,
                }
            )

    return media.mapInPandas(batches, schema=FRAMES_SCHEMA)
