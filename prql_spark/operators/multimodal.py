"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode step* is a
deterministic fake behind ``_decode_stub`` (clearly marked). The
Spark-side plumbing is real and what matters at 100 TB:
- media rows are (id, media binary, media_type, meta struct);
- decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` with Arrow batches — vectorized transfer, schema
  declared up front, and batch shape preserved (one output row per
  input row for decode/resize; one row per sampled frame for
  frame_sample);
- binary payloads never hit the driver, and the pipeline is a
  narrow map — no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def synthesize_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Build a media table from documents: payload = utf-8 bytes of
    the text (stands in for an encoded image/audio blob), with typed
    metadata — the schema a real ingest would produce."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode("text", "utf-8").alias("media"),
        F.expr(
            "CASE WHEN doc_id % 3 = 0 THEN 'image/png' "
            "WHEN doc_id % 3 = 1 THEN 'audio/wav' "
            "ELSE 'video/mp4' END"
        ).alias("media_type"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("n_chars").alias("payload_hint"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decoder — deterministic fake (no codecs in container).

    A real deployment replaces this with PIL/ffmpeg/torchaudio; the
    signature (bytes in, dims + feature vector out) is the contract.
    """
    h = hashlib.sha256(payload if payload is not None else b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feats = [round(b / 255.0, 6) for b in h[:8]]
    return width, height, feats


def decode_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_stub(p) for p in pdf["media"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["media"]
                    ],
                    "features": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(run, DECODED_SCHEMA)


def resize(media: DataFrame, max_dim: int = 256) -> DataFrame:
    """Resize plumbing: STUB transform truncates the payload to
    simulate downscaling; schema/row-count contract is the real part."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["media"] = [
                p[: max_dim * max_dim // 64] if p is not None else None
                for p in pdf["media"]
            ]
            yield pdf

    return media.mapInPandas(run, media.schema)


def frame_sample(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling for video rows: emits one row per sampled
    'frame' (fixed-size payload slice) — fan-out shape is real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["media"]
            ):
                if mtype != "video/mp4" or payload is None:
                    continue
                chunks = [
                    payload[i : i + 32]
                    for i in range(0, len(payload), 32)
                ]
                for fi, ch in enumerate(chunks[::every_n]):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(ch)
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame": frames}
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
