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


class MediaCodec:
    """The pluggable decode seam.

    A codec turns an opaque payload into (width, height, features)
    and optionally re-encodes a downscaled payload. Codec instances
    are pickled into the mapInPandas closure and run ON THE
    EXECUTORS, so implementations must be top-level classes whose
    state is serializable (open library handles lazily inside
    ``decode``, not in ``__init__``).
    """

    def decode(
        self, payload: bytes | None, media_type: str
    ) -> tuple[int, int, list[float]]:
        raise NotImplementedError

    def resize_payload(
        self, payload: bytes | None, max_dim: int
    ) -> bytes | None:
        """Default resize: payload truncation (a fake; real codecs
        decode → downscale → re-encode)."""
        if payload is None:
            return None
        return payload[: max_dim * max_dim // 64]


class Sha256FakeCodec(MediaCodec):
    """DEFAULT, a deterministic FAKE (no media libs in this
    container): dims and features derived from sha256 of the payload.
    Deterministic ⇒ the DuckDB oracle replays it with digest math, so
    even the fake path is value-checked end to end."""

    def decode(self, payload, media_type):
        h = hashlib.sha256(payload if payload is not None else b"").digest()
        width = 64 + h[0] % 192
        height = 64 + h[1] % 192
        feats = [round(b / 255.0, 6) for b in h[:8]]
        return width, height, feats


class PillowCodec(MediaCodec):
    """Real image codec for deployments with Pillow installed —
    drops into the same seam; import is deferred to the executor."""

    def __init__(self, n_features: int = 8):
        self.n_features = n_features

    def decode(self, payload, media_type):
        import io

        try:
            from PIL import Image
        except ImportError as e:  # pragma: no cover - no PIL here
            raise RuntimeError(
                "PillowCodec requires Pillow on every executor"
            ) from e
        if payload is None:
            return 0, 0, [0.0] * self.n_features
        img = Image.open(io.BytesIO(payload))
        w, h = img.size
        hist = img.convert("L").histogram()
        step = max(len(hist) // self.n_features, 1)
        total = float(sum(hist)) or 1.0
        feats = [
            round(sum(hist[i : i + step]) / total, 6)
            for i in range(0, step * self.n_features, step)
        ]
        return w, h, feats


_DEFAULT_CODEC: MediaCodec = Sha256FakeCodec()


def decode_features(
    media: DataFrame, codec: MediaCodec | None = None
) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    ``codec`` picks the decoder implementation (default: the
    deterministic sha256 fake — see :class:`MediaCodec` for the
    seam contract)."""
    codec = codec or _DEFAULT_CODEC

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                codec.decode(p, t)
                for p, t in zip(pdf["media"], pdf["media_type"])
            ]
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


def resize(
    media: DataFrame, max_dim: int = 256, codec: MediaCodec | None = None
) -> DataFrame:
    """Resize plumbing through the codec seam (default codec
    truncates the payload to simulate downscaling); schema and
    row-count contracts are the real part."""
    codec = codec or _DEFAULT_CODEC

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["media"] = [
                codec.resize_payload(p, max_dim) for p in pdf["media"]
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
