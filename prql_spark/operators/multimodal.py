"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decode runs behind the pluggable ``MediaCodec`` seam. In-container
codecs: ``NetpbmCodec`` (REAL zero-dependency PPM/PGM decode +
resize with numpy) and the default ``Sha256FakeCodec`` (deterministic
⇒ DuckDB-oracled); ``PillowCodec`` covers compressed formats where
Pillow is installed. The Spark-side plumbing is what matters at
100 TB:
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

    def luma_grid(
        self, payload: bytes | None, media_type: str, n: int = 8
    ) -> list[float] | None:
        """n×n nearest-neighbor luma thumbnail (row-major, values in
        [0, 1]) — the input to perceptual hashing. ``None`` means the
        payload is not decodable by this codec (the hasher emits a
        NULL hash, never a fabricated one)."""
        return None

    def frame_luma_grids(
        self, payload: bytes | None, media_type: str, n: int = 8
    ) -> list[list[float]] | None:
        """Per-FRAME n×n luma thumbnails for video payloads (one
        grid per frame, each shaped like :meth:`luma_grid`'s
        output). ``None`` = not decodable as video by this codec."""
        return None

    def audio_envelope(
        self, payload: bytes | None, media_type: str, n: int = 65
    ) -> list[float] | None:
        """``n``-window RMS energy contour of an audio payload
        (mono-mixed, equal windows over the whole signal) — the
        input to energy-delta fingerprinting. ``None`` = not
        decodable as audio by this codec."""
        return None


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

    def luma_grid(self, payload, media_type, n=8):
        # deterministic digest-derived grid: the ahash PLUMBING runs
        # (and oracles replay) even without a real decoder — repeated
        # sha256 stretches the digest to n*n pseudo-luma bytes
        if payload is None:
            return None
        out, block = [], payload
        while len(out) < n * n:
            block = hashlib.sha256(block).digest()
            out.extend(block)
        return [b / 255.0 for b in out[: n * n]]

    def frame_luma_grids(self, payload, media_type, n=8):
        # fake "frames" = 32-byte payload slices (frame_sample's fake
        # chunking), each stretched to a digest grid — identical
        # slices yield identical grids, so duplicated content still
        # collides exactly like a real decode would
        if payload is None:
            return None
        return [
            self.luma_grid(bytes(payload[i : i + 32]), media_type, n)
            for i in range(0, len(payload), 32)
        ]

    def audio_envelope(self, payload, media_type, n=65):
        # digest-stretched pseudo envelope (same rationale as
        # luma_grid: identical payloads collide, plumbing is real)
        if payload is None:
            return None
        out, block = bytearray(), bytes(payload)
        while len(out) < n:
            block = hashlib.sha256(block).digest()
            out.extend(block)
        return [b / 255.0 for b in out[:n]]


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


class NetpbmCodec(MediaCodec):
    """REAL image codec, zero external dependencies: decodes binary
    netpbm payloads (P6 RGB / P5 grayscale — the standard
    uncompressed interchange format) with numpy.

    decode → (width, height, 8 features): per-channel means, luma
    std, and 2×2 quadrant luma means — actual pixel statistics, not
    digest math. ``resize_payload`` is a REAL nearest-neighbor
    downscale re-encoded to the same format. Compressed formats
    (png/jpeg) still need :class:`PillowCodec`; the point here is
    that the seam's "real codec" contract is exercised end-to-end
    inside this container.
    """

    _MAGICS = (b"P6", b"P5")

    @staticmethod
    def _parse(payload: bytes):
        import numpy as np

        if payload is None or payload[:2] not in NetpbmCodec._MAGICS:
            return None
        # header: magic, then 3 ints (width height maxval) separated
        # by whitespace, '#' comments allowed, one whitespace byte
        # before pixel data
        pos, fields = 2, []
        n = len(payload)
        while len(fields) < 3 and pos < n:
            c = payload[pos : pos + 1]
            if c.isspace():
                pos += 1
            elif c == b"#":
                while pos < n and payload[pos : pos + 1] != b"\n":
                    pos += 1
            else:
                start = pos
                while pos < n and not payload[pos : pos + 1].isspace():
                    pos += 1
                tok = payload[start:pos]
                if not tok.isdigit():  # malformed header ⇒ not netpbm
                    return None
                fields.append(int(tok))
        # exactly ONE whitespace byte separates maxval from pixel
        # data (netpbm spec). Validate it IS whitespace (a payload
        # ending right at the header would otherwise read pixels from
        # a bogus offset), and reject the CRLF case: a "\r\n" there is
        # a nonconforming Windows-style writer whose true pixel data
        # starts one byte later — indistinguishable from a legal
        # \r-separated file whose first pixel value is 10, so the safe
        # choice is None over silently corrupt statistics.
        sep = payload[pos : pos + 1]
        if not sep.isspace():
            return None
        if sep == b"\r" and payload[pos + 1 : pos + 2] == b"\n":
            return None
        pos += 1
        if len(fields) < 3 or fields[2] > 255 or fields[2] <= 0:
            return None
        w, h, maxval = fields
        ch = 3 if payload[:2] == b"P6" else 1
        # corrupt/truncated payloads (or a lying header) must decode
        # to None, not kill the executor task mid-batch
        if w <= 0 or h <= 0 or n - pos < w * h * ch:
            return None
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch,
                           offset=pos)
        return px.reshape(h, w, ch), maxval

    def decode(self, payload, media_type):
        import numpy as np

        parsed = self._parse(payload)
        if parsed is None:
            return 0, 0, [0.0] * 8
        img, maxval = parsed
        h, w, ch = img.shape
        # normalize by the PARSED maxval: a maxval-15 image's pixel
        # range is 0..15 and dividing by a fixed 255 would skew every
        # feature toward black
        f = img.astype(np.float64) / maxval
        if ch == 3:
            means = [f[:, :, i].mean() for i in range(3)]
            luma = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        else:
            means = [f[:, :, 0].mean()] * 3
            luma = f[:, :, 0]
        qh, qw = max(h // 2, 1), max(w // 2, 1)
        quads = [
            luma[:qh, :qw].mean(), luma[:qh, qw:].mean() if w > 1 else 0.0,
            luma[qh:, :qw].mean() if h > 1 else 0.0,
            luma[qh:, qw:].mean() if h > 1 and w > 1 else 0.0,
        ]
        feats = means + [float(luma.std())] + quads[:4]
        return w, h, [round(float(x), 6) for x in feats]

    def luma_grid(self, payload, media_type, n=8):
        import numpy as np

        parsed = self._parse(payload)
        if parsed is None:
            return None
        img, maxval = parsed
        h, w, ch = img.shape
        f = img.astype(np.float64) / maxval
        if ch == 3:
            luma = (
                0.299 * f[:, :, 0]
                + 0.587 * f[:, :, 1]
                + 0.114 * f[:, :, 2]
            )
        else:
            luma = f[:, :, 0]
        rows = (np.arange(n) * h / n).astype(np.int64)
        cols = (np.arange(n) * w / n).astype(np.int64)
        return [float(x) for x in luma[rows][:, cols].ravel()]

    def resize_payload(self, payload, max_dim):
        import numpy as np

        parsed = self._parse(payload)
        if parsed is None:
            return payload
        img, maxval = parsed
        h, w, ch = img.shape
        if max(h, w) <= max_dim:
            return payload
        scale = max_dim / max(h, w)
        nh, nw = max(int(h * scale), 1), max(int(w * scale), 1)
        rows = (np.arange(nh) * h / nh).astype(np.int64)
        cols = (np.arange(nw) * w / nw).astype(np.int64)
        small = img[rows][:, cols]
        magic = b"P6" if ch == 3 else b"P5"
        # keep the source maxval: pixel values are untouched samples,
        # so re-encoding with a hardcoded 255 would rescale semantics
        return b"%s\n%d %d\n%d\n" % (magic, nw, nh, maxval) + small.tobytes()


class WavCodec(MediaCodec):
    """REAL audio codec, zero external dependencies: decodes PCM WAV
    payloads with the stdlib ``wave`` module + numpy.

    decode → (sample_rate, n_frames, 8 features): duration seconds,
    RMS, peak, zero-crossing rate, and per-quarter RMS over the first
    channel — actual signal statistics. The (width, height) slots of
    the codec contract carry (sample_rate, n_frames) for audio,
    documented here (the schema is modality-agnostic by design).
    ``resize_payload`` truncates to the first ``max_dim × 1000``
    frames, RE-ENCODED as a valid WAV (header frame counts updated) —
    the audio analogue of a downscale. Corrupt/non-PCM payloads
    decode to the zero tuple, never raise mid-batch.
    """

    @staticmethod
    def _parse(payload: bytes):
        import io
        import wave

        import numpy as np

        if payload is None or payload[:4] != b"RIFF":
            return None
        try:
            with wave.open(io.BytesIO(payload)) as w:
                ch, sw = w.getnchannels(), w.getsampwidth()
                rate, n = w.getframerate(), w.getnframes()
                raw = w.readframes(n)
        except Exception:
            return None
        if sw == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif sw == 1:  # 8-bit WAV is unsigned
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                 - 128.0) / 128.0
        else:
            return None
        n = len(x) // ch
        if n == 0:
            return None
        return x.reshape(n, ch), rate

    def decode(self, payload, media_type):
        parsed = self._parse(payload)
        if parsed is None:
            return 0, 0, [0.0] * 8
        import numpy as np

        x, rate = parsed
        mono = x[:, 0]
        n = len(mono)
        rms = float(np.sqrt(np.mean(mono**2)))
        zc = float(np.mean(np.abs(np.diff(np.sign(mono))) > 0)) if n > 1 else 0.0
        q = max(n // 4, 1)
        quarters = [
            float(np.sqrt(np.mean(mono[i * q : (i + 1) * q] ** 2)))
            if len(mono[i * q : (i + 1) * q]) else 0.0
            for i in range(4)
        ]
        feats = [n / rate, rms, float(np.max(np.abs(mono))), zc] + quarters
        return rate, n, [round(f, 6) for f in feats]

    def audio_envelope(self, payload, media_type, n=65):
        import numpy as np

        parsed = self._parse(payload)
        if parsed is None:
            return None
        x, rate = parsed
        mono = x.mean(axis=1)
        m = len(mono)
        # n equal windows over the whole signal (last window absorbs
        # the remainder); RMS per window
        edges = (np.arange(n + 1) * m // n).clip(0, m)
        out = []
        for a, b in zip(edges[:-1], edges[1:]):
            seg = mono[a:b]
            out.append(
                float(np.sqrt(np.mean(seg**2))) if len(seg) else 0.0
            )
        return out

    def resize_payload(self, payload, max_dim):
        import io
        import wave

        parsed = self._parse(payload)
        if parsed is None:
            return payload
        x, rate = parsed
        limit = max_dim * 1000
        if len(x) <= limit:
            return payload
        import numpy as np

        clipped = np.clip(x[:limit] * 32768.0, -32768, 32767).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(x.shape[1])
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(clipped.tobytes())
        return buf.getvalue()


class Y4mCodec(MediaCodec):
    """REAL video codec, zero external dependencies: decodes
    YUV4MPEG2 (.y4m) payloads — the standard UNCOMPRESSED video
    interchange format (plain-text stream header + per-frame raw
    planes) — with numpy.

    decode → (width, height, 8 features): frame count, fps, and luma
    statistics (global mean/std + first/middle/last frame means, and
    mean |frame-to-frame| luma delta — a motion proxy). Assumes the
    default C420 chroma (frame size = 1.5·W·H bytes; C444/C422
    headers adjust the plane size). ``resize_payload`` keeps every
    k-th frame (temporal downsample) re-encoded as valid y4m —
    the video analogue of the image downscale. Corrupt/truncated
    payloads decode to the zero tuple, never raise mid-batch.
    """

    _CHROMA_NUM = {"C420": 3, "C422": 4, "C444": 6}  # ×(W·H)/2

    @staticmethod
    def _parse(payload: bytes):
        import numpy as np

        if payload is None or not payload.startswith(b"YUV4MPEG2"):
            return None
        hdr_end = payload.find(b"\n")
        if hdr_end < 0:
            return None
        w = h = None
        fps = 0.0
        chroma = "C420"
        for tok in payload[:hdr_end].split(b" ")[1:]:
            t = tok.decode("latin-1", "replace")
            try:
                if t.startswith("W"):
                    w = int(t[1:])
                elif t.startswith("H"):
                    h = int(t[1:])
                elif t.startswith("F"):
                    num, den = t[1:].split(":")
                    fps = int(num) / int(den)
                elif t.startswith("C"):
                    chroma = t
            except (ValueError, ZeroDivisionError):
                # ZeroDivisionError: hostile 'F25:0' frame-rate token
                # — the never-raise contract covers it like any other
                # malformed header
                return None
        if not w or not h or w <= 0 or h <= 0:
            return None
        num = Y4mCodec._CHROMA_NUM.get(chroma, 3)
        fsize = w * h * num // 2
        pos, n = hdr_end + 1, len(payload)
        frames = []
        while pos < n:
            if not payload.startswith(b"FRAME", pos):
                break
            fh = payload.find(b"\n", pos)
            if fh < 0 or fh + 1 + fsize > n:
                break
            # luma plane only (first W·H bytes of the frame)
            frames.append(
                np.frombuffer(payload, np.uint8, count=w * h, offset=fh + 1)
            )
            pos = fh + 1 + fsize
        if not frames:
            return None
        return w, h, fps, frames, chroma, payload[: hdr_end + 1]

    def decode(self, payload, media_type):
        import numpy as np

        parsed = self._parse(payload)
        if parsed is None:
            return 0, 0, [0.0] * 8
        w, h, fps, frames, _, _ = parsed
        lum = np.stack(frames).astype(np.float64) / 255.0
        means = lum.mean(axis=(1,))
        motion = (
            float(np.mean(np.abs(np.diff(lum.mean(axis=1)))))
            if len(frames) > 1 else 0.0
        )
        feats = [
            float(len(frames)), fps, float(lum.mean()), float(lum.std()),
            float(means[0]), float(means[len(frames) // 2]),
            float(means[-1]), motion,
        ]
        return w, h, [round(f, 6) for f in feats]

    def frame_luma_grids(self, payload, media_type, n=8):
        import numpy as np

        parsed = self._parse(payload)
        if parsed is None:
            return None
        w, h, fps, frames, _, _ = parsed
        rows = (np.arange(n) * h / n).astype(np.int64)
        cols = (np.arange(n) * w / n).astype(np.int64)
        out = []
        for fr in frames:
            luma = fr.astype(np.float64).reshape(h, w) / 255.0
            out.append([float(x) for x in luma[rows][:, cols].ravel()])
        return out

    def resize_payload(self, payload, max_dim):
        parsed = self._parse(payload)
        if parsed is None:
            return payload
        w, h, fps, frames, chroma, header = parsed
        if len(frames) <= max_dim:
            return payload
        # temporal downsample: keep ceil(n/k) evenly-strided frames;
        # re-slice the ORIGINAL payload (full frames incl. chroma)
        import numpy as np

        num = self._CHROMA_NUM.get(chroma, 3)
        fsize = w * h * num // 2
        stride = -(-len(frames) // max_dim)  # ceil
        out = bytearray(header)
        pos = len(header)
        n = len(payload)
        idx = 0
        while pos < n and payload.startswith(b"FRAME", pos):
            fh = payload.find(b"\n", pos)
            if fh < 0 or fh + 1 + fsize > n:
                break
            if idx % stride == 0:
                out += payload[pos : fh + 1 + fsize]
            pos = fh + 1 + fsize
            idx += 1
        return bytes(out)


def wav_planted_payloads() -> list[tuple[int, bytes, str]]:
    """Deterministic PCM WAV payloads for the value-oracled driver
    entry: a 440 Hz sine, a stereo ramp, an 8-bit constant, and a
    corrupt payload (decodes to zeros)."""
    import io
    import wave

    import numpy as np

    def enc(frames: "np.ndarray", rate: int, sampwidth: int = 2) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(frames.shape[1])
            w.setsampwidth(sampwidth)
            w.setframerate(rate)
            if sampwidth == 2:
                w.writeframes(
                    np.clip(frames * 32768.0, -32768, 32767)
                    .astype("<i2").tobytes()
                )
            else:
                w.writeframes(
                    (np.clip(frames, -1, 1) * 128.0 + 128.0)
                    .clip(0, 255).astype(np.uint8).tobytes()
                )
        return buf.getvalue()

    t = np.arange(8000) / 8000.0
    sine = (0.5 * np.sin(2 * np.pi * 440 * t))[:, None]
    ramp = np.stack([np.linspace(-0.5, 0.5, 4000),
                     np.linspace(0.5, -0.5, 4000)], axis=1)
    const = np.full((2000, 1), 0.25)
    wav = "audio/wav"
    return [
        (1, enc(sine, 8000), wav),
        (2, enc(ramp, 16000), wav),
        (3, enc(const, 8000, sampwidth=1), wav),
        (4, b"RIFFjunk-not-a-wav", wav),
    ]


def y4m_planted_payloads() -> list[tuple[int, bytes, str]]:
    """Deterministic Y4M payloads for the value-oracled driver entry:
    a 6-frame luma ramp, a 2-frame constant, a truncated stream
    (decodes only the complete frames), and a corrupt payload."""
    import numpy as np

    def enc(w, h, frames, fps=(25, 1)):
        hdr = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} C420\n".encode()
        out = bytearray(hdr)
        for f in frames:
            out += b"FRAME\n"
            out += f.astype(np.uint8).tobytes()
            out += bytes(w * h // 2)  # flat chroma planes (C420)
        return bytes(out)

    ramp = [np.full((4, 6), 30 * i, dtype=np.uint8) for i in range(6)]
    const = [np.full((2, 2), 128, dtype=np.uint8)] * 2
    full = enc(6, 4, ramp)
    y4m = "video/x-y4m"
    return [
        (1, full, y4m),
        (2, enc(2, 2, const, fps=(30, 1)), y4m),
        (3, full[: len(full) - 10], y4m),  # truncated last frame
        (4, b"YUV4MPEG2 Wbogus\nFRAME\n", y4m),
    ]


def netpbm_planted_payloads() -> list[tuple[int, bytes, str]]:
    """Deterministic netpbm payloads for the value-oracled driver
    entry: the REAL decoder's pixel statistics on these are computed
    offline and pinned as a VALUES oracle. Covers a P6 gradient with
    a header comment, a P5 gradient, a maxval-15 image (normalization
    by parsed maxval), a lying-header payload and a CRLF-header
    payload (both must decode to the zero tuple, not corrupt data)."""
    import numpy as np

    grad = np.zeros((6, 9, 3), dtype=np.uint8)
    grad[:, :, 0] = np.arange(9, dtype=np.uint8) * 28
    grad[:, :, 1] = 77
    grad[:, :, 2] = np.arange(6, dtype=np.uint8)[:, None] * 40
    gray = (np.arange(35, dtype=np.uint8) * 7).reshape(5, 7)
    g15 = (np.arange(12, dtype=np.uint8) % 16).reshape(3, 4)
    ppm = "image/x-portable-pixmap"
    pgm = "image/x-portable-graymap"
    return [
        (1, b"P6\n# planted\n9 6\n255\n" + grad.tobytes(), ppm),
        (2, b"P5\n7 5\n255\n" + gray.tobytes(), pgm),
        (3, b"P5\n4 3\n15\n" + g15.tobytes(), pgm),
        (4, b"P6\n100 100\n255\nshort", ppm),
        (5, b"P5\n7 5\n255\r\n" + gray.tobytes(), pgm),
    ]


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


AHASH_SCHEMA = "media_id long, media_type string, ahash long, ok boolean"


def image_ahash(
    media: DataFrame, codec: MediaCodec | None = None
) -> DataFrame:
    """Perceptual average-hash per image — the visual analogue of
    simhash: an 8×8 nearest-neighbor luma thumbnail thresholded at
    its own mean packs into a 64-bit hash, so re-encodes, small
    crops, and minor noise land within a few bits of each other
    while unrelated images differ in ~32. Runs through the
    :class:`MediaCodec` seam (``luma_grid``): the real
    :class:`NetpbmCodec` hashes actual pixels; the default sha256
    fake exercises the identical plumbing with digest-derived grids.
    Undecodable payloads get ``ok=false`` and a NULL hash — never a
    fabricated one.

    Arrow-batched ``mapInPandas`` (the payload never leaves the
    executor); output is 17 bytes/image, so at 100 TB of media the
    hash frame is broadcast-small per billion images.
    """
    codec = codec or _DEFAULT_CODEC

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            hashes, oks = [], []
            for p, t in zip(pdf["media"], pdf["media_type"]):
                g = codec.luma_grid(p, t, 8)
                if g is None:
                    hashes.append(None)
                    oks.append(False)
                    continue
                a = np.asarray(g, dtype=np.float64)
                bits = a > a.mean()
                packed = np.uint64(0)
                for i in range(64):
                    if bits[i]:
                        packed |= np.uint64(1) << np.uint64(i)
                hashes.append(int(packed.astype(np.int64)))
                oks.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "ahash": pd.array(hashes, dtype="Int64"),
                    "ok": oks,
                }
            )

    return media.mapInPandas(run, AHASH_SCHEMA)


def image_near_dups(
    media: DataFrame,
    max_hamming: int = 6,
    codec: MediaCodec | None = None,
    star_cap: int = 64,
) -> DataFrame:
    """Near-duplicate IMAGE pairs: :func:`image_ahash` feeds the
    same banded bucket-combine machinery simhash text dedup uses
    (``max_hamming + 1`` pigeonhole bands — every pair within the
    advertised distance is guaranteed a shared bucket — bit_count
    verify, star-capped mega-buckets). One hash pass over the media,
    then the pairing never touches payloads again. Returns
    (media_id_a, media_id_b, hamming)."""
    from prql_spark.operators.dedup import simhash_near_pairs

    sigs = (
        image_ahash(media, codec)
        .where("ok")
        .select(
            F.col("media_id").alias("doc_id"),
            F.col("ahash").alias("simhash"),
        )
    )
    return simhash_near_pairs(
        sigs, "doc_id", max_hamming=max_hamming, star_cap=star_cap
    ).select(
        F.col("id_a").alias("media_id_a"),
        F.col("id_b").alias("media_id_b"),
        "hamming",
    )


FRAME_HASH_SCHEMA = "media_id long, frame_index int, fhash long"


def y4m_ahash_planted_payloads() -> list[tuple[int, bytes, str]]:
    """Deterministic y4m payloads for the frame-hash entry — frames
    carry SPATIAL structure (shifted vertical bands), because the
    average-hash of a flat frame is legitimately 0 and a planted set
    of flat frames would collide into one degenerate bucket:
    video 1 = six banded frames; video 2 = video 1 with its first
    frame TRIMMED (a cut — shares five frame hashes); video 3 =
    unrelated horizontal patterns; video 4 = undecodable garbage
    (contributes no rows)."""
    import numpy as np

    def frame(luma: "np.ndarray") -> bytes:
        chroma = np.full(32, 128, dtype=np.uint8)  # 8x8 C420
        return b"FRAME\n" + luma.astype(np.uint8).tobytes() + chroma.tobytes()

    hdr = b"YUV4MPEG2 W8 H8 F25:1 C420\n"
    i, j = np.mgrid[0:8, 0:8]

    def vid(lumas) -> bytes:
        return hdr + b"".join(frame(x) for x in lumas)

    v1 = [((i + k) % 8) * 32 for k in range(6)]
    v3 = [((j * (k + 2)) % 8) * 32 for k in range(4)]
    t = "video/x-y4m"
    return [
        (1, vid(v1), t),
        (2, vid(v1[1:]), t),
        (3, vid(v3), t),
        (4, b"not a video at all", t),
    ]


def _pack_ahash(grid) -> int:
    import numpy as np

    a = np.asarray(grid, dtype=np.float64)
    bits = a > a.mean()
    packed = np.uint64(0)
    for i in range(bits.size):
        if bits[i]:
            packed |= np.uint64(1) << np.uint64(i)
    return int(packed.astype(np.int64))


def video_frame_hashes(
    media: DataFrame,
    codec: MediaCodec | None = None,
    every_n: int = 1,
) -> DataFrame:
    """Per-FRAME perceptual hashes for video payloads: each sampled
    frame's 8×8 luma thumbnail packs into the same 64-bit
    average-hash :func:`image_ahash` uses (via the codec seam's
    ``frame_luma_grids`` — real planes through :class:`Y4mCodec`,
    digest grids through the sha256 fake). ``every_n`` samples every
    n-th frame; ``frame_index`` is the ORIGINAL frame position.
    Undecodable payloads contribute no rows. One Arrow-batched pass;
    payloads never leave the executor."""
    codec = codec or _DEFAULT_CODEC

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, t, p in zip(
                pdf["media_id"], pdf["media_type"], pdf["media"]
            ):
                grids = codec.frame_luma_grids(p, t, 8)
                if grids is None:
                    continue
                for fi in range(0, len(grids), every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    hashes.append(_pack_ahash(grids[fi]))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_index": idxs,
                    "fhash": pd.array(hashes, dtype="int64"),
                }
            )

    # per-frame grids × frames-per-payload are real compute: a
    # single-scan-partition input serializes the op (measured
    # 2.32 s → 0.60 s at sf0.1 with the spread, 3 reps)
    from prql_spark.operators.dedup import _spread

    return _spread(media, "media_id").mapInPandas(
        run, FRAME_HASH_SCHEMA
    )


def video_near_dups(
    media: DataFrame,
    min_shared_frames: int = 3,
    codec: MediaCodec | None = None,
    every_n: int = 1,
    bucket_cap: int = 64,
    exclude_degenerate: bool = True,
) -> DataFrame:
    """Near-duplicate VIDEO pairs by shared perceptual frame hashes
    — re-encodes, trims, and content mirrors share most of their
    frame hashes while unrelated footage shares none. Shape: the
    frame-hash pass, ONE fhash-key exchange collecting each bucket's
    DISTINCT videos (frames repeated WITHIN one video never
    self-pair), bucket-combine pair explosion through the shared
    star-capped machinery, and a pair-count aggregate — linear in
    total frames, no video-level pairs outside shared buckets.
    Returns (media_id_a, media_id_b, shared_frames) for pairs
    sharing at least ``min_shared_frames`` distinct frame hashes.

    ``every_n`` trade-off: stride sampling cuts the hash pass n× but
    a TRIMMED copy whose cut is not a stride multiple samples
    disjoint frames and can be missed — sample every frame
    (``every_n=1``, the default) when trim-robustness matters, or
    hash at a keyframe-aligned stride upstream.

    Capping caveat (unlike keep/drop text dedup, where star-linking
    is semantics-preserving): an over-``bucket_cap`` fhash bucket
    star-links members to the bucket-min video only, so
    ``shared_frames`` is a LOWER BOUND for pairs not involving that
    min — a popular frame can push a true near-dup pair below
    ``min_shared_frames``. The dominant source of such mega-buckets
    is DEGENERATE frames — flat/black frames legitimately
    average-hash to 0 (every bit compares against the mean of a
    constant grid) or all-ones — which carry no perceptual evidence
    of shared footage; ``exclude_degenerate`` (default True) drops
    those two hash values before pairing, so capping only engages on
    genuinely popular structured frames."""
    from prql_spark.operators.dedup import pairs_from_buckets

    fh = video_frame_hashes(media, codec, every_n)
    if exclude_degenerate:
        fh = fh.where("fhash != 0 AND fhash != -1")
    grouped = (
        fh.groupBy("fhash")
        .agg(
            F.expr(
                "array_sort(collect_set(media_id))"
            ).alias("mem")
        )
        .where(F.expr("size(mem) >= 2"))
    )
    pair = "named_struct('id_a', mem[p.i], 'id_b', mem[p.j])"
    return (
        pairs_from_buckets(grouped, pair, bucket_cap)
        .select("p.id_a", "p.id_b", "fhash")
        .groupBy("id_a", "id_b")
        .agg(
            F.expr(
                "CAST(count(DISTINCT fhash) AS BIGINT)"
            ).alias("shared_frames")
        )
        .where(F.col("shared_frames") >= min_shared_frames)
        .select(
            F.col("id_a").alias("media_id_a"),
            F.col("id_b").alias("media_id_b"),
            "shared_frames",
        )
    )


def wav_fingerprint_planted_payloads() -> list[tuple[int, bytes, str]]:
    """Deterministic WAVs for the fingerprint entry: an amplitude-
    modulated sine (1), the SAME signal at HALF volume (2 — must
    fingerprint IDENTICALLY: the contract is exact volume
    invariance), a differently-modulated sine (3 — ~30 bits away),
    and garbage (4 — NULL fingerprint)."""
    import io
    import wave

    import numpy as np

    def make_wav(samples):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(
                (np.clip(samples, -1, 1) * 32767)
                .astype("<i2").tobytes()
            )
        return buf.getvalue()

    t = np.arange(8000) / 8000.0
    sig = np.sin(2 * np.pi * 440 * t) * (
        0.2 + 0.8 * np.abs(np.sin(2 * np.pi * 3 * t))
    )
    other = np.sin(2 * np.pi * 440 * t) * (
        0.2 + 0.8 * np.abs(np.sin(2 * np.pi * 7 * t))
    )
    a = "audio/wav"
    return [
        (1, make_wav(sig), a),
        (2, make_wav(sig * 0.5), a),
        (3, make_wav(other), a),
        (4, b"not audio", a),
    ]


def audio_fingerprint(
    media: DataFrame, codec: MediaCodec | None = None
) -> DataFrame:
    """Energy-delta audio fingerprint — the audio analogue of
    :func:`image_ahash`: a 65-window RMS energy contour (via the
    codec seam's ``audio_envelope``) packs into 64 bits, bit i =
    window i+1 louder than window i. Comparisons are RELATIVE, so
    the fingerprint is exactly VOLUME-INVARIANT (scaling every
    sample scales every window's RMS equally — identical bits),
    while re-encodes preserve the contour within a few bits and
    unrelated audio differs in ~32. A constant signal legitimately
    fingerprints to 0 (no energy deltas). Undecodable payloads get
    ``ok=false`` + NULL, never a fabricated value. One Arrow-batched
    pass; payloads never leave the executor."""
    codec = codec or _DEFAULT_CODEC

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            fps, oks = [], []
            for p, t in zip(pdf["media"], pdf["media_type"]):
                env = codec.audio_envelope(p, t, 65)
                if env is None:
                    fps.append(None)
                    oks.append(False)
                    continue
                packed = np.uint64(0)
                for i in range(64):
                    if env[i + 1] > env[i]:
                        packed |= np.uint64(1) << np.uint64(i)
                fps.append(int(packed.astype(np.int64)))
                oks.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "afp": pd.array(fps, dtype="Int64"),
                    "ok": oks,
                }
            )

    return media.mapInPandas(
        run, "media_id long, media_type string, afp long, ok boolean"
    )


def audio_near_dups(
    media: DataFrame,
    max_hamming: int = 6,
    codec: MediaCodec | None = None,
    star_cap: int = 64,
) -> DataFrame:
    """Near-duplicate AUDIO pairs: :func:`audio_fingerprint` feeds
    the banded simhash bucket-combine (``max_hamming + 1`` pigeonhole
    bands — recall guaranteed at the advertised distance), mirroring
    :func:`image_near_dups`. Returns (media_id_a, media_id_b,
    hamming)."""
    from prql_spark.operators.dedup import simhash_near_pairs

    sigs = (
        audio_fingerprint(media, codec)
        .where("ok")
        .select(
            F.col("media_id").alias("doc_id"),
            F.col("afp").alias("simhash"),
        )
    )
    return simhash_near_pairs(
        sigs, "doc_id", max_hamming=max_hamming, star_cap=star_cap
    ).select(
        F.col("id_a").alias("media_id_a"),
        F.col("id_b").alias("media_id_b"),
        "hamming",
    )


PHASH_SCHEMA = "media_id long, media_type string, phash long, ok boolean"


def image_phash(
    media: DataFrame, codec: MediaCodec | None = None, grid: int = 32
) -> DataFrame:
    """DCT perceptual hash per image (classic pHash): a 32×32 luma
    thumbnail through an orthonormal 2-D DCT-II, keep the top-left
    8×8 low-frequency block minus the DC term (63 coefficients),
    threshold at their median → a 63-bit hash. Where
    :func:`image_ahash` compares pixels to one global mean (an
    illumination GRADIENT misclassifies a whole band of pixels —
    measured 8-11 flipped bits for a +55 left-to-right re-light),
    pHash compares frequency structure: the same gradient lands in
    one low-frequency coefficient (measured 0-4 bits). Uniform
    brightness shifts are exactly invariant (DC removed). Broadband
    pixel noise affects both hashes similarly through this codec's
    nearest-neighbor grid — pHash is the re-light/gamma lever, not
    a noise filter. Same seam (:meth:`MediaCodec.luma_grid`), same
    Arrow-batched mapInPandas shape, same 17-byte output rows; the
    DCT basis matrix is built once per task and the transform is
    two (32×32)·(32×32) matmuls per image — negligible next to
    decode.

    Reproducibility: coefficients are rounded to 1e-6 before the
    median threshold. The matmul's low-order float bits depend on
    the BLAS kernel (threads, SIMD dispatch), and an image whose
    spectrum is mostly TRUE ZEROS (flat synthetic fills, solid
    borders) otherwise gets its near-median bits decided by ~1e-17
    kernel noise — a hash that differs across hosts is useless for
    dedup (caught in round 9: the same payloads hashed differently
    under two BLAS environments, 12-16 bits apart). Real images
    carry O(1)-O(1000) coefficients, for which the rounding is
    invisible; degenerate ones now hash identically everywhere.
    """
    codec = codec or _DEFAULT_CODEC
    n = grid

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        k = np.arange(n)
        basis = np.cos(
            np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n)
        ) * np.sqrt(2.0 / n)
        basis[0] *= np.sqrt(0.5)
        for pdf in batches:
            hashes, oks = [], []
            for p, t in zip(pdf["media"], pdf["media_type"]):
                g = codec.luma_grid(p, t, n)
                if g is None:
                    hashes.append(None)
                    oks.append(False)
                    continue
                a = np.asarray(g, dtype=np.float64).reshape(n, n)
                d = basis @ a @ basis.T
                # kill BLAS-kernel noise in true-zero coefficients
                # BEFORE the median: cross-host reproducibility (see
                # docstring)
                block = np.round(d[:8, :8].flatten()[1:], 6)
                med = np.median(block)
                packed = 0
                for i, v in enumerate(block):
                    if v > med:
                        packed |= 1 << i
                hashes.append(packed)  # 63 bits: fits signed int64
                oks.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "phash": pd.array(hashes, dtype="Int64"),
                    "ok": oks,
                }
            )

    # the per-image DCT matmuls are real compute: a single-scan-
    # partition input serializes the op (measured 1.02-1.05 s → 0.48-
    # 0.52 s at sf0.1 with the spread, 3 reps; ahash/audio measured
    # FLAT under the same A/B — boundary-bound, left unspread)
    from prql_spark.operators.dedup import _spread

    return _spread(media, "media_id").mapInPandas(run, PHASH_SCHEMA)


def image_near_dups_phash(
    media: DataFrame,
    max_hamming: int = 10,
    codec: MediaCodec | None = None,
    star_cap: int = 64,
) -> DataFrame:
    """Near-duplicate image pairs under the DCT hash — identical
    banded bucket-combine machinery as :func:`image_near_dups`, on
    :func:`image_phash` signatures (one hash pass, pairing never
    re-touches payloads). The default threshold is looser than
    ahash's: pHash spreads structural similarity over more bits."""
    from prql_spark.operators.dedup import simhash_near_pairs

    sigs = (
        image_phash(media, codec)
        .where("ok")
        .select(
            F.col("media_id").alias("doc_id"),
            F.col("phash").alias("simhash"),
        )
    )
    return simhash_near_pairs(
        sigs, "doc_id", max_hamming=max_hamming, star_cap=star_cap
    ).select(
        F.col("id_a").alias("media_id_a"),
        F.col("id_b").alias("media_id_b"),
        "hamming",
    )
