"""Multimodal column conventions + processing plumbing (north-star
extension): image/audio/video as opaque ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` stages.

Decoders:
- ``wav``  — REAL audio decode via the stdlib ``wave`` module: header parse
  + PCM16 frames → (n_channels, sample_rate, n_frames, per-channel means).
- ``ppm``  — REAL image decode of binary PPM (P6): header parse + RGB
  pixel bytes → (width, height, per-channel means).
- ``fake`` — deterministic stand-in for codec-library formats (JPEG/MP3/…,
  whose libs aren't in this environment): seeds an RNG from the content
  hash, produces feature vectors with the real schema/batching.
- default (None) — raises NotImplementedError inside the workers, the
  honest marker for not-yet-wired codecs.

Scale notes: mapInPandas streams Arrow batches through one Python worker
per core with no shuffle; binary payloads never leave their partition until
an explicit repartition. Feature vectors come back as array<float> columns
ready for the vector operators (topk / dedup / similarity).
"""

from __future__ import annotations

import hashlib
import io
import re as _re
import struct
import wave
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("mime", StringType(), True),
    ]
)


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Derive cheap metadata (size, content hash) without decoding."""
    return df.withColumn("content_bytes", F.length(F.col(content_col)).cast("bigint")).withColumn(
        "content_sha", F.sha2(F.col(content_col), 256)
    )


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real image/audio encoder: seed an RNG
    from the content hash → stable pseudo-embedding. Replace with a real
    decoder+model under the same signature."""
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "big") % (2**32)
    return np.random.default_rng(seed).random(dim, dtype=np.float32)


def wav_bytes(samples: np.ndarray, sample_rate: int = 8000, n_channels: int = 1) -> bytes:
    """Encode int16 PCM samples as a real RIFF/WAVE payload (stdlib
    ``wave`` writer). Fixture/encode utility for the decode path below."""
    samples = np.asarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> list:
    """REAL audio decode (stdlib ``wave``): parse the RIFF header, read the
    PCM16 frames, return
    ``[n_channels, sample_rate, n_frames, mean_ch0, mean_ch1, ...]``
    as floats. Per-channel means of ≤2^21 frames are exact in float32
    (integer sums below 2^24 scaled by a power of two)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        rate = w.getframerate()
        nframes = w.getnframes()
        if w.getsampwidth() != 2:
            raise ValueError(f"only PCM16 WAV supported, got width {w.getsampwidth()}")
        raw = w.readframes(nframes)
    pcm = np.frombuffer(raw, dtype="<i2").reshape(-1, nch)
    means = pcm.mean(axis=0) if len(pcm) else np.zeros(nch)
    return [float(nch), float(rate), float(nframes)] + [float(m) for m in means]


_PPM_HEADER_RE = _re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")


def ppm_bytes(width: int, height: int, rgb: bytes) -> bytes:
    """Encode raw RGB bytes as a binary PPM (P6) payload."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def decode_ppm(payload: bytes) -> list:
    """REAL image decode for binary PPM (P6): header parse + RGB pixels →
    ``[width, height, mean_r, mean_g, mean_b]`` as floats."""
    m = _PPM_HEADER_RE.match(payload)
    if not m:
        raise ValueError("not a binary PPM (P6) payload")
    width, height, maxval = (int(g) for g in m.groups())
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pixels = np.frombuffer(payload, dtype=np.uint8, count=width * height * 3, offset=m.end())
    rgb = pixels.reshape(-1, 3).astype(np.float64)
    means = rgb.mean(axis=0) if len(rgb) else np.zeros(3)
    return [float(width), float(height)] + [float(c) for c in means]


_DECODERS = {"wav": decode_wav, "ppm": decode_ppm}


def extract_features(
    df: DataFrame,
    content_col: str = "content",
    dim: int = 64,
    fake: bool = False,
    decoder: Optional[str] = None,
) -> DataFrame:
    """mapInPandas feature extraction: binary column → array<float> column.

    ``decoder`` selects the per-payload decode:
    - ``"wav"`` / ``"ppm"`` — REAL decoders (header parse + sample/pixel
      statistics, see decode_wav/decode_ppm);
    - ``"fake"`` (or ``fake=True``) — deterministic content-hash-seeded
      pseudo-embedding of ``dim`` floats;
    - ``None`` — NotImplementedError *inside the workers* on first batch,
      the honest marker for codec formats whose libraries aren't wired.

    Whichever decoder runs, the schema, Arrow batching and partition
    behavior are identical — swapping in a heavier codec is a pure
    function replacement.
    """
    if fake and decoder is None:
        decoder = "fake"
    out_schema = StructType(df.schema.fields + [StructField("feature", ArrayType(FloatType()), True)])

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is None:
                raise NotImplementedError(
                    "no decoder wired for this media format (codec libraries "
                    "not present); pass decoder='wav'/'ppm' for the stdlib "
                    "decoders or 'fake' for the deterministic stub"
                )
            if decoder == "fake":
                feats = [
                    _fake_feature(bytes(p) if p is not None else b"", dim).tolist()
                    for p in pdf[content_col]
                ]
            else:
                fn = _DECODERS[decoder]
                feats = [
                    fn(bytes(p)) if p is not None else None for p in pdf[content_col]
                ]
            pdf = pdf.copy()
            pdf["feature"] = feats
            yield pdf

    return df.mapInPandas(_extract, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    content_col: str = "content",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    timestamp (decode stubbed — emits frame offsets, not pixels). Shows the
    explode-style fan-out that real frame extraction would use."""
    n_frames = (F.coalesce(F.col(duration_col), F.lit(0)) / F.lit(every_ms)).cast("int")
    offsets = F.transform(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: i * F.lit(every_ms),
    )
    return df.withColumn("frame_ts_ms", F.explode(offsets))


def resize_ppm(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL image resize for binary PPM (P6): nearest-neighbor via numpy
    index sampling (src = (dst·in)÷out, floored) — deterministic, no codec
    libraries. Returns a valid P6 payload of the new dimensions."""
    m = _PPM_HEADER_RE.match(payload)
    if not m:
        raise ValueError("not a binary PPM (P6) payload")
    width, height, maxval = (int(g) for g in m.groups())
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pixels = np.frombuffer(
        payload, dtype=np.uint8, count=width * height * 3, offset=m.end()
    ).reshape(height, width, 3)
    rows = (np.arange(out_h) * height) // out_h
    cols = (np.arange(out_w) * width) // out_w
    out = pixels[rows][:, cols]
    return ppm_bytes(out_w, out_h, out.tobytes())


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    content_col: str = "content",
) -> DataFrame:
    """mapInPandas image resize: rewrite the binary payload to
    ``out_w × out_h`` (real nearest-neighbor for PPM payloads) and update
    the width/height metadata columns when present. Same partition-local
    Arrow streaming as extract_features — payloads never shuffle."""
    fields = list(df.schema.fields)
    out_schema = StructType(fields)
    has_w = "width" in df.columns
    has_h = "height" in df.columns

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[content_col] = [
                resize_ppm(bytes(p), out_w, out_h) if p is not None else None
                for p in pdf[content_col]
            ]
            if has_w:
                pdf["width"] = [
                    out_w if p is not None else None for p in pdf[content_col]
                ]
            if has_h:
                pdf["height"] = [
                    out_h if p is not None else None for p in pdf[content_col]
                ]
            yield pdf

    return df.mapInPandas(_resize, schema=out_schema)
