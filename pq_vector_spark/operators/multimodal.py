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


def _parse_ppm_header(payload: bytes, start: int = 0):
    """Parse a binary-PPM (P6) header at byte offset ``start``, INCLUDING
    '#' comment lines (the netpbm spec allows comments between any header
    tokens). Returns (width, height, maxval, pixel_data_offset) — the
    offset is ABSOLUTE within ``payload`` — or raises ValueError.

    Scanning by absolute index (no ``payload[start:]`` slice) keeps
    multi-frame video parsing linear in payload size instead of O(n²)
    byte copies per frame."""
    if not payload or not payload.startswith(b"P6", start):
        raise ValueError("not a binary PPM (P6) payload")
    i, n = start + 2, len(payload)
    vals = []
    while len(vals) < 3 and i < n:
        c = payload[i : i + 1]
        if c in b" \t\r\n":
            i += 1
        elif c == b"#":
            while i < n and payload[i : i + 1] not in b"\r\n":
                i += 1
        elif c.isdigit():
            j = i
            while j < n and payload[j : j + 1].isdigit():
                j += 1
            vals.append(int(payload[i:j]))
            i = j
        else:
            raise ValueError("not a binary PPM (P6) payload")
    if len(vals) < 3 or i >= n:
        raise ValueError("truncated PPM header")
    # exactly one whitespace byte separates maxval from the pixel data
    return vals[0], vals[1], vals[2], i + 1


def ppm_bytes(width: int, height: int, rgb: bytes) -> bytes:
    """Encode raw RGB bytes as a binary PPM (P6) payload."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def decode_ppm(payload: bytes) -> list:
    """REAL image decode for binary PPM (P6), comments included: header
    parse + RGB pixels → ``[width, height, mean_r, mean_g, mean_b]``."""
    width, height, maxval, offset = _parse_ppm_header(payload)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pixels = np.frombuffer(payload, dtype=np.uint8, count=width * height * 3, offset=offset)
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
    if decoder is not None and decoder != "fake" and decoder not in _DECODERS:
        # fail on the DRIVER with the valid choices, not as a KeyError
        # inside an executor on the first batch
        raise ValueError(
            f"unknown decoder {decoder!r}; choose one of "
            f"{sorted(_DECODERS)} (real), 'fake' (deterministic stub), or "
            "None (raises NotImplementedError in the workers)"
        )
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


def split_ppm_frames(payload: bytes) -> list:
    """Split a concatenated-P6 'video' payload (frame after frame, each a
    complete binary PPM) into the per-frame byte slices. Raises ValueError
    on anything that is not wall-to-wall P6 frames."""
    frames = []
    off, n = 0, len(payload or b"")
    while off < n:
        w, h, maxval, data_off = _parse_ppm_header(payload, off)
        end = data_off + w * h * 3
        if end > n:
            raise ValueError("truncated PPM frame")
        frames.append(payload[off:end])
        off = end
    if not frames:
        raise ValueError("empty video payload")
    return frames


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    content_col: str = "content",
    duration_col: str = "duration_ms",
    decoder: Optional[str] = "ppm",
) -> DataFrame:
    """REAL frame sampling for video rows: one output row per sampled
    timestamp, carrying the CUT frame bytes and its decoded pixel stats.

    ``decoder``:
    - ``"ppm"`` — the real path: the payload is a concatenated-P6 video
      (``split_ppm_frames``); the frame covering each sampled timestamp is
      sliced out verbatim (``frame`` column) and decoded for
      width/height/per-channel means.
    - ``"fake"`` — deterministic content-hash-seeded stats per timestamp
      (for codec formats whose libraries aren't wired); ``frame`` is NULL.
    - ``None`` — NotImplementedError inside the workers.

    NULL payloads on the REAL ('ppm') path yield NULL frame/index/stat
    columns for each sampled timestamp — never fabricated statistics; only
    the explicitly-chosen 'fake' decoder ever invents numbers.

    Timestamps: 0, every_ms, … while < duration_ms (one frame at 0 when the
    duration is NULL/0); the frame index for timestamp t is
    ``min(t * n_frames // duration_ms, n_frames - 1)`` — the frame on
    screen at t under even spacing. mapInPandas streams Arrow batches
    partition-locally; payloads never shuffle."""
    if decoder is not None and decoder not in ("ppm", "fake"):
        raise ValueError(f"unknown video decoder {decoder!r}; choose 'ppm', 'fake', or None")
    out_schema = StructType(
        df.schema.fields
        + [
            StructField("frame_ts_ms", IntegerType(), False),
            StructField("frame_index", IntegerType(), True),  # NULL payload → NULL
            StructField("frame", BinaryType(), True),
            StructField("frame_width", IntegerType(), True),
            StructField("frame_height", IntegerType(), True),
            StructField("frame_mean_r", FloatType(), True),
            StructField("frame_mean_g", FloatType(), True),
            StructField("frame_mean_b", FloatType(), True),
        ]
    )
    cols = [f.name for f in df.schema.fields]

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for row in pdf.to_dict("records"):
                if decoder is None:
                    raise NotImplementedError(
                        "no video decoder wired for this format; pass "
                        "decoder='ppm' for concatenated-P6 payloads or "
                        "'fake' for the deterministic stub"
                    )
                payload = row.get(content_col)
                payload = bytes(payload) if payload is not None else None
                dur = row.get(duration_col)
                dur = int(dur) if dur is not None else 0
                ts_list = (
                    [i * every_ms for i in range(max(dur // every_ms, 1))]
                    if dur > 0
                    else [0]
                )
                if decoder == "ppm":
                    if payload is None:
                        # real path + no content ⇒ NULL features (a
                        # hash-seeded stand-in here would silently corrupt
                        # downstream feature columns)
                        for t in ts_list:
                            out_rows.append(
                                {**row, "frame_ts_ms": t, "frame_index": None,
                                 "frame": None, "frame_width": None,
                                 "frame_height": None, "frame_mean_r": None,
                                 "frame_mean_g": None, "frame_mean_b": None}
                            )
                        continue
                    frames = split_ppm_frames(payload)
                    nf = len(frames)
                    for t in ts_list:
                        idx = min(t * nf // dur, nf - 1) if dur > 0 else min(
                            t // max(every_ms, 1), nf - 1
                        )
                        fb = frames[idx]
                        w, h, mr, mg, mb = decode_ppm(fb)
                        out_rows.append(
                            {**row, "frame_ts_ms": t, "frame_index": idx,
                             "frame": fb, "frame_width": int(w),
                             "frame_height": int(h), "frame_mean_r": mr,
                             "frame_mean_g": mg, "frame_mean_b": mb}
                        )
                else:
                    for j, t in enumerate(ts_list):
                        stats = (
                            _fake_feature((payload or b"") + t.to_bytes(4, "big"), 5)
                            * 255.0
                        )
                        out_rows.append(
                            {**row, "frame_ts_ms": t, "frame_index": j,
                             "frame": None, "frame_width": int(stats[0]),
                             "frame_height": int(stats[1]),
                             "frame_mean_r": float(stats[2]),
                             "frame_mean_g": float(stats[3]),
                             "frame_mean_b": float(stats[4])}
                        )
            yield pd.DataFrame(out_rows, columns=cols + [
                "frame_ts_ms", "frame_index", "frame", "frame_width",
                "frame_height", "frame_mean_r", "frame_mean_g", "frame_mean_b",
            ])

    return df.mapInPandas(_sample, schema=out_schema)


def resize_ppm(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL image resize for binary PPM (P6): nearest-neighbor via numpy
    index sampling (src = (dst·in)÷out, floored) — deterministic, no codec
    libraries. Returns a valid P6 payload of the new dimensions."""
    width, height, maxval, offset = _parse_ppm_header(payload)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pixels = np.frombuffer(
        payload, dtype=np.uint8, count=width * height * 3, offset=offset
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
