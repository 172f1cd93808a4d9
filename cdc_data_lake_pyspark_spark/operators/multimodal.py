"""Multimodal column plumbing: opaque binary payloads + typed metadata.

BASELINE.json §2.6: images/audio/video are carried as ``binary`` columns
with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages.  Decoding is
REAL for uncompressed containers — 24-bit BMP, netpbm P6, RIFF/WAVE
PCM16 — via the pure-numpy codecs in ``functions/codecs.py`` (no codec
libraries exist in this container, and none are needed for those
formats).  Compressed formats (JPEG/MP3/...) still require an injected
decoder; ``fake_decode_features`` remains the deterministic stand-in for
exercising the plumbing without any container at all.

Scale: binary payloads never pass through Python row-by-row; Arrow moves
whole columnar batches, and ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds executor memory per batch.  Metadata-only operations (length,
digest, filtering) stay JVM-side and never touch the payload in Python.
Inside a batch, numpy does the per-pixel/per-sample work; Python only
touches container headers.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_data_lake_pyspark_spark.functions.codecs import (
    decode_any_image,
    decode_wav,
    encode_bmp,
    encode_wav,
)

#: Metadata carried alongside every binary payload column.
MEDIA_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
    ]
)


def with_media_metadata(
    df: DataFrame, payload_col: str, media_type: str = "application/octet-stream"
) -> DataFrame:
    """Attach the typed metadata struct, computed JVM-side (no Python)."""
    p = F.col(payload_col)
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.length(p).cast("long").alias("n_bytes"),
        F.md5(p).alias("digest"),
    )
    return df.withColumn(f"{payload_col}_meta", meta)


def text_as_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Encode a text column as a binary payload (UTF-8) — the test-data
    stand-in for real image/audio bytes."""
    return df.withColumn("payload", F.col(text_col).cast("binary"))


#: Signature for injected decoders: raw bytes → decoded value.
Decoder = Callable[[bytes], object]


def decode_image(payload: bytes, decoder: Optional[Decoder] = None):
    """Decode an image payload to an ``(h, w, 3)`` uint8 RGB array.

    BMP (24-bit BI_RGB) and netpbm P6 decode natively (pure numpy,
    ``functions/codecs.py``); other containers need an injected
    ``decoder`` (compressed codecs aren't available in this environment)
    and raise ``ValueError`` otherwise."""
    if decoder is not None:
        return decoder(payload)
    return decode_any_image(payload)


def decode_audio(payload: bytes, decoder: Optional[Decoder] = None):
    """Decode an audio payload to ``(samples, sample_rate)`` — int16 PCM
    from a RIFF/WAVE container natively; other containers via an injected
    ``decoder``."""
    if decoder is not None:
        return decoder(payload)
    return decode_wav(payload)


def fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake decode: md5 bytes → ``dim`` floats in [0, 1).
    Stands in for a real feature extractor so the distributed plumbing can
    be exercised end-to-end."""
    digest = hashlib.md5(payload).digest()
    return [digest[i % 16] / 256.0 for i in range(dim)]


EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: Optional[Decoder] = None,
    dim: int = 8,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` receives whole Arrow batches; per batch the decode loop
    is plain Python over bytes (the stub), but batching amortizes transfer
    and keeps executor parallelism = partition count.
    """
    use = decoder or (lambda b: fake_decode_features(b, dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len),
                    "digest": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "features": payloads.map(lambda b: use(bytes(b))),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, EXTRACT_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("r_sum", T.LongType(), True),
        T.StructField("g_sum", T.LongType(), True),
        T.StructField("b_sum", T.LongType(), True),
        T.StructField("weighted_sum", T.LongType(), True),
    ]
)


def image_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: Optional[Decoder] = None,
) -> DataFrame:
    """Decode image payloads (real BMP/PPM decode by default) and extract
    exact integer statistics: dimensions, per-channel pixel sums, and a
    position-weighted checksum ``sum(v[i] * (i+1))`` over the flattened
    (row, col, RGB-channel) sequence.  Integer features make the decode
    path oracle-checkable bit-for-bit, and the position weighting catches
    row-order / channel-order / padding mistakes that order-invariant
    sums would miss."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                px = decode_image(bytes(payload), decoder).astype(np.int64)
                h, w, _ = px.shape
                flat = px.reshape(-1)
                idx = np.arange(1, flat.size + 1, dtype=np.int64)
                rows.append(
                    (
                        did,
                        w,
                        h,
                        int(px[:, :, 0].sum()),
                        int(px[:, :, 1].sum()),
                        int(px[:, :, 2].sum()),
                        int((flat * idx).sum()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_STATS_SCHEMA])

    return df.select(id_col, payload_col).mapInPandas(run, IMAGE_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("sample_sum", T.LongType(), True),
        T.StructField("weighted_sum", T.LongType(), True),
    ]
)


def audio_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: Optional[Decoder] = None,
) -> DataFrame:
    """Decode audio payloads (real WAV/PCM16 decode by default) and
    extract exact integer statistics: sample count, rate, sample sum, and
    the position-weighted checksum ``sum(s[i] * (i+1))``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                samples, rate = decode_audio(bytes(payload), decoder)
                s = samples.astype(np.int64).reshape(-1)
                idx = np.arange(1, s.size + 1, dtype=np.int64)
                rows.append((did, s.size, rate, int(s.sum()), int((s * idx).sum())))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_STATS_SCHEMA])

    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_STATS_SCHEMA)


def synth_image_pixels(doc_id: int) -> np.ndarray:
    """Deterministic fixture pixels for ``doc_id``: shape
    ``(3 + id % 4, 4 + id % 5, 3)`` with flat value
    ``(id*7 + i*13) % 256`` — pure integer arithmetic a SQL oracle can
    replay with ``generate_series``."""
    w, h = 4 + doc_id % 5, 3 + doc_id % 4
    i = np.arange(w * h * 3, dtype=np.int64)
    return ((doc_id * 7 + i * 13) % 256).astype(np.uint8).reshape(h, w, 3)


def synth_audio_samples(doc_id: int) -> tuple[np.ndarray, int]:
    """Deterministic fixture samples for ``doc_id``: ``64 + id % 97``
    int16 samples ``((id*31 + i*17) % 65536) - 32768`` at rate
    ``8000 + (id % 3) * 4000``."""
    n = 64 + doc_id % 97
    i = np.arange(n, dtype=np.int64)
    samples = (((doc_id * 31 + i * 17) % 65536) - 32768).astype(np.int16)
    return samples, 8000 + (doc_id % 3) * 4000


def synth_media_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Plant REAL container payloads deterministically per id:
    ``bmp_payload`` (24-bit BMP of ``synth_image_pixels``) and
    ``wav_payload`` (RIFF/WAVE PCM16 of ``synth_audio_samples``).

    The payloads cross an Arrow boundary as genuine binary columns, so a
    downstream ``image_stats``/``audio_stats`` stage exercises the full
    encode → shuffle-able binary column → parse-and-decode path."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("bmp_payload", T.BinaryType(), True),
            T.StructField("wav_payload", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                rows.append(
                    (
                        did,
                        encode_bmp(synth_image_pixels(did)),
                        encode_wav(*synth_audio_samples(did)),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema
    )


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """'Frame sampling' over an opaque byte stream: one row per sampled
    offset — the video-frame-extraction shape without a codec.  Offsets are
    generated JVM-side (``sequence``+``explode``); only the slicing is
    per-row."""
    p = F.col(payload_col)
    offsets = F.sequence(F.lit(1), F.greatest(F.length(p), F.lit(1)), F.lit(every_n_bytes))
    return (
        df.select(F.col(id_col), p, F.explode(offsets).alias("frame_offset"))
        .select(
            id_col,
            "frame_offset",
            F.expr(f"substring({payload_col}, frame_offset, {every_n_bytes})").alias(
                "frame_bytes"
            ),
        )
    )


AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("frame_idx", T.LongType(), True),
        T.StructField("energy_sum", T.LongType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
    ]
)


def audio_frame_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_len: int = 32,
    decoder: Optional[Decoder] = None,
) -> DataFrame:
    """Decode audio payloads and extract per-frame features: energy
    (``sum(v²)``) and zero-crossing count per non-overlapping
    ``frame_len``-sample frame — the integer-exact core of a VAD /
    silence-gating pass (energy thresholds, ZCR voicing heuristics).
    Partial tail frames are dropped so every frame is comparable.

    A zero crossing is a sign-bit change between adjacent samples WITHIN
    a frame (``(v[j-1] < 0) != (v[j] < 0)``), so the count is replayable
    with a lag window in SQL.  All features are exact BIGINTs — at
    32-sample frames the energy bound is 32·32768² « int64.

    Scale: the per-doc work is numpy over one Arrow batch; output rows
    are samples/frame_len per doc.  The decode runs ONCE per payload
    per batch, and the features leave Python as integers."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                samples, _ = decode_audio(bytes(payload), decoder)
                s = samples.astype(np.int64).reshape(-1)
                n_frames = s.size // frame_len
                if n_frames == 0:
                    continue
                fr = s[: n_frames * frame_len].reshape(n_frames, frame_len)
                energy = (fr * fr).sum(axis=1)
                neg = fr < 0
                zc = (neg[:, 1:] != neg[:, :-1]).sum(axis=1)
                rows.extend(
                    (did, int(f), int(energy[f]), int(zc[f]))
                    for f in range(n_frames)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FRAME_SCHEMA]
            )

    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_FRAME_SCHEMA)


IMAGE_TILE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("tile_row", T.LongType(), True),
        T.StructField("tile_col", T.LongType(), True),
        T.StructField("channel", T.LongType(), True),
        T.StructField("n_px", T.LongType(), True),
        T.StructField("tile_sum", T.LongType(), True),
    ]
)


def image_tile_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    tile: int = 2,
    decoder: Optional[Decoder] = None,
) -> DataFrame:
    """Decode image payloads and pool pixels into ``tile × tile`` blocks
    per channel — the integer-exact core of a downsample/resize stage
    (average pooling = ``tile_sum / n_px``; sums stay exact so the
    oracle replay is bit-for-bit, the division is the caller's).  Edge
    tiles keep their partial pixel count in ``n_px`` rather than
    padding, so resolution-mismatched inputs can't silently skew means.

    Scale: numpy pools whole Arrow batches; output rows are
    ceil(h/tile)·ceil(w/tile)·3 per image — the downsampled feature
    map a vision pipeline feeds forward."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                px = decode_image(bytes(payload), decoder).astype(np.int64)
                h, w, nc = px.shape
                for tr in range((h + tile - 1) // tile):
                    for tc in range((w + tile - 1) // tile):
                        block = px[
                            tr * tile : (tr + 1) * tile,
                            tc * tile : (tc + 1) * tile,
                            :,
                        ]
                        n_px = block.shape[0] * block.shape[1]
                        sums = block.sum(axis=(0, 1))
                        rows.extend(
                            (did, tr, tc, int(ch), n_px, int(sums[ch]))
                            for ch in range(nc)
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_TILE_SCHEMA]
            )

    return df.select(id_col, payload_col).mapInPandas(run, IMAGE_TILE_SCHEMA)
