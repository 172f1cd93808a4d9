"""Multimodal column plumbing: opaque binary payloads + typed metadata.

BASELINE.json §2.6: images/audio/video are carried as ``binary`` columns
with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages.  The actual
codec work is STUBBED (image/audio libraries are not in this container):
``decode_image`` raises ``NotImplementedError`` unless a decoder is
injected, and ``fake_decode_features`` is the deterministic stand-in used
by tests.  The Spark-side plumbing — schema, batching, partitioning, UDF
signatures — is real and tested.

Scale: binary payloads never pass through Python row-by-row; Arrow moves
whole columnar batches, and ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds executor memory per batch.  Metadata-only operations (length,
digest, filtering) stay JVM-side and never touch the payload in Python.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


#: Signature for injected decoders: raw bytes → feature vector.
Decoder = Callable[[bytes], list[float]]


def decode_image(payload: bytes, decoder: Optional[Decoder] = None) -> list[float]:
    """Decode stub: real image decoding needs a codec library that is not
    available in this environment."""
    if decoder is None:
        raise NotImplementedError(
            "image decoding requires an injected decoder (no codec libs here); "
            "use fake_decode_features for deterministic tests"
        )
    return decoder(payload)


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
