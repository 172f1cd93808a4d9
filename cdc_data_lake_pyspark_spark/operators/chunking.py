"""Context-window document chunking — the "split long documents into
training-sequence windows with overlap" step of an LLM data pipeline
(BASELINE.json §2.6 capability surface; the dual of sequence packing in
``operators/packing.py``: packing merges short docs up to a budget,
chunking splits long docs down to one).

Scale design: pure narrow-map expressions — ``split`` once per document,
``explode(sequence(...))`` for the chunk starts, ``slice`` +
``array_join`` per chunk.  NO shuffle anywhere, no UDF, fully
whole-stage-codegen'd; output partitioning inherits the input, so a
downstream tokenize/pack stage starts from co-located chunks of the same
document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document's token sequence into overlapping windows.

    Chunk starts are ``0, stride, 2·stride, …`` while the start is inside
    the document, so every token belongs to at least one chunk; with
    ``stride < window`` consecutive chunks overlap by ``window − stride``
    tokens (context continuity across training sequences).  The final
    chunk is short when the document doesn't divide evenly — never
    dropped, never padded.

    Returns ``(doc_id, chunk_id, chunk_text, chunk_tokens)`` where
    ``chunk_id = start / stride`` (0-based, deterministic) and
    ``chunk_tokens`` is the actual token count of the chunk.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("_n") - 1, F.lit(0)), F.lit(stride)
    )
    exploded = base.select(
        id_col, "_toks", "_n", F.explode(starts).alias("_s")
    )
    chunk = F.slice("_toks", F.col("_s") + 1, window)
    return exploded.select(
        F.col(id_col),
        (F.col("_s") / stride).cast("long").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.least(F.lit(window), F.col("_n") - F.col("_s"))
        .cast("long")
        .alias("chunk_tokens"),
    )
