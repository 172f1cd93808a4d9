"""Streaming NEAR-duplicate gate: the MinHash analogue of
:mod:`~cdc_data_lake_pyspark_spark.streaming.novelty` (VERDICT r10 #3).

The novelty gate drops exact re-crawls via a fingerprint index; this
gate drops near-duplicates via the persistent MinHash index
(:func:`~cdc_data_lake_pyspark_spark.operators.dedup_text.minhash_index`
/ ``minhash_probe``) — ``readStream`` → ``foreachBatch`` — so every
micro-batch of crawled documents is near-dup-gated against everything
SEEN before it, day over day, without ever re-shingling the corpus.

Semantics (the slicing-invariance contract, pinned in
``tests/test_streaming_neardup.py``): a document is NOVEL iff no
document seen strictly earlier — in ``(batch, id)`` order — is within
``threshold`` Broder-estimated Jaccard of it.  "Seen", not "kept": the
index stores EVERY seen document's signature, exactly as the novelty
gate indexes every distinct fingerprint, so the verdict for a document
never depends on how the stream was sliced into micro-batches.  (A
kept-only index would diverge on chains: with a ~ b ~ c but a ≁ c, one
batch {a,b,c} and three batches {a},{b},{c} would disagree about c.)

Exactly-once story: batch ids are anti-joined against the signature
store FIRST, so a checkpoint-replayed batch finds its ids already
indexed and reduces to a no-op — idempotent by construction, the same
convergence argument as the novelty gate's fingerprint-presence check
(`streaming/novelty.py`), keyed on ids rather than digests because
near-dup verdicts are per-document, not per-fingerprint.

Scale: per batch, signature construction touches BATCH text only (one
map-side-combined aggregate); candidate discovery is one (band, bucket)
hash join against the stored bucket table — bucket sizes track
duplicate density, never corpus size — plus the batch's own bucket
self-join for within-batch pairs; the estimate join moves two
``num_hashes``-long arrays per candidate.  The index grows by parquet
APPENDS (~0.6 KB/doc at the defaults); no text is ever stored.  At
100 TB, partition the bucket store by a bucket prefix so daily probes
co-locate without a full-index shuffle, and compact small batch files
periodically — same operational posture as the novelty index.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from cdc_data_lake_pyspark_spark.operators.dedup_text import (
    MinHashIndex,
    _banded,
    _estimate_candidates,
    _estimate_filter,
    minhash_signatures,
)

SIG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("sig", T.ArrayType(T.LongType()), True),
    ]
)

BUCKET_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("bucket", T.LongType(), True),
    ]
)

KEPT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("batch_id", T.LongType(), True),
    ]
)


class StreamingNearDupGate:
    """``foreachBatch`` target maintaining the updating MinHash index.

    Per micro-batch: replay-guard (anti-join on already-indexed ids) →
    batch signatures (one aggregate over batch text) → cross-index
    candidates + within-batch candidates (``a.id < b.id``) → Broder
    estimate ≥ ``threshold`` drops the later document → append ALL
    batch signatures/buckets to the index and the survivors to the
    kept set."""

    def __init__(
        self,
        index_dir: str,
        threshold: float = 0.8,
        num_hashes: int = 64,
        k: int = 3,
        bands: int = 16,
        rows_per_band: int = 4,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        self.index_dir = index_dir
        self.threshold = threshold
        self.num_hashes = num_hashes
        self.k = k
        self.bands = bands
        self.rows_per_band = rows_per_band
        self.id_col = id_col
        self.text_col = text_col

    # -- state readers ----------------------------------------------------
    def _read(self, spark: SparkSession, sub: str, schema) -> DataFrame:
        try:
            return spark.read.schema(schema).parquet(
                f"{self.index_dir}/{sub}"
            )
        except Exception:
            return spark.createDataFrame([], schema)

    def index(self, spark: SparkSession) -> MinHashIndex:
        """Current index over every SEEN document (empty-typed frames
        before the first batch), as the same :class:`MinHashIndex`
        artifact the batch save/load lifecycle uses."""
        return MinHashIndex(
            self._read(spark, "signatures", SIG_SCHEMA),
            self._read(spark, "buckets", BUCKET_SCHEMA),
            self.num_hashes,
            self.k,
            self.bands,
            self.rows_per_band,
        )

    def kept_docs(self, spark: SparkSession) -> DataFrame:
        """Gate output so far: ``(doc_id, batch_id)`` of every document
        that had no earlier near-duplicate when it arrived.  Distinct:
        a batch that crashed between its kept append and its signature
        append is re-run by the replay guard and re-appends the
        identical rows (same batch_id under checkpoint replay) — the
        fold here is what makes that crash window harmless."""
        return self._read(spark, "kept", KEPT_SCHEMA).distinct()

    # -- the pure reduction -------------------------------------------------
    def batch_reduce(
        self, batch_df: DataFrame, index: MinHashIndex
    ) -> tuple[DataFrame, DataFrame]:
        """The gate's pure single-batch reduction against a GIVEN index:
        returns ``(novel, batch_signatures)`` where novel is the batch's
        surviving ``(doc_id)`` rows — no state I/O, so batch-vs-stream
        agreement is testable on exactly this function.  Within-batch
        pairs use the same banding + estimate machinery with the
        ``smaller id = earlier`` convention; the signature frame rides
        along so the caller's appends never recompute shingling."""
        batch = batch_df.select(
            F.col(self.id_col).cast("long").alias("doc_id"),
            F.col(self.text_col).alias("text"),
        ).filter(F.col("text").isNotNull())
        bsigs = minhash_signatures(
            batch, num_hashes=self.num_hashes, k=self.k
        ).localCheckpoint(eager=False)
        bban = _banded(bsigs, self.bands, self.rows_per_band)
        cross = _estimate_filter(
            _estimate_candidates(bban, index.buckets),
            bsigs,
            index.signatures,
            self.threshold,
            self.num_hashes,
        )
        inner = _estimate_filter(
            _estimate_candidates(bban, bban).filter(
                F.col("index_id") < F.col("batch_id")
            ),
            bsigs,
            bsigs,
            self.threshold,
            self.num_hashes,
        )
        dropped = (
            cross.select(F.col("batch_id").alias("doc_id"))
            .unionByName(inner.select(F.col("batch_id").alias("doc_id")))
            .distinct()
        )
        novel = bsigs.select("doc_id").join(dropped, "doc_id", "left_anti")
        return novel, bsigs

    # -- the foreachBatch target -------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int = -1) -> None:
        spark = batch_df.sparkSession
        index = self.index(spark)
        # replay guard: ids already in the signature store were fully
        # processed by a previous (possibly crashed-after-write) attempt
        fresh = batch_df.join(
            index.signatures.select(
                F.col("doc_id").alias(self.id_col)
            ),
            self.id_col,
            "left_anti",
        )
        novel, bsigs = self.batch_reduce(fresh, index)
        # eager-stage the batch artifacts so the three appends share one
        # signature computation (multi-consumer staging)
        bsigs = bsigs.localCheckpoint()
        if bsigs.isEmpty():
            return
        novel = novel.localCheckpoint()
        # Signatures are written LAST because the replay guard keys on
        # them: a batch that dies mid-sequence left ids absent from
        # signatures/, so the replay re-runs it in full.  The partial
        # leftovers are harmless by construction — duplicate kept rows
        # carry the same (doc_id, batch_id) and fold in kept_docs()'s
        # distinct; duplicate bucket rows fold in candidate discovery's
        # distinct; and orphan bucket rows (bucket write landed, crash
        # before signatures) cannot flip verdicts during the re-run:
        # their estimate join finds no signature row and drops the pair.
        novel.withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).write.mode("append").parquet(f"{self.index_dir}/kept")
        _banded(bsigs, self.bands, self.rows_per_band).write.mode(
            "append"
        ).parquet(f"{self.index_dir}/buckets")
        bsigs.write.mode("append").parquet(f"{self.index_dir}/signatures")


def start_neardup_stream(
    source: DataFrame,
    gate: StreamingNearDupGate,
    checkpoint_location: str,
    trigger_seconds: Optional[int] = None,
    query_name: str = "neardup_gate",
    available_now: bool = False,
) -> StreamingQuery:
    """Start the micro-batch stream feeding the near-dup gate."""
    writer = (
        source.writeStream.outputMode("append")
        .queryName(query_name)
        .foreachBatch(gate.process_batch)
        .option("checkpointLocation", checkpoint_location)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
