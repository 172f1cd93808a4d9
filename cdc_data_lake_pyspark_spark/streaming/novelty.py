"""Streaming near-duplicate gate: cross-batch incremental dedup.

The batch operator (``queries_phase4.py::incremental_novel_docs``)
anti-joins a new slice against the corpus fingerprint index; this module
runs the same semantics CONTINUOUSLY — ``readStream`` →
``foreachBatch(StreamingNoveltyGate.process_batch)`` — so every
micro-batch of crawled documents is gated against everything ingested
before it.

Exactly-once story: the fingerprint index IS the output store.  A batch
appends only rows whose fingerprint is absent from the index, so a
checkpoint-replayed batch finds its fingerprints already present and
appends nothing — idempotent by construction, no separate output table
to reconcile (same convergence argument as MERGE-on-PK in
``streaming/runner.py``).

Scale: the index carries 32-byte digests + ids, never documents — a
fraction of corpus size.  Each micro-batch shuffles once on the digest
(map-side first-per-fingerprint combine first); the corpus is never
rescanned; the index grows by appending novel fingerprints (union, not
rebuild).  At 100 TB-of-corpus scale, store the index partitioned/
bucketed by a fingerprint prefix so the per-batch anti-join co-locates
without a full-index shuffle, and compact small batch files periodically.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

INDEX_SCHEMA = T.StructType(
    [
        T.StructField("fp", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("batch_id", T.LongType(), True),
    ]
)


def document_fingerprint(text_col: str = "text", normalize: bool = True):
    """The gate's fingerprint — identical to the batch operator's
    (md5 of lower/trimmed text), so stream and batch results agree."""
    text = F.col(text_col)
    if normalize:
        text = F.lower(F.trim(text))
    return F.md5(text)


class StreamingNoveltyGate:
    """``foreachBatch`` target maintaining the updating fingerprint index.

    Per micro-batch: fingerprint → first-per-fingerprint within the batch
    (min id, the batch self-dedup of ``incremental_novel_docs``) →
    anti-join the stored index → append only the novel rows.
    """

    def __init__(
        self,
        index_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        normalize: bool = True,
    ) -> None:
        self.index_dir = index_dir
        self.id_col = id_col
        self.text_col = text_col
        self.normalize = normalize

    def index(self, spark: SparkSession) -> DataFrame:
        """Current index (empty-typed frame before the first batch)."""
        try:
            return spark.read.schema(INDEX_SCHEMA).parquet(self.index_dir)
        except Exception:
            return spark.createDataFrame([], INDEX_SCHEMA)

    def novel_docs(self, spark: SparkSession) -> DataFrame:
        """Gate output so far: one row per novel fingerprint with the
        keeper doc id and the batch that first saw it."""
        return self.index(spark)

    def process_batch(self, batch_df: DataFrame, batch_id: int = -1) -> None:
        spark = batch_df.sparkSession
        fp = document_fingerprint(self.text_col, self.normalize)
        firsts = (
            batch_df.select(
                fp.alias("fp"), F.col(self.id_col).cast("long").alias("doc_id")
            )
            .filter(F.col("fp").isNotNull())
            .groupBy("fp")
            .agg(F.min("doc_id").alias("doc_id"))
        )
        novel = firsts.join(
            self.index(spark).select("fp"), "fp", "left_anti"
        ).withColumn("batch_id", F.lit(batch_id).cast("long"))
        # Append commits atomically (FileOutputCommitter); a replayed batch
        # re-derives `novel` as empty because its fps are now present.
        novel.write.mode("append").parquet(self.index_dir)


def start_novelty_stream(
    source: DataFrame,
    gate: StreamingNoveltyGate,
    checkpoint_location: str,
    trigger_seconds: Optional[int] = None,
    query_name: str = "novelty_gate",
    available_now: bool = False,
) -> StreamingQuery:
    """Start the micro-batch stream feeding the novelty gate."""
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
