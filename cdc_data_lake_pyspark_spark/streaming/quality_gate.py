"""Streaming LEARNED-quality gate: score every micro-batch under a
PERSISTED classifier model and route pass/fail rows — the online half
of the train-offline / score-online split the classifier artifact
(:func:`~cdc_data_lake_pyspark_spark.operators.classifier.save_model`)
exists for.

The quarantine wrapper (`streaming/quarantine.py`) routes rows on
map-only Column predicates; the learned gate cannot ride it because a
classifier score is not a row-local expression — it is a token explode
joined against the broadcast weight table and re-aggregated per doc.
This module is that join, run per micro-batch::

    model = load_model(spark, model_path)         # once, at startup
    gate  = StreamingQualityGate(model, out_dir)
    stream.writeStream.foreachBatch(gate.process_batch)...

Per micro-batch: ``nb_score`` under the (static, 65-row, broadcast)
model → MAP verdict → kept rows append to ``out_dir/kept`` and
rejected rows to ``out_dir/rejected``, both stamped with
``score_micro`` and ``_batch_id`` for triage/replay.

Exactly-once: scoring is a pure function of (row, model), so a
checkpoint-replayed batch re-derives byte-identical output rows with
the SAME ``_batch_id`` — readers fold replay duplicates with
``.distinct()`` exactly (the `streaming/neardup.py` kept-store
argument; there is no cross-batch state here at all, which is what
makes this gate the simplest of the streaming family).

Scale: the model is kilobytes and broadcast; per batch the only
exchange is the doc-keyed partial-sum (a few bytes per document —
measured ~11 B/doc at the 500k-doc axis, SCALE.md §17); batch text
never shuffles.  Model REFRESH is a deployment action, not stream
state: construct a new gate from the re-trained artifact and restart
the query — the verdict function must be a constant within one run for
replays to converge.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_data_lake_pyspark_spark.operators.classifier import nb_score


class StreamingQualityGate:
    """``foreachBatch`` target scoring batches under a fitted model
    (:func:`nb_train`, :func:`lr_train`, or :func:`load_model` — same
    one-frame shape)."""

    def __init__(
        self,
        model: DataFrame,
        out_dir: str,
        n_buckets: int | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
        binary: bool = False,
    ) -> None:
        # stage the static model ONCE here, not per micro-batch (ADVICE
        # r11: a long-running stream re-checkpointing the 65-row frame
        # every batch accumulates RDD blocks until the ContextCleaner
        # catches up) — and derive/validate the feature width from the
        # model's own spine so the gate can never score with a
        # mismatched bucket function
        self.model = model.localCheckpoint(eager=True)
        spine_n = self.model.filter(F.col("bucket") >= 0).count()
        if n_buckets is not None and n_buckets != spine_n:
            raise ValueError(
                f"StreamingQualityGate configured with n_buckets="
                f"{n_buckets} but the model's spine has {spine_n}"
            )
        self.n_buckets = spine_n
        self.out_dir = out_dir
        self.id_col = id_col
        self.text_col = text_col
        self.binary = binary

    def batch_reduce(self, batch_df: DataFrame) -> DataFrame:
        """The gate's pure reduction: the batch with ``score_micro`` and
        ``keep`` attached — no state I/O, so stream output equals this
        function applied per slice (pinned in the soak test)."""
        scores = nb_score(
            batch_df,
            self.model,
            id_col=self.id_col,
            text_col=self.text_col,
            n_buckets=self.n_buckets,
            binary=self.binary,
            staged=True,
        )
        return batch_df.join(scores, self.id_col)

    def process_batch(self, batch_df: DataFrame, batch_id: int = -1) -> None:
        scored = self.batch_reduce(batch_df).withColumn(
            "_batch_id", F.lit(batch_id).cast("long")
        )
        # both routes read one staged scoring pass
        scored = scored.localCheckpoint(eager=True)
        scored.filter(F.col("keep") == 1).drop("keep").write.mode(
            "append"
        ).parquet(f"{self.out_dir}/kept")
        scored.filter(F.col("keep") == 0).drop("keep").write.mode(
            "append"
        ).parquet(f"{self.out_dir}/rejected")

    def _read(self, spark: SparkSession, sub: str) -> DataFrame:
        try:
            # distinct folds checkpoint-replay duplicates EXACTLY: rows
            # are pure functions of (row, model, batch_id)
            return spark.read.parquet(f"{self.out_dir}/{sub}").distinct()
        except Exception:
            from cdc_data_lake_pyspark_spark.localrel import empty_frame

            return empty_frame(
                spark, f"{self.id_col} long, {self.text_col} string, "
                       "score_micro long, _batch_id long"
            )

    def kept_docs(self, spark: SparkSession) -> DataFrame:
        return self._read(spark, "kept")

    def rejected_docs(self, spark: SparkSession) -> DataFrame:
        return self._read(spark, "rejected")


def start_quality_stream(
    source: DataFrame,
    gate: StreamingQualityGate,
    checkpoint_location: str,
    trigger_seconds: Optional[int] = None,
    query_name: str = "quality_gate",
    available_now: bool = False,
) -> StreamingQuery:
    """Start the micro-batch stream feeding the learned quality gate."""
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
