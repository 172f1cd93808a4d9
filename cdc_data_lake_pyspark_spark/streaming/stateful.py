"""Custom stateful streaming operators (Structured Streaming).

The reference keeps NO cross-batch state — ordering/dedup exist only
within a micro-batch (SURVEY §2.5 "no watermarks, no event-time windows,
no stateful ops"), which is one of its documented gaps.  These operators
close it with the standard Spark mechanisms:

* :func:`first_occurrence_only` — cross-batch key dedup via
  ``applyInPandasWithState``: a key's first-ever row is emitted, every
  later occurrence (same batch or any later batch) is dropped.  State per
  key is one boolean, optionally TTL'd by processing-time timeout so the
  state store stays bounded at 100 TB key cardinalities.
* :func:`windowed_event_counts` — event-time tumbling-window counts with a
  watermark, the late-data-tolerant aggregation shape.

Scale: state lives in the executor state store keyed by the grouping key —
the shuffle is ``hashpartitioning(keys)``, identical to a streaming
aggregation; at 100 TB the knobs are the state-store provider (RocksDB),
watermark/TTL to bound state, and key salting is NOT applicable (state
must be per-key).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_occurrence_only(
    source: DataFrame,
    key_cols: Sequence[str],
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Emit only the FIRST row ever observed per key, across micro-batches.

    ``state_ttl_ms`` re-admits a key after that much processing-time
    inactivity (bounds state size; ``None`` keeps keys forever).
    """
    key_cols = list(key_cols)
    out_schema = source.schema
    columns = source.schema.fieldNames()
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def fn(
        key, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.exists
        first = None
        for pdf in batches:
            if first is None and len(pdf):
                first = pdf.iloc[[0]][columns]
        if not seen:
            state.update((True,))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if not seen and first is not None:
            yield first

    return source.groupBy(*[F.col(c) for c in key_cols]).applyInPandasWithState(
        fn, out_schema, "seen boolean", "append", timeout
    )


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window per-key event counts with a late-data watermark —
    rows later than ``watermark_delay`` behind the max observed event time
    are dropped, and windows finalize (append mode) once the watermark
    passes their end."""
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def session_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "1 minute",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Event-time SESSION windows: per-key activity bursts separated by at
    least ``gap`` of silence — the streaming counterpart of the batch
    ``sessionize`` operator (operators/relational.py).

    ``session_window`` keeps per-key open sessions in the state store and
    MERGES them across micro-batches (an event bridging two sessions
    collapses them — something a tumbling window can't express); a session
    finalizes and emits (append mode) once the watermark passes its end,
    which also evicts its state.  Scale knobs are the same as any stateful
    agg: shuffle on the key, RocksDB state store, watermark bounds state.
    """
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("win"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )
