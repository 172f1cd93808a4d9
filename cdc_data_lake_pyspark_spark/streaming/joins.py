"""Stream-stream joins: event-time correlation of two live streams — the
streaming counterpart of the batch attribution/interval join
(queries_phase4.purchase_attribution_window).

Spark buffers BOTH sides in the state store until the watermark proves no
more matches can arrive; the join condition therefore needs (a) an
equality key — which also keys the state store and the shuffle — and
(b) a time-range bound between the two event times, which is what lets
the engine evict state.  Without (b), state grows forever; that is the
canonical stream-stream-join mistake and the reason this helper makes the
window mandatory.

Scale: state per key ≈ rows inside the watermark+range horizon; shuffle
is one hashpartitioning per side on the key (RocksDB store at real
scale, same knobs as any stateful op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner-join two streams on ``key`` where the right event happened in
    ``[left_ts − lookback, left_ts]`` — "clicks in the hour before each
    purchase" when left=purchases, right=clicks.

    Both sides get the SAME watermark delay so the eviction horizon is
    symmetric; all columns are prefixed to keep the joined schema
    collision-free.
    """
    lw = left.withWatermark(left_ts, watermark).select(
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns]
    )
    rw = right.withWatermark(right_ts, watermark).select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    )
    lk, rk = f"{left_prefix}{key}", f"{right_prefix}{key}"
    lt, rt = f"{left_prefix}{left_ts}", f"{right_prefix}{right_ts}"
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(rt) <= F.col(lt))
        & (F.col(rt) >= F.col(lt) - F.expr(f"INTERVAL {lookback}"))
    )
    return lw.join(rw, cond)
