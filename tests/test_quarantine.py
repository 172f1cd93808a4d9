"""Streaming quarantine wrapper: bad rows divert to the dead-letter
store with their failed-check labels, clean rows reach the wrapped
target, and a replayed batch reproduces identical quarantine content."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.streaming.quarantine import (
    read_quarantine,
    with_quarantine,
)


def test_quarantine_splits_and_labels(spark, tmp_path):
    qdir = str(tmp_path / "dlq")
    seen = []

    def target(df, batch_id):
        seen.append(sorted(r["id"] for r in df.collect()))

    gate = with_quarantine(
        target,
        checks=[
            ("null_name", F.col("name").isNull()),
            ("v_min_1", F.col("v") < 1),
        ],
        quarantine_dir=qdir,
    )
    batch = spark.createDataFrame(
        [
            (1, "a", 5.0),
            (2, None, 0.5),  # fails both checks
            (3, "c", 0.2),   # fails range only
            (4, "d", 3.0),
        ],
        "id long, name string, v double",
    )
    gate(batch, batch_id=7)
    assert seen == [[1, 4]]
    q = {
        r["id"]: (r["_violations"], r["_batch_id"])
        for r in read_quarantine(spark, qdir).collect()
    }
    assert q == {
        2: ("null_name,v_min_1", 7),
        3: ("v_min_1", 7),
    }

    # replayed batch: same rows re-quarantined under the same batch id —
    # distinct() recovers the exact set
    gate(batch, batch_id=7)
    assert seen == [[1, 4], [1, 4]]
    assert read_quarantine(spark, qdir).distinct().count() == 2
