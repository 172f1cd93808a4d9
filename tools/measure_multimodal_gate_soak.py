"""Per-batch cost curve for StreamingMultimodalGate — the chained twin
of tools/measure_vector_gate_soak.py: stream N multimodal micro-batches
(text + embedding per row) through ONE chained gate and record each
batch's wall while BOTH persisted stores grow.

Fixture (deterministic, every batch after 0 carries all three work
types so neither stage can silently degenerate; the phase-11
paraphrase-pool design, sliced by dense row index so sparse ids can't
empty a slice):

* the RECRAWL half: batch-0's content pool A under fresh ids — the
  TEXT stage's work (exact re-crawl, Broder estimate 1.0);
* the PARAPHRASE quarter: text from a NEVER-RECRAWLED donor slice
  (fresh per batch) paired with an A-pool EMBEDDING — only the VECTOR
  stage can drop these (cosine 1.0 against the stored vector of
  content whose text is novel; a text suffix would NOT work — doc vs
  doc+2-words has 3-shingle Jaccard n/(n+2) ≥ 0.8, so it dies at the
  text stage, measured);
* a NOVEL slice per batch (fresh text AND fresh embedding) — the
  keepers, appended to both stores.

What this pins: per-batch wall must stay ~flat as both stores grow —
the text probe joins stored banded buckets only, the vector probe
partition-prunes to the batch's probed cells, the replay guards are
manifest lookups.  ``compact_every`` > 0 additionally exercises the
gates' offline compaction mid-soak (verdict identity is pytest-pinned;
here we record the file-count curve it bounds).

Run: python tools/measure_multimodal_gate_soak.py \
        [sf_dir] [n_batches] [batch_docs] [compact_every]
Writes MULTIMODAL_GATE_SOAK.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cdc_data_lake_pyspark_spark.session import build_session  # noqa: E402
from cdc_data_lake_pyspark_spark.streaming.multimodal_gate import (  # noqa: E402
    StreamingMultimodalGate,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batch_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 600
    compact_every = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    #: replicate the RECRAWL half rep x under distinct ids — crawl
    #: VOLUME grows rep x while unique content (and so both stores)
    #: stays fixed; the realistic scale axis for a re-crawl-heavy feed
    rep = int(sys.argv[5]) if len(sys.argv) > 5 else 10
    novel_per_batch = max(batch_docs // 20, 50)

    spark = build_session(app_name="multimodal-gate-soak")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    from pyspark.sql import Window

    pool = (
        docs.join(emb, docs["doc_id"] == emb["vec_id"])
        .filter(F.col("text").isNotNull())
        .select(
            (
                F.row_number().over(Window.orderBy("doc_id")) - 1
            ).alias("idx"),
            "text",
            "embedding",
        )
        .localCheckpoint()
    )
    n_pool = pool.count()
    n_a = batch_docs // 2  # the recrawled content pool
    q = batch_docs // 4  # paraphrase donors per batch
    need = n_a + n_batches * (q + novel_per_batch)
    assert n_pool >= need, (
        f"pool has {n_pool} rows, fixture needs {need} — lower "
        "n_batches/batch_docs or use a larger sf_dir"
    )
    a_pool = pool.filter(F.col("idx") < n_a).localCheckpoint()

    work = tempfile.mkdtemp(prefix="mm_gate_soak_")
    text_dir, vec_dir = f"{work}/text", f"{work}/vec"
    gate = StreamingMultimodalGate(
        text_dir, vec_dir, text_threshold=0.8, vec_threshold=0.9, n_probe=4
    )
    # empty-store bootstrap (docs=None): only the quantizer prefit is
    # written — the vector gate needs its fixed model up front, while
    # batch 0 seeds both data stores through the gate's own appends
    gate.bootstrap(
        fit_vectors=pool.select(F.col("idx").alias("vec_id"), "embedding"),
        n_clusters=16,
    )

    def batch_frame(b: int):
        off = (b + 1) * 10_000_000
        recrawl = a_pool.crossJoin(
            spark.range(rep).select(F.col("id").alias("_r"))
        ).select(
            (F.col("idx") + F.col("_r") * 10_000 + off).alias("doc_id"),
            "text",
            "embedding",
        )
        b_lo = n_a + b * q
        donors = pool.filter(
            (F.col("idx") >= b_lo) & (F.col("idx") < b_lo + q)
        ).select((F.col("idx") - b_lo).alias("j"), "text")
        paraphrase = donors.join(
            a_pool.select(F.col("idx").alias("aj"), "embedding"),
            donors["j"] % n_a == F.col("aj"),
        ).select(
            (F.col("j") + 1_000_000 + off).alias("doc_id"),
            "text",
            "embedding",
        )
        c_lo = n_a + n_batches * q + b * novel_per_batch
        novel = pool.filter(
            (F.col("idx") >= c_lo)
            & (F.col("idx") < c_lo + novel_per_batch)
        ).select(
            (F.col("idx") + 2_000_000 + off).alias("doc_id"),
            "text",
            "embedding",
        )
        return recrawl.unionByName(paraphrase).unionByName(novel)

    walls, files_curve = [], []
    for b in range(n_batches):
        frame = batch_frame(b).localCheckpoint()
        n_in = frame.count()
        t0 = time.time()
        gate.process_batch(frame, batch_id=b)
        wall = round(time.time() - t0, 2)
        if compact_every and b > 0 and b % compact_every == 0:
            gate.compact(spark)
        tkept = (
            gate.text_kept_docs(spark)
            .filter(F.col("batch_id") == b)
            .count()
        )
        kept = (
            gate.kept_docs(spark).filter(F.col("batch_id") == b).count()
        )
        n_files = {
            label: sum(
                1
                for _, _, fs in os.walk(d)
                for f in fs
                if f.endswith(".parquet")
            )
            for label, d in (
                ("sig", f"{text_dir}/signatures"),
                ("bucket", f"{text_dir}/buckets"),
                ("encoded", f"{vec_dir}/encoded"),
            )
        }
        walls.append(wall)
        files_curve.append(n_files)
        row = {
            "batch": b,
            "wall_sec": wall,
            "rows_in": n_in,
            "text_drops": n_in - tkept,
            "vec_drops": tkept - kept,
            "kept": kept,
            **{f"{k}_files": v for k, v in n_files.items()},
        }
        print(json.dumps(row), flush=True)
        # non-degeneracy: every post-seed batch exercises BOTH stages
        # and still keeps its novel slice
        if b > 0:
            assert row["text_drops"] > 0, row
            assert row["vec_drops"] > 0, row
            assert row["kept"] > 0, row
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = {
        "sf_dir": sf_dir,
        "n_batches": n_batches,
        "batch_docs": batch_docs,
        "novel_per_batch": novel_per_batch,
        "compact_every": compact_every,
        "walls": walls,
        "files": files_curve,
        "first3_mean": round(sum(walls[1:4]) / 3, 2),
        "last3_mean": round(sum(walls[-3:]) / 3, 2),
    }
    with open(os.path.join(repo, "MULTIMODAL_GATE_SOAK.json"), "w") as f:
        json.dump(out, f, indent=1)
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"metric": "multimodal_gate_soak", "n": n_batches}))


if __name__ == "__main__":
    main()
