"""Oracle-resolution robustness (ADVICE r4).

* A failing callable oracle generator must omit ONLY its own entry — the
  other 68 oracles still resolve (the driver then records a rows-only
  check for the broken one instead of losing everything).
* Seeded replays (IVF centroids) read the corpus the queries actually ran
  against, with the env override taking precedence.
* The exact value-check of the seeded LSH/IVF oracles is only sound when
  no vector sits on a decision boundary within float round-off; pin that
  the driver corpus has comfortable margins.
"""

import os

import numpy as np
import pytest

from cdc_data_lake_pyspark_spark import queries as q
from cdc_data_lake_pyspark_spark.queries_phase2 import _oracle_sf_dir

SF001 = "/root/testdata/sf0.01"


def test_failing_callable_oracle_is_isolated(monkeypatch):
    q._load_phase2()
    n_before = len(q.oracle_sql())

    def boom():
        raise RuntimeError("generator dependency unavailable")

    monkeypatch.setitem(q.ORACLES, "___broken_entry", boom)
    with pytest.warns(UserWarning, match="___broken_entry"):
        resolved = q.oracle_sql()
    assert "___broken_entry" not in resolved
    assert len(resolved) == n_before  # every other oracle still resolves
    assert "similarity_ivf" in resolved


def test_oracle_sf_dir_precedence(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", "/env/dir")
    monkeypatch.setattr(q, "LAST_SF_DIR", [None])
    assert _oracle_sf_dir() == "/env/dir"
    monkeypatch.delenv("SPARK_GRAFT_ORACLE_SF_DIR")
    monkeypatch.setattr(q, "LAST_SF_DIR", ["/last/run/dir"])
    assert _oracle_sf_dir() == "/last/run/dir"
    monkeypatch.setattr(q, "LAST_SF_DIR", [None])
    assert _oracle_sf_dir() == SF001


def test_queries_record_last_sf_dir(spark, monkeypatch):
    monkeypatch.setattr(q, "LAST_SF_DIR", [None])
    q._t(spark, SF001, "region").count()
    assert q.LAST_SF_DIR[0] == SF001


@pytest.mark.skipif(not os.path.exists(SF001), reason="driver testdata absent")
def test_ivf_assignment_margins():
    """No embedding sits near a centroid-distance tie, so sequential
    (DuckDB) vs BLAS (Spark) summation cannot flip a cell assignment."""
    import duckdb

    from cdc_data_lake_pyspark_spark.operators.similarity import fit_kmeans

    pdf = duckdb.sql(
        f"SELECT embedding FROM '{SF001}/embeddings.parquet' "
        "ORDER BY vec_id LIMIT 200000"
    ).df()
    X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    centers = fit_kmeans(X, 16, seed=42)
    d = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    d.sort(axis=1)
    margin = (d[:, 1] - d[:, 0]).min()
    assert margin > 1e-6, f"near-tied centroid assignment (margin={margin})"


@pytest.mark.skipif(not os.path.exists(SF001), reason="driver testdata absent")
def test_hyperplane_projection_margins():
    """No embedding projects onto a seeded hyperplane within float
    round-off, so a bucket bit cannot flip between engines."""
    import duckdb

    from cdc_data_lake_pyspark_spark.operators.similarity import make_hyperplanes

    pdf = duckdb.sql(f"SELECT embedding FROM '{SF001}/embeddings.parquet'").df()
    X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    min_abs = np.inf
    for t in range(12):  # covers both the 8-table ANN and 12-table pair seeds
        H = np.array(make_hyperplanes(64, 6, seed=42 + 1000 * t), dtype=np.float64)
        proj = np.abs(X @ H.T)
        min_abs = min(min_abs, proj.min())
    assert min_abs > 1e-9, f"near-boundary projection (|dot|={min_abs})"
