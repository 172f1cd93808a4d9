"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and the matching ``oracle_sql()``
on DuckDB over the same parquet tables, then compares row count, column
names/types, and order-insensitive values.  Usage::

    python tools/check_oracles.py [--window] [sf_dir] [query ...]

``--window`` restricts the run to the FIRST 50 registry entries in
registry order — exactly the slice the external driver samples.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def normalize(df):
    """Sort columns by name, canonicalize values, sort rows."""
    import math

    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    row.append(repr(v))
            elif v is None:
                row.append("NULL")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    rows.sort()
    return cols, rows


def main():
    argv = [a for a in sys.argv[1:]]
    window = "--window" in argv
    if window:  # replicate EXACTLY the driver's view: first 50 entries
        argv.remove("--window")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    # seeded oracles (LSH planes, k-means centroids, PQ codebooks) re-fit
    # on the checked corpus; the oracle_sql() dict is built eagerly before
    # any Spark query runs, so pin the dir explicitly rather than relying
    # on LAST_SF_DIR (unset in a fresh process -> silently sf0.01)
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)

    from cdc_data_lake_pyspark_spark.session import build_session
    from cdc_data_lake_pyspark_spark import queries as q

    spark = build_session(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    names = (
        list(q.queries())[:50] if window else sorted(q.queries())
    )
    failures = []
    for name in names:
        if only and name not in only:
            continue
        fn = q.queries()[name]
        sql = q.oracle_sql().get(name)
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        t1 = time.time()
        if sql is None:
            print(f"ROWS-ONLY {name}: {len(spark_pdf)} rows ({t1 - t0:.1f}s)")
            continue
        try:
            duck_pdf = con.sql(sql).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        sc, sr = normalize(spark_pdf)
        dc, dr = normalize(duck_pdf)
        status = "OK"
        detail = ""
        if sc != dc:
            status, detail = "FAIL", f"columns {sc} vs {dc}"
        elif len(sr) != len(dr):
            status, detail = "FAIL", f"rows {len(sr)} vs {len(dr)}"
        elif sr != dr:
            status = "FAIL"
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            detail = f"value mismatch, first diffs: {diffs}"
        if status == "FAIL":
            failures.append(name)
        print(f"{status} {name}: {len(sr)} rows ({t1 - t0:.1f}s) {detail}")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all oracle pairs match")


if __name__ == "__main__":
    main()
