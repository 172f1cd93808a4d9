"""Dump ``explain("formatted")`` for named registry queries to files.

Usage::

    python tools/dump_plan.py OUT_DIR SUFFIX query [query ...]

Writes ``OUT_DIR/<query>_<SUFFIX>.txt`` for each query — the plan
evidence files the optimization rounds commit under ``plans/rNN/``.
Plans are built at sf0.001 (plan SHAPE is scale-invariant; building at
the smallest SF keeps the dump fast) unless ``$SPARK_GRAFT_SF_DIR``
says otherwise.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(out_dir, exist_ok=True)
    from cdc_data_lake_pyspark_spark.session import build_session
    from cdc_data_lake_pyspark_spark import queries as q

    spark = build_session(app_name="dump_plan")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    for name in names:
        df = registry[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
