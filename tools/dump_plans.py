"""Dump .explain("formatted") output for registry rows to files.

Usage:
  python tools/dump_plans.py --only a,b,c --suffix before [--out-dir plans/r17]
                              [--sf-dir DIR]

Writes <out-dir>/<query>_<suffix>.txt for each row. Queries that run
imperative multi-job pipelines (streaming foreachBatch, iterative
algorithms) still expose the plan of the FINAL returned DataFrame, which
is what this captures; the shape of intermediate jobs is audited in
PLAN_AUDIT.md instead.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--out-dir", default="plans/r17")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    names = [n.strip() for n in args.only.split(",") if n.strip()]

    from confluent_data_ingestion_spark.caching import release_caches
    from confluent_data_ingestion_spark.queries import QUERIES
    from confluent_data_ingestion_spark.session import get_spark

    os.makedirs(args.out_dir, exist_ok=True)
    spark = get_spark("cdis-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    for name in names:
        df = QUERIES[name](spark, args.sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        release_caches()
        n_ex = txt.count("Exchange")
        joins = {
            k: txt.count(k)
            for k in (
                "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                "BroadcastNestedLoopJoin", "CartesianProduct",
            )
            if txt.count(k)
        }
        py = {
            k: txt.count(k)
            for k in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                      "MapInArrow")
            if txt.count(k)
        }
        print(f"{name}: Exchange={n_ex} joins={joins} python={py} -> {path}",
              flush=True)


if __name__ == "__main__":
    main()
