"""A/B measurement harness for individual registry rows.

Replicates bench.py's methodology (same session factory, same warmups,
noop sink, release_caches inside the timing, artifact-family eviction
between runs) on a SUBSET of queries, with N runs each, reporting every
reading plus the min — so a single optimization can be measured without
paying for the whole 196-row suite.

Usage:
  python tools/bench_subset.py --only a,b,c [--runs 3] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    names = [n.strip() for n in args.only.split(",") if n.strip()]

    from bench import warm_session
    from confluent_data_ingestion_spark.caching import release_caches
    from confluent_data_ingestion_spark.queries import (
        QUERIES,
        artifact_family_keys,
        release_artifact_families,
    )
    from confluent_data_ingestion_spark.session import get_spark

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("cdis-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    warm_session(spark, args.sf_dir)

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        readings = []
        for i in range(args.runs):
            fams_before = artifact_family_keys()
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            release_caches()
            readings.append(round(time.perf_counter() - t0, 3))
            built = [
                fam for fam, keys in artifact_family_keys().items()
                if keys - fams_before[fam]
            ]
            if built:
                release_artifact_families(built)
        out[name] = {"runs": readings, "min": min(readings)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"total_min": round(sum(v["min"] for v in out.values()), 3)}))


if __name__ == "__main__":
    main()
