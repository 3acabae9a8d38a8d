"""Core-ratio probe at synthetic x10 scale (VERDICT r17 item 8).

At sf0.1 the suite saturates at 8 cores (r17: median 8c/32c ratio 0.99)
— every row is stage-overhead/driver bound, so the driver's core-ratio
comparison cannot show parallelism.  This probe re-asks the question at
the scale where it is answerable: a x10 blowup of the tables the heavy
rows read (the honest shapes from scale_probe_100x: perturbed document
replicas, key-multiplied events, jittered embedding replicas,
FK-consistent fact replicas; dims fixed), with the REGISTRY functions
run unmodified against the blown dir.

Run it once per core count (the master comes from $SPARK_GRAFT_CPUS,
exactly like bench.py):

  SPARK_GRAFT_CPUS=32 python tools/scale_probe_cores.py
  SPARK_GRAFT_CPUS=8  python tools/scale_probe_cores.py

Each invocation prints one JSON line {row: min_sec} (min of --runs,
warm session, noop sink, caches released inside the timing — bench.py
methodology).  The 8c/32c ratio per row goes to SCALE.md.

The blowup is built once under /tmp and reused by the second
invocation (building it inside the timed region would measure the
blowup, not the operator).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASE = "/root/testdata/sf0.1"
OUT_TMPL = "/tmp/cdis_cores_probe_x{reps}"

# the heavy non-streaming rows (streaming's floor is microbatch
# machinery — measured and closed in OPTIMIZATION_r18.md §8; the bitext
# rows guard their oracle parity with an SF-pinned LSH width assertion
# and deliberately refuse to run off-SF, so they cannot be probed)
ROWS = [
    "connected_components_chain",
    "dedup_ngram_jaccard",
    "dedup_containment_verified",
    "dedup_containment_excerpts",
    "dedup_allpairs_prefix",
    "similarity_pq_topk",
    "rollup_quantile_events",
    "bloom_semijoin_revenue",
    "bm25_incremental_index",
    "salted_join_hotkey",
]

FIXED_TABLES = ("customer", "nation", "region", "part", "supplier")


def ensure_blowup(spark, reps: int) -> str:
    import scale_probe_100x as p

    out = OUT_TMPL.format(reps=reps)
    marker = os.path.join(out, f".complete-x{reps}")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    p.blow_documents(spark, reps, out)
    p.blow_events(spark, reps, out)
    p.blow_embeddings(spark, reps, out)
    p.blow_lineitem_orders(spark, reps, out)
    for t in FIXED_TABLES:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    rows = [r.strip() for r in (args.only or ",".join(ROWS)).split(",")]

    from bench import warm_session
    from confluent_data_ingestion_spark.caching import release_caches
    from confluent_data_ingestion_spark.queries import (
        QUERIES,
        artifact_family_keys,
        release_artifact_families,
    )
    from confluent_data_ingestion_spark.session import get_spark

    spark = get_spark("cdis-cores-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = ensure_blowup(spark, args.reps)
    warm_session(spark, BASE)

    out: dict[str, float] = {}
    for name in rows:
        fn = QUERIES[name]
        readings = []
        for _ in range(args.runs):
            fams_before = artifact_family_keys()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            release_caches()
            readings.append(round(time.perf_counter() - t0, 3))
            built = [
                fam for fam, keys in artifact_family_keys().items()
                if keys - fams_before[fam]
            ]
            if built:  # builder rows pay build+query every run (bench contract)
                release_artifact_families(built)
        out[name] = min(readings)
        print(f"# {name}: {readings}", file=sys.stderr)
    print(json.dumps({
        "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
        "reps": args.reps,
        "rows": out,
    }))


if __name__ == "__main__":
    main()
