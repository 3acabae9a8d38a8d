"""sf1-equivalent scale probe for the dedup family.

The per-round probes stop at sf0.1, where fixed costs dominate; this tool
synthesizes a 10x blowup of sf0.1's ``documents`` (sf1-equivalent row
count) with CONTROLLED duplicate structure and measures the heaviest dedup
queries against both corpora.

Blowup design (the round-3 "perturbed replicas" method, extended):
 - Each document explodes into 10 replicas, ``doc_id' = doc_id*10 + r``.
 - Replica tokens are suffixed ``_<r>`` so replicas are NOT near-dups of
   each other: the original within-corpus duplicate/near-dup RATE is
   preserved per replica (clusters multiply 10x in count, not in size) —
   the honest linear-scaling shape.  A naive 10x copy would instead grow
   every cluster 10x and any pairing probe quadratically by construction.
 - A controlled 5 pct of replicas (hash-chosen, r > 0) keep the BASE text
   verbatim: bounded cross-replica exact-duplicate clusters (size <= 10).
 - A fixed 12-token boilerplate tail is appended to a hash-chosen 10 pct
   of ALL replicas (unsuffixed, so it is shared corpus-wide): at 10x this
   makes its shingles exceed the frequency caps — the skew path the caps
   exist for is actually exercised, not just unit-tested.

Usage: python tools/scale_probe_dedup.py [--reps N]
Prints one JSON line: {query: {"sf0.1": s, "sf1eq": s, "ratio": r}, ...}
(each timing is the warm second run; caches released between runs).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
PROBE_DIR = "/tmp/cdis_sf1eq_probe"

QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_lsh_verified",
    "dedup_minhash_lsh",
    "dedup_apply_pipeline",
    "dedup_clusters",
    "dedup_keep_best_quality",
    "dedup_incremental",
]

BOILERPLATE = (
    "all rights reserved terms of service privacy policy cookie "
    "settings subscribe newsletter contact"
)


def build_probe_corpus(spark) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    reps = docs.withColumn("r", F.explode(F.expr("sequence(0, 9)")))
    blown = reps.select(
        (F.col("doc_id") * 10 + F.col("r")).alias("doc_id"),
        F.expr(
            # 5 pct of r>0 replicas stay verbatim: controlled exact dups
            "CASE WHEN r > 0 AND pmod(hash(doc_id, r), 100) < 5 THEN text "
            "ELSE array_join(transform(split(text, ' '), "
            "t -> concat(t, '_', CAST(r AS STRING))), ' ') END"
        ).alias("text"),
        *[c for c in docs.columns if c not in ("doc_id", "text")],
    ).withColumn(
        "text",
        F.expr(
            f"CASE WHEN pmod(hash(doc_id, 7), 10) = 0 "
            f"THEN concat(text, ' ', '{BOILERPLATE}') ELSE text END"
        ),
    )
    shutil.rmtree(PROBE_DIR, ignore_errors=True)
    os.makedirs(PROBE_DIR, exist_ok=True)
    blown.write.mode("overwrite").parquet(f"{PROBE_DIR}/documents.parquet")


def main() -> None:
    from confluent_data_ingestion_spark.caching import release_caches
    from confluent_data_ingestion_spark.queries import QUERIES as REGISTRY
    from confluent_data_ingestion_spark.session import get_spark

    spark = get_spark("cdis-sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build_probe_corpus(spark)

    def run(name: str, sf_dir: str) -> float:
        best = None
        for _ in range(2):  # warm second run
            t0 = time.perf_counter()
            REGISTRY[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            release_caches()
            best = time.perf_counter() - t0
        return round(best, 3)

    out = {}
    for name in QUERIES:
        base_s = run(name, BASE)
        big_s = run(name, PROBE_DIR)
        out[name] = {
            "sf0.1": base_s,
            "sf1eq": big_s,
            "ratio": round(big_s / base_s, 2),
        }
        print(f"# {name}: {base_s}s -> {big_s}s ({out[name]['ratio']}x)",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
