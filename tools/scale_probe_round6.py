"""10x scale probe for the round-6 operator families (SCD2 / event
analytics / profiling / Gopher gate / PQ search).

Blowup shapes are chosen so the probe scales the dimension that grows in
production, not an artifact of the synthesis:

 - events: KEYS multiply 10x (user_id*10+r) while per-key depth stays
   constant — how an event stream actually grows.  Event ids re-keyed for
   uniqueness, timestamps untouched.
 - documents: 10 replicas with per-replica token suffixes (distinct
   counts grow; per-row expressions see 10x rows).
 - orders: keys multiply 10x (o_orderkey*10+r) for the snapshot diff.
 - embeddings: corpus 10x with a deterministic per-replica jitter, while
   the CODEBOOK SIZE and QUERY COUNT stay fixed — the honest ANN scaling
   question is "10x corpus, same index+queries", not "10x everything".

Prints one JSON line {probe: {"sf0.1": s, "x10": s, "ratio": r}, ...};
warm second runs, caches released between runs.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
PROBE_DIR = "/tmp/cdis_round6_probe"

REGISTRY_PROBES = [
    "scd2_user_history",
    "scd2_incremental_apply",
    "scd2_asof_enrich",
    "retention_cohorts_weekly",
    "event_anomaly_zscore",
    "snapshot_diff_orders",
    "profile_documents",
    "gopher_quality_gate",
]


def build_probe_tables(spark) -> None:
    from pyspark.sql import functions as F

    shutil.rmtree(PROBE_DIR, ignore_errors=True)
    os.makedirs(PROBE_DIR, exist_ok=True)

    ev = spark.read.parquet(f"{BASE}/events.parquet")
    ev10 = ev.withColumn("r", F.explode(F.expr("sequence(0, 9)"))).select(
        (F.col("event_id") * 10 + F.col("r")).alias("event_id"),
        "ts",
        (F.col("user_id") * 10 + F.col("r")).alias("user_id"),
        "event_type", "value", "props",
    )
    ev10.write.mode("overwrite").parquet(f"{PROBE_DIR}/events.parquet")

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    d10 = docs.withColumn("r", F.explode(F.expr("sequence(0, 9)"))).select(
        (F.col("doc_id") * 10 + F.col("r")).alias("doc_id"),
        F.expr(
            "CASE WHEN r = 0 THEN text ELSE array_join(transform("
            "split(text, ' '), t -> concat(t, '_', CAST(r AS STRING))), ' ')"
            " END"
        ).alias("text"),
        *[c for c in docs.columns if c not in ("doc_id", "text")],
    )
    d10.write.mode("overwrite").parquet(f"{PROBE_DIR}/documents.parquet")

    od = spark.read.parquet(f"{BASE}/orders.parquet")
    o10 = od.withColumn("r", F.explode(F.expr("sequence(0, 9)"))).select(
        (F.col("o_orderkey") * 10 + F.col("r")).alias("o_orderkey"),
        *[c for c in od.columns if c != "o_orderkey"],
    )
    o10.write.mode("overwrite").parquet(f"{PROBE_DIR}/orders.parquet")

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    e10 = emb.withColumn("r", F.explode(F.expr("sequence(0, 9)"))).select(
        (F.col("vec_id") * 10 + F.col("r")).alias("vec_id"),
        F.expr(
            "transform(embedding, x -> x + CAST(r AS DOUBLE) * 0.0001)"
        ).alias("embedding"),
        "label",
    )
    e10.write.mode("overwrite").parquet(f"{PROBE_DIR}/embeddings.parquet")


def pq_probe(spark, sf_dir: str, corpus_mod: int) -> None:
    """Fixed codebook size (~100 centroids/subspace) and fixed ~20-query
    set regardless of corpus size; only the corpus scan grows."""
    from pyspark.sql import functions as F

    from confluent_data_ingestion_spark.operators.similarity import (
        pq_encode, pq_topk, pq_train_codebooks,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    init = emb.filter(F.col("vec_id") % corpus_mod == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    books = pq_train_codebooks(emb, init, dim=64, m=4, refine_iters=1)
    codes = pq_encode(emb, books, dim=64, m=4)
    q = emb.filter(F.col("vec_id") % (corpus_mod * 5) == 0)
    pq_topk(codes, q, books, dim=64, m=4, k=5).write.format("noop").mode(
        "overwrite"
    ).save()


def semantic_decontam_probe(spark, sf_dir: str, eval_mod: int) -> None:
    """FIXED ~50-vector eval set regardless of corpus size (eval_mod
    scales with the table's id blowup); only the broadcast-scored corpus
    scan grows — the honest decontamination scaling question.  The
    registry row's %10 eval filter would grow the eval side 10x in the
    blown-up table (quadratic work), which probes the data synthesis,
    not the operator."""
    from pyspark.sql import functions as F

    from confluent_data_ingestion_spark.operators.decontam import (
        semantic_contamination,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ev = emb.filter(F.col("vec_id") % eval_mod == 0)
    train = emb.filter(F.col("vec_id") % eval_mod != 0)
    semantic_contamination(train, ev, threshold=0.3).write.format(
        "noop"
    ).mode("overwrite").save()


def main() -> None:
    from confluent_data_ingestion_spark.caching import release_caches
    from confluent_data_ingestion_spark.queries import QUERIES as REGISTRY
    from confluent_data_ingestion_spark.session import get_spark

    spark = get_spark("cdis-round6-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build_probe_tables(spark)
    # the probe dir only rewrites the four blown-up tables; registry
    # queries that touch other tables read them from BASE via symlinks
    for name in os.listdir(BASE):
        dst = os.path.join(PROBE_DIR, name)
        if not os.path.exists(dst):
            os.symlink(os.path.join(BASE, name), dst)

    def run(fn) -> float:
        best = None
        for _ in range(2):  # warm second run
            t0 = time.perf_counter()
            fn()
            release_caches()
            best = time.perf_counter() - t0
        return round(best, 3)

    out = {}
    for name in REGISTRY_PROBES:
        base_s = run(lambda: REGISTRY[name](spark, BASE)
                     .write.format("noop").mode("overwrite").save())
        big_s = run(lambda: REGISTRY[name](spark, PROBE_DIR)
                    .write.format("noop").mode("overwrite").save())
        out[name] = {"sf0.1": base_s, "x10": big_s,
                     "ratio": round(big_s / base_s, 2)}
        print(f"# {name}: {base_s}s -> {big_s}s ({out[name]['ratio']}x)",
              file=sys.stderr)
    base_s = run(lambda: pq_probe(spark, BASE, 20))
    big_s = run(lambda: pq_probe(spark, PROBE_DIR, 200))
    out["pq_topk_fixed_queries"] = {
        "sf0.1": base_s, "x10": big_s, "ratio": round(big_s / base_s, 2)
    }
    print(f"# pq_topk_fixed_queries: {base_s}s -> {big_s}s "
          f"({out['pq_topk_fixed_queries']['ratio']}x)", file=sys.stderr)
    base_s = run(lambda: semantic_decontam_probe(spark, BASE, 100))
    big_s = run(lambda: semantic_decontam_probe(spark, PROBE_DIR, 1000))
    out["semantic_decontam_fixed_eval"] = {
        "sf0.1": base_s, "x10": big_s, "ratio": round(big_s / base_s, 2)
    }
    print(f"# semantic_decontam_fixed_eval: {base_s}s -> {big_s}s "
          f"({out['semantic_decontam_fixed_eval']['ratio']}x)",
          file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
