"""UniqueKeyMonitor depth probe (round-17, VERDICT r16 task 1): measure
what the r15/r16 rounds asserted but never quantified —

1. snapshot() wall and keys-dir footprint vs BATCH COUNT (50, 150, 500
   batches): the per-batch ``keys/batch_id=N`` parquet-dir layout means
   snapshot read fan-out grows with dirs, not digest bytes — exactly
   the many-small-objects shape that degrades on object storage.  Each
   arm is measured uncompacted, then after ``compact(keep_last=16)``,
   so the table shows what compaction buys.

2. digest-set footprint vs KEY CARDINALITY at x10/x100 (1e4 -> 1e5 ->
   1e6 distinct keys, fixed 20 batches): the "state = distinct keys x
   32 B" claim as bytes-on-disk per key and the snapshot's
   count-distinct wall per decade (d1 = x10/x1/10, d2 = x100/x10/10;
   0.1 = scale-free, 1.0 = linear).

Batches are applied directly through the foreachBatch contract
(``mon.apply(batch_df, batch_id)``) — the streaming runner adds only
trigger latency around the identical plan.  Timings are min-of-2 on a
shared host.  Prints one JSON line.

Usage: python tools/scale_probe_unique_monitor.py [--batches 50,150,500]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dir_stats(root: str) -> dict:
    n_dirs = n_files = n_bytes = 0
    for cur, dirs, files in os.walk(root):
        if os.path.basename(cur).startswith("batch_id="):
            n_dirs += 1
        for f in files:
            if f.endswith(".parquet"):
                n_files += 1
                n_bytes += os.path.getsize(os.path.join(cur, f))
    return {"dirs": n_dirs, "files": n_files, "mb": round(n_bytes / 1e6, 2)}


def timed(fn) -> float:
    best = None
    for _ in range(2):  # min-of-2: shared-host noise protocol
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    from pyspark.sql import functions as F

    from confluent_data_ingestion_spark.session import get_spark
    from confluent_data_ingestion_spark.streaming.contracts import (
        UniqueKeyMonitor,
    )

    batch_counts = [50, 150, 500]
    for i, a in enumerate(sys.argv):
        if a == "--batches":
            batch_counts = [int(x) for x in sys.argv[i + 1].split(",")]

    spark = get_spark("cdis-ukm-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"fanout": {}, "cardinality": {}}

    # -- probe 1: snapshot cost vs batch count (fixed 200 rows/batch) --
    for nb in batch_counts:
        path = tempfile.mkdtemp(prefix=f"cdis-ukm-probe-{nb}-")
        mon = UniqueKeyMonitor(path, ["k"])
        t0 = time.perf_counter()
        for b in range(nb):
            batch = spark.range(b * 200, (b + 1) * 200).select(
                (F.col("id") % (nb * 150)).cast("string").alias("k")
            )
            mon.apply(batch, b)
        apply_sec = round(time.perf_counter() - t0, 3)
        keys_dir = os.path.join(path, "keys")
        row = {
            "apply_total_sec": apply_sec,
            "pre": dir_stats(keys_dir),
            "snap_pre_sec": timed(lambda: mon.snapshot(spark).collect()),
        }
        t0 = time.perf_counter()
        folded = mon.compact(spark, keep_last=16)
        row["compact_sec"] = round(time.perf_counter() - t0, 3)
        row["folded"] = folded["folded"]
        row["post"] = dir_stats(keys_dir)
        row["snap_post_sec"] = timed(lambda: mon.snapshot(spark).collect())
        out["fanout"][str(nb)] = row
        print(f"# fanout {nb}: {row}", file=sys.stderr)
        shutil.rmtree(path, ignore_errors=True)

    # -- probe 2: digest-set footprint vs key cardinality (20 batches) --
    for label, nkeys in (("x1", 10_000), ("x10", 100_000),
                         ("x100", 1_000_000)):
        path = tempfile.mkdtemp(prefix=f"cdis-ukm-card-{label}-")
        mon = UniqueKeyMonitor(path, ["k"])
        per = nkeys // 20
        for b in range(20):
            # 10 pct cross-batch duplicates so distinct < delivered
            batch = spark.range(b * per, (b + 1) * per).select(
                F.when(F.col("id") % 10 == 0, F.lit(0))
                .otherwise(F.col("id")).cast("string").alias("k")
            )
            mon.apply(batch, b)
        st = dir_stats(os.path.join(path, "keys"))
        distinct = nkeys - nkeys // 10 + 1
        row = {
            "distinct_keys": distinct,
            "keys_mb": st["mb"],
            "bytes_per_key": round(st["mb"] * 1e6 / distinct, 1),
            "snap_sec": timed(lambda: mon.snapshot(spark).collect()),
        }
        out["cardinality"][label] = row
        print(f"# cardinality {label}: {row}", file=sys.stderr)
        shutil.rmtree(path, ignore_errors=True)
    c = out["cardinality"]
    c["d1"] = round(c["x10"]["snap_sec"] / c["x1"]["snap_sec"] / 10, 3)
    c["d2"] = round(c["x100"]["snap_sec"] / c["x10"]["snap_sec"] / 10, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
