"""Incremental rollup store: snapshot == one-shot aggregation of all data
seen so far (at every quiescence point), idempotent replay, crash safety
of the pointer flip, HLL distinct within error."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from confluent_data_ingestion_spark.streaming.rollup import RollupStore


def _batches(spark):
    return [
        spark.createDataFrame(
            [Row(g="a", v=1.5, u=1), Row(g="a", v=2.0, u=2), Row(g="b", v=3.0, u=1)]
        ),
        spark.createDataFrame(
            [Row(g="a", v=-1.0, u=2), Row(g="c", v=0.25, u=7)]
        ),
        spark.createDataFrame(
            [Row(g="b", v=10.0, u=9), Row(g="b", v=0.5, u=1), Row(g="a", v=4.0, u=3)]
        ),
    ]


def _oneshot(df):
    return {
        r["g"]: (r["n"], round(r["s"], 6), r["lo"], r["hi"], r["d"])
        for r in df.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(28,6)")).cast("double").alias("s"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.countDistinct("u").alias("d"),
        )
        .collect()
    }


def test_incremental_equals_oneshot_at_each_quiescence(spark, tmp_path):
    store = RollupStore(
        str(tmp_path / "r"), ["g"],
        sum_cols=["v"], min_cols=["v"], max_cols=["v"], distinct_cols=["u"],
    )
    batches = _batches(spark)
    seen = None
    for i, b in enumerate(batches):
        assert store.apply(b, batch_id=i)
        seen = b if seen is None else seen.unionByName(b)
        got = {
            r["g"]: (r["n_rows"], round(r["sum_v"], 6), r["min_v"], r["max_v"],
                     r["n_distinct_u"])
            for r in store.snapshot(spark).collect()
        }
        want = _oneshot(seen)
        # exact fields exactly; HLL distinct exact at these cardinalities
        assert got == want


def test_replay_is_noop(spark, tmp_path):
    store = RollupStore(str(tmp_path / "r2"), ["g"], sum_cols=["v"])
    b = _batches(spark)[0]
    assert store.apply(b, batch_id="x")
    before = sorted(map(tuple, store.snapshot(spark).collect()))
    assert not store.apply(b, batch_id="x")  # replay skipped
    assert sorted(map(tuple, store.snapshot(spark).collect())) == before


def test_crash_before_pointer_flip_leaves_old_state(spark, tmp_path, monkeypatch):
    store = RollupStore(str(tmp_path / "r3"), ["g"], sum_cols=["v"])
    store.apply(_batches(spark)[0], batch_id=0)
    good = sorted(map(tuple, store.snapshot(spark).collect()))

    # inject a crash after the state write but before the atomic pointer
    # flip (the flip is now os.replace of a fsynced tmp file)
    import os as _os

    real_replace = _os.replace

    def exploding_replace(src, dst, *a, **kw):
        if str(dst).endswith("_current"):
            raise RuntimeError("crash before pointer flip")
        return real_replace(src, dst, *a, **kw)

    monkeypatch.setattr(_os, "replace", exploding_replace)
    with pytest.raises(RuntimeError, match="pointer flip"):
        store.apply(_batches(spark)[1], batch_id=1)
    monkeypatch.setattr(_os, "replace", real_replace)

    # old state intact, batch 1 not marked committed -> retry applies cleanly
    assert sorted(map(tuple, store.snapshot(spark).collect())) == good
    assert not store.committed(1)
    assert store.apply(_batches(spark)[1], batch_id=1)
    seen = _batches(spark)[0].unionByName(_batches(spark)[1])
    got = {r["g"]: round(r["sum_v"], 6) for r in store.snapshot(spark).collect()}
    want = {
        r["g"]: round(r["s"], 6)
        for r in seen.groupBy("g")
        .agg(F.sum(F.col("v").cast("decimal(28,6)")).cast("double").alias("s"))
        .collect()
    }
    assert got == want


def test_snapshot_before_any_batch_raises(spark, tmp_path):
    store = RollupStore(str(tmp_path / "r4"), ["g"])
    with pytest.raises(FileNotFoundError):
        store.snapshot(spark)


def test_rollup_under_structured_streaming(spark, tmp_path):
    """Drive the store from a real file-source stream via foreachBatch:
    at quiescence the snapshot equals the one-shot aggregation of every
    file the stream consumed (batch/stream parity), regardless of how
    the source split the files into microbatches."""
    import json

    src = tmp_path / "in"
    src.mkdir()
    all_rows = []
    for part in range(3):
        rows = [
            {"g": ["a", "b", "c"][(part + i) % 3], "v": part + i * 0.5}
            for i in range(4)
        ]
        all_rows += rows
        with open(src / f"p{part}.ndjson", "w") as f:
            f.writelines(json.dumps(r) + "\n" for r in rows)

    store = RollupStore(
        str(tmp_path / "state"), ["g"],
        sum_cols=["v"], min_cols=["v"], max_cols=["v"],
    )
    stream = (
        spark.readStream.schema("g STRING, v DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: store.apply(df, batch_id=bid)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r["g"]: (r["n_rows"], round(r["sum_v"], 6), r["min_v"], r["max_v"])
        for r in store.snapshot(spark).collect()
    }
    want = {}
    for r in all_rows:
        n, s, lo, hi = want.get(r["g"], (0, 0.0, None, None))
        want[r["g"]] = (
            n + 1, s + r["v"],
            r["v"] if lo is None else min(lo, r["v"]),
            r["v"] if hi is None else max(hi, r["v"]),
        )
    want = {g: (n, round(s, 6), lo, hi) for g, (n, s, lo, hi) in want.items()}
    assert got == want


def test_hist_and_sample_under_structured_streaming(spark, tmp_path):
    """The round-8 summaries (histogram quantiles + KMV sample) maintained
    from a real file-source stream: at quiescence the snapshot equals the
    one-shot store over all consumed rows."""
    import json

    src = tmp_path / "hs_in"
    src.mkdir()
    all_rows = []
    for part in range(3):
        rows = [{"g": ["a", "b"][i % 2], "v": float(part * 4 + i)}
                for i in range(4)]
        all_rows += rows
        with open(src / f"p{part}.ndjson", "w") as f:
            f.writelines(json.dumps(r) + "\n" for r in rows)

    spec = dict(hist_cols={"v": (0.0, 16.0, 8)}, quantiles=[0.5],
                sample_cols={"v": 3})
    store = RollupStore(str(tmp_path / "hs_state"), ["g"], **spec)
    q = (
        spark.readStream.schema("g STRING, v DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .writeStream.foreachBatch(lambda df, bid: store.apply(df, batch_id=bid))
        .option("checkpointLocation", str(tmp_path / "hs_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    one = RollupStore(str(tmp_path / "hs_one"), ["g"], **spec)
    one.apply(
        spark.createDataFrame([(r["g"], r["v"]) for r in all_rows],
                              "g string, v double"),
        batch_id=0,
    )
    got = {r["g"]: r.asDict() for r in store.snapshot(spark).collect()}
    want = {r["g"]: r.asDict() for r in one.snapshot(spark).collect()}
    assert got == want


def test_windowed_rollup_composes_with_event_time(spark, tmp_path):
    """group_cols are arbitrary — feeding tumbling-window starts as a
    group column turns the store into an incrementally-maintained
    windowed aggregate (the materialized twin of a streaming windowed
    agg), with late rows folding into their window's partials on
    whatever batch they arrive in."""
    store = RollupStore(str(tmp_path / "w"), ["win", "g"], sum_cols=["v"])

    def windowed(rows):
        df = spark.createDataFrame(rows, "ts STRING, g STRING, v DOUBLE")
        return df.select(
            F.window(F.col("ts").cast("timestamp"), "1 hour").start.alias("win"),
            "g", "v",
        )

    store.apply(windowed([
        ("2026-01-01 10:05:00", "a", 1.0),
        ("2026-01-01 10:55:00", "a", 2.0),
        ("2026-01-01 11:05:00", "b", 4.0),
    ]), batch_id=0)
    # batch 1 carries a LATE row for the 10:00 window
    store.apply(windowed([
        ("2026-01-01 11:30:00", "b", 8.0),
        ("2026-01-01 10:59:59", "a", 16.0),
    ]), batch_id=1)

    got = {
        (str(r["win"]), r["g"]): (r["n_rows"], r["sum_v"])
        for r in store.snapshot(spark).collect()
    }
    assert got == {
        ("2026-01-01 10:00:00", "a"): (3, 19.0),
        ("2026-01-01 11:00:00", "b"): (2, 12.0),
    }

def test_crash_after_flip_before_marker_never_double_counts(
    spark, tmp_path, monkeypatch
):
    """The window the old marker-after-write protocol got wrong: a crash
    after the new (batch-included) state goes live but before the marker is
    written.  Additive sum partials are not replay-idempotent, so the batch
    must already read as committed via the pointer record — the foreachBatch
    replay has to be a no-op, not a second fold."""
    store = RollupStore(str(tmp_path / "r4"), ["g"], sum_cols=["v"])
    store.apply(_batches(spark)[0], batch_id=0)

    import builtins

    real_open = builtins.open

    def exploding_open(path, *a, **kw):
        if "_markers" in str(path) and a and a[0] == "w":
            raise RuntimeError("crash before marker write")
        return real_open(path, *a, **kw)

    monkeypatch.setattr(builtins, "open", exploding_open)
    with pytest.raises(RuntimeError, match="marker write"):
        store.apply(_batches(spark)[1], batch_id=1)
    monkeypatch.setattr(builtins, "open", real_open)

    # the new state (including batch 1) is live AND batch 1 reads committed
    assert store.committed(1)
    # replay of batch 1 must be a no-op: the sums already contain it — and
    # the no-op path must BACKFILL the durable marker, because the next
    # commit overwrites the pointer's batch_id slot (the only other record)
    import os as _os

    assert not _os.path.exists(store._marker(1))
    assert not store.apply(_batches(spark)[1], batch_id=1)
    assert _os.path.exists(store._marker(1))
    seen = _batches(spark)[0].unionByName(_batches(spark)[1])
    got = {r["g"]: round(r["sum_v"], 6) for r in store.snapshot(spark).collect()}
    want = {
        r["g"]: round(r["s"], 6)
        for r in seen.groupBy("g")
        .agg(F.sum(F.col("v").cast("decimal(28,6)")).cast("double").alias("s"))
        .collect()
    }
    assert got == want
    # a LATER batch still commits normally (overwriting the pointer's
    # batch_id slot) and batch 1's commit history survives via the
    # backfilled marker — a replay of batch 1 NOW is still a no-op
    assert store.apply(_batches(spark)[2], batch_id=2)
    assert store.committed(1)
    assert not store.apply(_batches(spark)[1], batch_id=1)
    seen = seen.unionByName(_batches(spark)[2])
    got = {r["g"]: round(r["sum_v"], 6) for r in store.snapshot(spark).collect()}
    want = {
        r["g"]: round(r["s"], 6)
        for r in seen.groupBy("g")
        .agg(F.sum(F.col("v").cast("decimal(28,6)")).cast("double").alias("s"))
        .collect()
    }
    assert got == want


def test_hist_quantiles_incremental_equals_oneshot(spark, tmp_path):
    """Histogram-quantile partials merge exactly: folding batches one at a
    time yields bin-identical state to one-shot aggregation, so the
    interpolated p50/p90 match a direct computation of the same histogram
    estimate over all data; estimates sit within one bin width of the
    true quantiles."""
    import numpy as np

    rows = [
        Row(g="a", v=float(x))
        for x in [1, 3, 5, 7, 9, 11, 13, 15, 17, 19]
    ] + [Row(g="b", v=float(x)) for x in [2, 4, 6, 100, -5]] + [
        Row(g="b", v=None)  # NULLs counted in n_rows, never binned
    ]
    store = RollupStore(
        str(tmp_path / "q1"), ["g"],
        hist_cols={"v": (0.0, 16.0, 8)},  # width exactly 2.0
        quantiles=[0.5, 0.9],
    )
    # three uneven folds
    chunks = [rows[:4], rows[4:11], rows[11:]]
    for i, ch in enumerate(chunks):
        store.apply(spark.createDataFrame(ch, "g string, v double"), batch_id=i)
    snap = {r["g"]: r.asDict() for r in store.snapshot(spark).collect()}

    one = RollupStore(
        str(tmp_path / "q2"), ["g"],
        hist_cols={"v": (0.0, 16.0, 8)}, quantiles=[0.5, 0.9],
    )
    one.apply(spark.createDataFrame(rows, "g string, v double"), batch_id=0)
    assert snap == {r["g"]: r.asDict() for r in one.snapshot(spark).collect()}

    assert snap["a"]["n_rows"] == 10 and snap["b"]["n_rows"] == 6
    # within one bin width (2.0) of numpy's exact quantiles for interior data
    a_vals = [1, 3, 5, 7, 9, 11, 13, 15]  # 17, 19 overflow the bounds
    assert abs(snap["a"]["p50_v"] - np.quantile(range(1, 20, 2), 0.5)) <= 2.0
    # overflow/underflow answer the bounds
    big = RollupStore(
        str(tmp_path / "q3"), ["g"], hist_cols={"v": (0.0, 16.0, 8)},
        quantiles=[0.9],
    )
    big.apply(
        spark.createDataFrame([Row(g="x", v=999.0)] * 5, "g string, v double"),
        batch_id=0,
    )
    assert big.snapshot(spark).collect()[0]["p90_v"] == 16.0
    del a_vals


def test_hist_quantiles_all_null_group_is_null(spark, tmp_path):
    store = RollupStore(
        str(tmp_path / "qn"), ["g"], hist_cols={"v": (0.0, 8.0, 4)},
    )
    store.apply(
        spark.createDataFrame(
            [Row(g="z", v=None), Row(g="z", v=None)], "g string, v double"
        ),
        batch_id=0,
    )
    row = store.snapshot(spark).collect()[0]
    assert row["n_rows"] == 2 and row["p50_v"] is None


def test_kmv_sample_incremental_equals_oneshot(spark, tmp_path):
    """Bottom-k sample state is merge-invariant, NULLs never enter,
    values come back in salted-hash order, and k caps the state."""
    rows = (
        [Row(g="a", v=f"u{i}") for i in range(30)]
        + [Row(g="a", v=None), Row(g="b", v="only")]
        + [Row(g="a", v="u5")]  # duplicate value: distinct-sample semantics
    )
    mk = lambda p: RollupStore(str(tmp_path / p), ["g"],
                               sample_cols={"v": 4})
    inc, one = mk("s1"), mk("s2")
    for i, ch in enumerate([rows[:9], rows[9:20], rows[20:]]):
        inc.apply(spark.createDataFrame(ch, "g string, v string"), batch_id=i)
    one.apply(spark.createDataFrame(rows, "g string, v string"), batch_id=0)
    gi = {r["g"]: r["sample_v"] for r in inc.snapshot(spark).collect()}
    go = {r["g"]: r["sample_v"] for r in one.snapshot(spark).collect()}
    assert gi == go
    assert len(gi["a"]) == 4 and gi["b"] == ["only"]
    # matches driver-side ranking of distinct values by the same hash
    import hashlib

    def h(v):
        return hashlib.md5(f"s|{v}".encode()).hexdigest()

    want = sorted({f"u{i}" for i in range(30)}, key=lambda v: (h(v), v))[:4]
    assert gi["a"] == want

    # KMV distinct estimator: below k the count is exact; with the sketch
    # full it's (k-1)/h_k computed from the k-th smallest hash
    est = {r["g"]: r["kmv_distinct_est_v"]
           for r in inc.snapshot(spark).collect()}
    assert est["b"] == 1.0  # 1 distinct value < k=4 -> exact
    kth = h(want[3])
    expect = round(3 / (int(kth[:8], 16) / 2**32), 2)
    assert est["a"] == expect
    # a 30-distinct truth should be within a loose KMV error band
    assert 5 <= est["a"] <= 200


def test_kmv_sample_null_group_key(spark, tmp_path):
    """A NULL-keyed group keeps its sample like every other aggregate:
    the sample side-frame joins back onto the main partials null-safely
    (a plain equality join silently returns an empty sample for the
    NULL group while its count/sum partials survive the groupBy)."""
    store = RollupStore(str(tmp_path / "nullg"), ["g"],
                        sum_cols=["x"], sample_cols={"v": 4})
    store.apply(
        spark.createDataFrame(
            [Row(g=None, v="a", x=1.0), Row(g=None, v="b", x=2.0),
             Row(g="k", v="c", x=3.0)],
            "g string, v string, x double",
        ),
        batch_id=0,
    )
    rows = {r["g"]: r for r in store.snapshot(spark).collect()}
    assert rows[None]["n_rows"] == 2 and rows[None]["sum_x"] == 3.0
    assert sorted(rows[None]["sample_v"]) == ["a", "b"]
    assert rows["k"]["sample_v"] == ["c"]


def test_hist_bounds_validation(tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="hi > lo"):
        RollupStore(str(tmp_path / "bad"), ["g"], hist_cols={"v": (5.0, 5.0, 4)})
    with _pytest.raises(ValueError, match="quantiles"):
        RollupStore(
            str(tmp_path / "bad2"), ["g"],
            hist_cols={"v": (0.0, 1.0, 4)}, quantiles=[0.0],
        )


def test_orphaned_state_dirs_are_swept(spark, tmp_path):
    """A crash between state write and pointer flip leaves an orphan v-* dir;
    the next apply removes it and the store stays correct."""
    import os

    store = RollupStore(str(tmp_path / "r5"), ["g"], sum_cols=["v"])
    store.apply(_batches(spark)[0], batch_id=0)
    orphan = str(tmp_path / "r5" / "v-deadbeef0000")
    os.makedirs(orphan)
    store.apply(_batches(spark)[1], batch_id=1)
    assert not os.path.exists(orphan)
    dirs = [n for n in os.listdir(tmp_path / "r5") if n.startswith("v-")]
    assert len(dirs) == 1  # exactly the live state
