"""Streaming SCD2 store: both backends equal the batch rebuild at
quiescence, replays are no-ops, and the materialized pointer flip
survives a crash between write and marker."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

TS = dt.datetime

ROWS = [
    # (user, ts, attr) spread over three microbatches, per-key append-only
    [(1, "2026-01-01T00:00:01", "a"), (2, "2026-01-01T00:00:02", "x")],
    [(1, "2026-01-01T00:00:03", "b"), (1, "2026-01-01T00:00:04", "b"),
     (3, "2026-01-01T00:00:05", "q")],
    [(2, "2026-01-01T00:00:06", "y"), (1, "2026-01-01T00:00:07", "a")],
]


def _batch(spark, rows):
    return spark.createDataFrame(
        [(u, TS.fromisoformat(t), a) for u, t, a in rows],
        "user_id bigint, ts timestamp_ntz, attr string",
    )


def _all(spark):
    return _batch(spark, [r for b in ROWS for r in b])


def _hkey(r):
    return (r.user_id, r.attr, r.effective_from, r.effective_to,
            r.is_current)


def _expected(spark):
    from confluent_data_ingestion_spark.operators.evolve import (
        scd2_from_changelog,
    )

    return sorted(
        map(_hkey, scd2_from_changelog(
            _all(spark), ["user_id"], "ts", ["attr"]).collect())
    )


@pytest.mark.parametrize("mode", ["log", "materialized"])
def test_microbatches_equal_batch_rebuild(spark, tmp_path, mode):
    from confluent_data_ingestion_spark.streaming.scd2 import Scd2Store

    store = Scd2Store(str(tmp_path / mode), ["user_id"], "ts", ["attr"],
                      mode=mode)
    for i, rows in enumerate(ROWS):
        assert store.apply(_batch(spark, rows), batch_id=i)
    got = sorted(map(_hkey, store.history(spark).collect()))
    assert got == _expected(spark)
    # current() is the latest-per-key slice
    cur = {r.user_id: r.attr for r in store.current(spark).collect()}
    assert cur == {1: "a", 2: "y", 3: "q"}


@pytest.mark.parametrize("mode", ["log", "materialized"])
def test_replay_is_noop(spark, tmp_path, mode):
    from confluent_data_ingestion_spark.streaming.scd2 import Scd2Store

    store = Scd2Store(str(tmp_path / mode), ["user_id"], "ts", ["attr"],
                      mode=mode)
    for i, rows in enumerate(ROWS):
        store.apply(_batch(spark, rows), batch_id=i)
    # replay every batch (foreachBatch retry): committed -> skipped
    for i, rows in enumerate(ROWS):
        assert store.apply(_batch(spark, rows), batch_id=i) is False
    assert sorted(map(_hkey, store.history(spark).collect())) == \
        _expected(spark)


def test_log_compact_preserves_history(spark, tmp_path):
    from confluent_data_ingestion_spark.streaming.scd2 import Scd2Store

    store = Scd2Store(str(tmp_path / "c"), ["user_id"], "ts", ["attr"],
                      mode="log")
    for i, rows in enumerate(ROWS):
        store.apply(_batch(spark, rows), batch_id=i)
    before = sorted(map(_hkey, store.history(spark).collect()))
    store.compact(spark)
    assert sorted(map(_hkey, store.history(spark).collect())) == before
    # the compacted log holds version starts only (duplicates dropped)
    log = spark.read.parquet(str(tmp_path / "c" / "log"))
    assert log.count() == len(before)


def test_materialized_crash_before_pointer_flip(spark, tmp_path, monkeypatch):
    """A crash after writing the new version dir but BEFORE the pointer
    flip must leave the previous committed state live; the retry then
    applies cleanly."""
    from confluent_data_ingestion_spark.streaming import scd2 as mod

    store = mod.Scd2Store(str(tmp_path / "m"), ["user_id"], "ts", ["attr"],
                          mode="materialized")
    store.apply(_batch(spark, ROWS[0]), batch_id=0)
    v0 = store._version_dirs()[0]

    real_open = open

    def crashing_open(path, *a, **kw):
        if str(path).endswith("_current") and "w" in (a[0] if a else kw.get("mode", "r")):
            raise RuntimeError("crash before pointer flip")
        return real_open(path, *a, **kw)

    monkeypatch.setattr("builtins.open", crashing_open)
    with pytest.raises(RuntimeError):
        store.apply(_batch(spark, ROWS[1]), batch_id=1)
    monkeypatch.undo()

    # old version still live, batch 1 not committed
    assert store._version_dirs() == [v0]
    assert not store.committed(1)
    # retry completes and converges
    assert store.apply(_batch(spark, ROWS[1]), batch_id=1)
    store.apply(_batch(spark, ROWS[2]), batch_id=2)
    assert sorted(map(_hkey, store.history(spark).collect())) == \
        _expected(spark)


def test_foreach_batch_on_file_stream(spark, tmp_path):
    """Drive the store from a real Structured Streaming query."""
    from confluent_data_ingestion_spark.streaming.scd2 import Scd2Store

    src = str(tmp_path / "in")
    os.makedirs(src)
    for i, rows in enumerate(ROWS):
        with open(f"{src}/b{i}.ndjson", "w") as f:
            f.writelines(
                json.dumps({"user_id": u, "ts": t, "attr": a}) + "\n"
                for u, t, a in rows
            )
    stream = (
        spark.readStream.schema("user_id bigint, ts string, attr string")
        .json(src)
        .select(
            "user_id",
            F.col("ts").cast("timestamp_ntz").alias("ts"),
            "attr",
        )
    )
    store = Scd2Store(str(tmp_path / "st"), ["user_id"], "ts", ["attr"],
                      mode="log")
    q = (
        stream.writeStream.foreachBatch(store.foreach_batch())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(map(_hkey, store.history(spark).collect())) == \
        _expected(spark)


# ---------------------------------------------------------------------------
# Streaming anomaly twin: prefix z-scores across microbatches
# ---------------------------------------------------------------------------
def _anomaly_reference(events, threshold=2.0, min_count=5):
    """Independent single-threaded prefix-stat reference."""
    import math
    from collections import defaultdict

    st = defaultdict(lambda: (0, 0.0, 0.0))
    flags = []
    for k, ts, v in sorted(events, key=lambda e: (e[1], e[2], e[0])):
        n, s, s2 = st[k]
        if n >= min_count:
            mean = s / n
            var = s2 / n - mean * mean
            if var > 0:
                z = round((v - mean) / math.sqrt(var), 6)
                if abs(z) > threshold:
                    flags.append((k, ts, v, z))
        st[k] = (n + 1, s + v, s2 + v * v)
    return sorted(flags)


def test_stateful_anomaly_across_microbatches(spark, tmp_path):
    from confluent_data_ingestion_spark.streaming.stateful import (
        stateful_anomaly,
    )

    base = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 9.8]
    events = []
    t = 0
    for v in base:                      # key 1 builds a tight baseline
        events.append((1, t, v)); t += 1
    events.append((1, t, 100.0)); t += 1   # clear outlier
    events.append((1, t, 10.1)); t += 1    # back to normal
    for v in (5.0, 5.0, 5.0, 5.0, 5.0, 5.0):  # key 2: zero variance
        events.append((2, t, v)); t += 1
    events.append((2, t, 5.0)); t += 1     # var==0 -> never flagged

    # three microbatches in event order
    batches = [events[:6], events[6:11], events[11:]]
    src = str(tmp_path / "in")
    os.makedirs(src)
    for i, b in enumerate(batches):
        with open(f"{src}/b{i}.ndjson", "w") as f:
            f.writelines(
                json.dumps({
                    "key": k,
                    "ts": f"2026-01-01T00:00:{s:02d}",
                    "value": v,
                }) + "\n"
                for k, s, v in b
            )
    stream = (
        spark.readStream.schema("key bigint, ts string, value double")
        .json(src)
        .select("key", F.col("ts").cast("timestamp").alias("ts"), "value")
    )
    q = (
        stateful_anomaly(stream, threshold=2.0, min_count=5)
        .writeStream.format("memory")
        .queryName("anom_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.key, int(r.event_ts.second) + 60 * r.event_ts.minute,
         r.value, r.zscore)
        for r in spark.sql("select * from anom_stream").collect()
    )
    want = _anomaly_reference(events)
    assert got == want
    assert len(got) == 1 and got[0][0] == 1 and got[0][2] == 100.0


def test_log_mode_replay_after_crash_between_write_and_marker(spark, tmp_path):
    """log mode appends events before the marker; a crash in between makes
    the retry append the SAME events again — duplicates collapse in the
    change detection, so the derived history is unchanged (effective
    idempotency without a transactional log)."""
    from confluent_data_ingestion_spark.streaming.scd2 import Scd2Store

    store = Scd2Store(str(tmp_path / "lg"), ["user_id"], "ts", ["attr"],
                      mode="log")
    for i, rows in enumerate(ROWS):
        store.apply(_batch(spark, rows), batch_id=i)
    # simulate the crash aftermath: batch 1's events landed twice
    _batch(spark, ROWS[1]).write.mode("append").parquet(
        str(tmp_path / "lg" / "log")
    )
    assert sorted(map(_hkey, store.history(spark).collect())) == \
        _expected(spark)


# ---------------------------------------------------------------------------
# Stream-stream interval join: equals the batch twin at quiescence
# ---------------------------------------------------------------------------
def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    from confluent_data_ingestion_spark.operators.temporal import (
        interval_join,
    )
    from confluent_data_ingestion_spark.streaming.joins import (
        stream_interval_join,
    )

    views = [  # (user, ts, page)
        (1, "2026-01-01T00:00:00", "a"), (1, "2026-01-01T00:10:00", "b"),
        (2, "2026-01-01T00:05:00", "c"), (3, "2026-01-01T00:20:00", "d"),
    ]
    buys = [   # (user, ts, amount)
        (1, "2026-01-01T00:04:00", 10.0),   # within 30min of view a
        (1, "2026-01-01T00:35:00", 20.0),   # within 30min of view b only
        (2, "2026-01-01T00:05:00", 30.0),   # equal ts -> excluded (>, not >=)
        (3, "2026-01-01T01:20:00", 40.0),   # 60min after view d -> outside
    ]
    vsrc, bsrc = str(tmp_path / "v"), str(tmp_path / "b")
    os.makedirs(vsrc); os.makedirs(bsrc)
    with open(f"{vsrc}/v.ndjson", "w") as f:
        f.writelines(json.dumps({"user_id": u, "vts": t, "page": p}) + "\n"
                     for u, t, p in views)
    with open(f"{bsrc}/b.ndjson", "w") as f:
        f.writelines(json.dumps({"user_id": u, "bts": t, "amount": a}) + "\n"
                     for u, t, a in buys)

    def v_frame(reader):
        return reader.schema("user_id bigint, vts string, page string").json(
            vsrc
        ).select("user_id", F.col("vts").cast("timestamp").alias("vts"),
                 "page")

    def b_frame(reader):
        return reader.schema(
            "user_id bigint, bts string, amount double"
        ).json(bsrc).select(
            F.col("user_id").alias("buyer_id"),
            F.col("bts").cast("timestamp").alias("bts"), "amount",
        )

    joined = stream_interval_join(
        v_frame(spark.readStream), b_frame(spark.readStream),
        left_on="user_id", right_on="buyer_id",
        left_time="vts", right_time="bts",
        lower_seconds=0, upper_seconds=1800,
    )
    q = (
        joined.writeStream.format("memory").queryName("ssj")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, r.page, r.amount_r)
        for r in spark.sql("select * from ssj").collect()
    )
    want = sorted(
        (r.user_id, r.page, r.amount_r)
        for r in interval_join(
            v_frame(spark.read), b_frame(spark.read),
            left_on="user_id", right_on="buyer_id",
            left_time="vts", right_time="bts",
            lower_seconds=0, upper_seconds=1800,
        ).collect()
    )
    assert got == want
    assert got == [(1, "a", 10.0), (1, "b", 20.0)]


def test_stream_stream_join_matches_across_microbatches(spark, tmp_path):
    """A left-side row retained in join STATE matches a right-side row
    that only arrives in a LATER microbatch — the property single-batch
    quiescence tests cannot see.  maxFilesPerTrigger=1 forces the
    purchase files into separate triggers (mtimes pinned so file order
    is deterministic); every event stays ahead of the watermark, so
    nothing is late-dropped and the result equals the batch twin."""
    import time as _time

    from confluent_data_ingestion_spark.operators.temporal import (
        interval_join,
    )
    from confluent_data_ingestion_spark.streaming.joins import (
        stream_interval_join,
    )

    vsrc, bsrc = str(tmp_path / "v"), str(tmp_path / "b")
    os.makedirs(vsrc); os.makedirs(bsrc)
    with open(f"{vsrc}/v.ndjson", "w") as f:
        f.write(json.dumps(
            {"user_id": 1, "vts": "2026-01-01T00:00:00", "page": "a"}) + "\n")
        f.write(json.dumps(
            {"user_id": 2, "vts": "2026-01-01T00:02:00", "page": "b"}) + "\n")
    # batch 1 for the buy side: a non-matching warm-up purchase
    with open(f"{bsrc}/b1.ndjson", "w") as f:
        f.write(json.dumps(
            {"user_id": 9, "bts": "2026-01-01T00:01:00", "amount": 1.0})
            + "\n")
    # batch 2: the purchases that match batch-1 views FROM STATE
    with open(f"{bsrc}/b2.ndjson", "w") as f:
        f.write(json.dumps(
            {"user_id": 1, "bts": "2026-01-01T00:10:00", "amount": 25.0})
            + "\n")
        f.write(json.dumps(
            {"user_id": 2, "bts": "2026-01-01T00:20:00", "amount": 35.0})
            + "\n")
    now = _time.time()
    os.utime(f"{bsrc}/b1.ndjson", (now - 10, now - 10))
    os.utime(f"{bsrc}/b2.ndjson", (now, now))

    def v_frame(reader):
        return reader.schema("user_id bigint, vts string, page string").json(
            vsrc
        ).select("user_id", F.col("vts").cast("timestamp").alias("vts"),
                 "page")

    def b_frame(reader, streaming=False):
        if streaming:
            reader = reader.option("maxFilesPerTrigger", 1)
        return reader.schema(
            "user_id bigint, bts string, amount double"
        ).json(bsrc).select(
            F.col("user_id").alias("buyer_id"),
            F.col("bts").cast("timestamp").alias("bts"), "amount",
        )

    joined = stream_interval_join(
        v_frame(spark.readStream),
        b_frame(spark.readStream, streaming=True),
        left_on="user_id", right_on="buyer_id",
        left_time="vts", right_time="bts",
        lower_seconds=0, upper_seconds=1800,
    )
    q = (
        joined.writeStream.format("memory").queryName("ssj_mb")
        .option("checkpointLocation", str(tmp_path / "ckpt_mb"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    prog = [p for p in q.recentProgress if p is not None]
    assert len(prog) >= 2  # the buy side really spanned >= 2 triggers
    got = sorted(
        (r.user_id, r.page, r.amount_r)
        for r in spark.sql("select * from ssj_mb").collect()
    )
    want = sorted(
        (r.user_id, r.page, r.amount_r)
        for r in interval_join(
            v_frame(spark.read), b_frame(spark.read),
            left_on="user_id", right_on="buyer_id",
            left_time="vts", right_time="bts",
            lower_seconds=0, upper_seconds=1800,
        ).collect()
    )
    assert got == want == [(1, "a", 25.0), (2, "b", 35.0)]


def test_stream_stream_interval_join_left_outer_flushes_at_quiescence(
    spark, tmp_path
):
    """how='left_outer': an unmatched left row emits with NULL right
    columns once the GLOBAL watermark (min over both streams, advanced
    only by event time) passes left_time + upper.  The trailing 999
    events push both sides' event time to 03:00, so the final
    availableNow no-data batch's watermark passes every real view's
    30-minute deadline and the emitted set equals the batch LEFT
    interval join (inner pairs plus every never-matched view)."""
    from confluent_data_ingestion_spark.streaming.joins import (
        stream_interval_join,
    )

    views = [
        (1, "2026-01-01T00:00:00", "a"), (1, "2026-01-01T00:10:00", "b"),
        (2, "2026-01-01T00:05:00", "c"), (3, "2026-01-01T00:20:00", "d"),
        # watermark-advancing trailing event (its own deadline 03:30 is
        # never passed, so it stays HELD — asserting it is absent also
        # pins the held-not-lost semantics)
        (999, "2026-01-01T03:00:00", "w"),
    ]
    buys = [
        (1, "2026-01-01T00:04:00", 10.0),   # matches view a
        (1, "2026-01-01T00:35:00", 20.0),   # matches view b only
        (2, "2026-01-01T00:05:00", 30.0),   # equal ts -> excluded (>, not >=)
        (3, "2026-01-01T01:20:00", 40.0),   # outside the 30min window
        (999, "2026-01-01T03:00:00", 0.0),  # watermark-advancing trailer
    ]
    vsrc, bsrc = str(tmp_path / "v"), str(tmp_path / "b")
    os.makedirs(vsrc); os.makedirs(bsrc)
    with open(f"{vsrc}/v.ndjson", "w") as f:
        f.writelines(json.dumps({"user_id": u, "vts": t, "page": p}) + "\n"
                     for u, t, p in views)
    with open(f"{bsrc}/b.ndjson", "w") as f:
        f.writelines(json.dumps({"user_id": u, "bts": t, "amount": a}) + "\n"
                     for u, t, a in buys)

    joined = stream_interval_join(
        spark.readStream.schema("user_id bigint, vts string, page string")
        .json(vsrc)
        .select("user_id", F.col("vts").cast("timestamp").alias("vts"),
                "page"),
        spark.readStream.schema("user_id bigint, bts string, amount double")
        .json(bsrc)
        .select(F.col("user_id").alias("buyer_id"),
                F.col("bts").cast("timestamp").alias("bts"), "amount"),
        left_on="user_id", right_on="buyer_id",
        left_time="vts", right_time="bts",
        lower_seconds=0, upper_seconds=1800,
        # null emission waits for watermark > vts + upper: the latest
        # event is 01:20, so a tight lateness bound lets the final
        # availableNow watermark advance (01:20 - 1s) pass every held
        # view's 30-minute deadline; the default 1h bound would leave
        # them all still-waiting at quiescence (held, not lost)
        watermark="1 second",
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory").queryName("ssj_lo")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, r.page, r.amount_r)
        for r in spark.sql("select * from ssj_lo").collect()
    )
    # inner pairs + the never-matched views c (equal-ts exclusion) and d;
    # the 999 trailer's own deadline was never passed -> held, not emitted
    assert got == [
        (1, "a", 10.0), (1, "b", 20.0), (2, "c", None), (3, "d", None),
    ]


def test_stream_interval_join_rejects_unknown_how(spark):
    import pytest as _pytest

    from confluent_data_ingestion_spark.streaming.joins import (
        stream_interval_join,
    )

    with _pytest.raises(ValueError, match="left_outer"):
        stream_interval_join(
            spark.readStream.format("rate").load(),
            spark.readStream.format("rate").load(),
            left_on="value", right_on="value",
            left_time="timestamp", right_time="timestamp",
            lower_seconds=0, upper_seconds=10,
            how="full",
        )


def test_stream_stream_interval_join_full_outer_flushes_both_sides(
    spark, tmp_path
):
    """how='full_outer': BOTH outer contracts at once, each gated by the
    global watermark.  Unmatched views flush once the watermark passes
    vts + upper (strict); unmatched buys flush once it reaches
    bts - lower (NON-strict — the 02:59:59 sentinel sits exactly AT the
    final watermark and must emit, because every view that could still
    match it has ts < bts, already sealed off).  The 999 trailers on
    both sides advance event time to 03:00 but their own deadlines are
    never passed -> held, not emitted."""
    from confluent_data_ingestion_spark.streaming.joins import (
        stream_interval_join,
    )

    views = [
        (1, "2026-01-01T00:00:00", "a"), (1, "2026-01-01T00:10:00", "b"),
        (2, "2026-01-01T00:05:00", "c"), (3, "2026-01-01T00:20:00", "d"),
        (999, "2026-01-01T03:00:00", "w"),
    ]
    buys = [
        (1, "2026-01-01T00:04:00", 10.0),   # matches view a
        (1, "2026-01-01T00:35:00", 20.0),   # matches view b only
        (2, "2026-01-01T00:05:00", 30.0),   # equal ts -> excluded (>, not >=)
        (3, "2026-01-01T01:20:00", 40.0),   # outside the 30min window
        (77, "2026-01-01T02:59:59", 1.0),   # bts == final watermark exactly
        (999, "2026-01-01T03:00:00", 0.0),  # trailer: deadline never passed
    ]
    vsrc, bsrc = str(tmp_path / "v"), str(tmp_path / "b")
    os.makedirs(vsrc); os.makedirs(bsrc)
    with open(f"{vsrc}/v.ndjson", "w") as f:
        f.writelines(json.dumps({"user_id": u, "vts": t, "page": p}) + "\n"
                     for u, t, p in views)
    with open(f"{bsrc}/b.ndjson", "w") as f:
        f.writelines(json.dumps({"user_id": u, "bts": t, "amount": a}) + "\n"
                     for u, t, a in buys)

    joined = stream_interval_join(
        spark.readStream.schema("user_id bigint, vts string, page string")
        .json(vsrc)
        .select("user_id", F.col("vts").cast("timestamp").alias("vts"),
                "page"),
        spark.readStream.schema("user_id bigint, bts string, amount double")
        .json(bsrc)
        .select(F.col("user_id").alias("buyer_id"),
                F.col("bts").cast("timestamp").alias("bts"), "amount"),
        left_on="user_id", right_on="buyer_id",
        left_time="vts", right_time="bts",
        lower_seconds=0, upper_seconds=1800,
        watermark="1 second",
        how="full_outer",
    )
    q = (
        joined.writeStream.format("memory").queryName("ssj_fo")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    got = sorted(
        ((r.user_id, r.page, r.buyer_id_r, r.amount_r)
         for r in spark.sql("select * from ssj_fo").collect()),
        key=key,
    )
    assert got == [
        (1, "a", 1, 10.0), (1, "b", 1, 20.0),
        (2, "c", None, None), (3, "d", None, None),
        (None, None, 2, 30.0),   # equal-ts exclusion -> right-null row
        (None, None, 3, 40.0),   # outside window -> right-null row
        (None, None, 77, 1.0),   # AT the watermark -> flushes (non-strict)
    ]


def test_stream_stream_interval_join_right_outer(spark, tmp_path):
    """how='right_outer': the mirror contract as a first-class mode —
    unmatched buys flush at the watermark, unmatched views never emit."""
    from confluent_data_ingestion_spark.streaming.joins import (
        stream_interval_join,
    )

    views = [(1, "2026-01-01T00:00:00", "a"),
             (999, "2026-01-01T03:00:00", "w")]
    buys = [
        (1, "2026-01-01T00:04:00", 10.0),   # matched
        (3, "2026-01-01T01:20:00", 40.0),   # no view at all -> null row
        (999, "2026-01-01T03:00:00", 0.0),
    ]
    vsrc, bsrc = str(tmp_path / "v"), str(tmp_path / "b")
    os.makedirs(vsrc); os.makedirs(bsrc)
    with open(f"{vsrc}/v.ndjson", "w") as f:
        f.writelines(json.dumps({"user_id": u, "vts": t, "page": p}) + "\n"
                     for u, t, p in views)
    with open(f"{bsrc}/b.ndjson", "w") as f:
        f.writelines(json.dumps({"user_id": u, "bts": t, "amount": a}) + "\n"
                     for u, t, a in buys)
    joined = stream_interval_join(
        spark.readStream.schema("user_id bigint, vts string, page string")
        .json(vsrc)
        .select("user_id", F.col("vts").cast("timestamp").alias("vts"),
                "page"),
        spark.readStream.schema("user_id bigint, bts string, amount double")
        .json(bsrc)
        .select(F.col("user_id").alias("buyer_id"),
                F.col("bts").cast("timestamp").alias("bts"), "amount"),
        left_on="user_id", right_on="buyer_id",
        left_time="vts", right_time="bts",
        lower_seconds=0, upper_seconds=1800,
        watermark="1 second",
        how="right_outer",
    )
    q = (
        joined.writeStream.format("memory").queryName("ssj_ro")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    got = sorted(
        ((r.user_id, r.page, r.buyer_id_r, r.amount_r)
         for r in spark.sql("select * from ssj_ro").collect()),
        key=key,
    )
    assert got == [(1, "a", 1, 10.0), (None, None, 3, 40.0)]
