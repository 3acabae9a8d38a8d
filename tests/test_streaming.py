"""Streaming runtime tests: upsert snapshot store, watermark dedup, and the
statement-set runner's quiescence contract (streaming result == batch result
over the same total input, AC-2)."""

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from confluent_data_ingestion_spark.spec import load_spec
from confluent_data_ingestion_spark.streaming import (
    StatementSetRunner,
    UpsertSnapshot,
    file_envelope_stream,
    kafka_source_options,
    watermark_dedup,
)


# ---------------------------------------------------------------------------
# UpsertSnapshot
# ---------------------------------------------------------------------------
def _mk_store(tmp, **kw):
    return UpsertSnapshot(str(tmp / "store"), ["k"], ["seq"], **kw)


def test_upsert_latest_wins(spark, tmp_path):
    store = _mk_store(tmp_path)
    store.upsert(spark.createDataFrame([Row(k=1, seq=1, v="a"), Row(k=2, seq=1, v="b")]))
    store.upsert(spark.createDataFrame([Row(k=1, seq=2, v="a2")]))
    snap = {r["k"]: r["v"] for r in store.snapshot(spark).collect()}
    assert snap == {1: "a2", 2: "b"}


def test_upsert_out_of_order_and_replay_idempotent(spark, tmp_path):
    store = _mk_store(tmp_path)
    b1 = spark.createDataFrame([Row(k=1, seq=5, v="new")])
    b2 = spark.createDataFrame([Row(k=1, seq=3, v="stale")])
    assert store.upsert(b1, batch_id=1)
    assert store.upsert(b2, batch_id=2)  # late arrival: older seq
    assert not store.upsert(b1, batch_id=1)  # replay skipped
    rows = store.snapshot(spark).collect()
    assert len(rows) == 1 and rows[0]["v"] == "new"
    assert store.log(spark).count() == 2  # replay appended nothing


def test_upsert_delete_modes(spark, tmp_path):
    data = [
        Row(k=1, seq=1, v="a", op="I"),
        Row(k=1, seq=2, v="a-del", op="D"),
        Row(k=2, seq=1, v="b", op="I"),
    ]
    excl = UpsertSnapshot(
        str(tmp_path / "x"), ["k"], ["seq"],
        delete_flag_field="op", delete_flag_values=("D",),
    )
    excl.upsert(spark.createDataFrame(data))
    snap = {r["k"]: r["v"] for r in excl.snapshot(spark).collect()}
    assert snap == {1: "a", 2: "b"}  # delete excluded -> previous resurfaces

    tomb = UpsertSnapshot(
        str(tmp_path / "t"), ["k"], ["seq"],
        delete_flag_field="op", delete_flag_values=("D",),
        delete_mode="tombstone",
    )
    tomb.upsert(spark.createDataFrame(data))
    snap = {r["k"]: r["v"] for r in tomb.snapshot(spark).collect()}
    assert snap == {2: "b"}  # delete retracts the key


def test_compact_preserves_snapshot(spark, tmp_path):
    store = _mk_store(tmp_path)
    for s in range(4):
        store.upsert(spark.createDataFrame([Row(k=i, seq=s, v=f"{i}@{s}") for i in range(3)]))
    before = sorted(map(tuple, store.snapshot(spark).collect()))
    store.compact(spark)
    after = sorted(map(tuple, store.snapshot(spark).collect()))
    assert before == after
    assert store.log(spark).count() == 3  # log collapsed to live keys


# ---------------------------------------------------------------------------
# Source helpers
# ---------------------------------------------------------------------------
def test_kafka_source_options():
    opts = kafka_source_options("b:9092", ["t1", "t2"], max_offsets_per_trigger=500)
    assert opts["subscribe"] == "t1,t2" and opts["maxOffsetsPerTrigger"] == "500"
    assert kafka_source_options("b", topic_pattern="x.*")["subscribePattern"] == "x.*"
    with pytest.raises(ValueError):
        kafka_source_options("b")
    with pytest.raises(ValueError):
        kafka_source_options("b", "t", topic_pattern="x.*")


def test_watermark_dedup_stream(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    rows = [
        {"k": 1, "ts": "2026-01-01T00:00:01", "v": "a"},
        {"k": 1, "ts": "2026-01-01T00:00:05", "v": "dup"},
        {"k": 2, "ts": "2026-01-01T00:00:02", "v": "b"},
    ]
    with open(f"{src}/part1.ndjson", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in rows)
    stream = (
        file_envelope_stream(spark, src)
        .select(
            F.get_json_object("val", "$.k").cast("int").alias("k"),
            F.get_json_object("val", "$.ts").cast("timestamp").alias("ts"),
            F.get_json_object("val", "$.v").alias("v"),
        )
    )
    deduped = watermark_dedup(stream, ["k"], "ts", "10 seconds")
    q = (
        deduped.writeStream.format("memory")
        .queryName("wm_dedup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from wm_dedup").collect()
    assert sorted(r["k"] for r in got) == [1, 2]  # one row per key survives


# ---------------------------------------------------------------------------
# Statement-set runner: streaming == batch at quiescence
# ---------------------------------------------------------------------------
def _pipeline_spec():
    def R(**kw):
        return kw

    return load_spec([
        R(PipelineStage="VIEW", TargetTable="V_ACCT", TargetColumn="acct_id",
          TargetDataType="BIGINT", IsTargetPK="Y", FieldSelector="acct_id",
          FilterPredicate="JSON_VALUE(CAST(val AS STRING), '$.tbl') = 'acct'"),
        R(PipelineStage="VIEW", TargetTable="V_ACCT", TargetColumn="seq",
          TargetDataType="BIGINT", FieldSelector="seq"),
        R(PipelineStage="VIEW", TargetTable="V_ACCT", TargetColumn="status",
          TargetDataType="STRING", FieldSelector="status"),
        R(PipelineStage="XREF", TargetTable="XREF_ACCT", TargetColumn="acct_id",
          TargetDataType="BIGINT", IsTargetPK="Y", SourceTable="V_ACCT",
          FieldSelector="acct_id", OrderByFields="seq"),
        R(PipelineStage="XREF", TargetTable="XREF_ACCT", TargetColumn="status",
          SourceTable="V_ACCT", FieldSelector="status"),
        R(PipelineStage="FGAC", TargetTable="FGAC_ACCT", TargetColumn="acct_id",
          TargetDataType="BIGINT", IsTargetPK="Y", SourceTable="XREF_ACCT",
          FieldSelector="s.acct_id", JoinTable="dim", JoinAlias="d",
          JoinType="INNER", JoinCondition="s.acct_id = d.id"),
        R(PipelineStage="FGAC", TargetTable="FGAC_ACCT", TargetColumn="status",
          SourceTable="XREF_ACCT", FieldSelector="s.status"),
        R(PipelineStage="FGAC", TargetTable="FGAC_ACCT", TargetColumn="segment",
          SourceTable="XREF_ACCT", FieldSelector="d.segment"),
        R(PipelineStage="QUARANTINE", TargetTable="Q_ACCT", TargetColumn="acct_id",
          TargetDataType="BIGINT", SourceTable="XREF_ACCT",
          FieldSelector="acct_id", JoinTable="dim", JoinAlias="d",
          JoinCondition="s.acct_id = d.id",
          FilterPredicate="d.id IS NULL"),
    ])


def _write_envelope_files(src_dir, n_files=3, accts=7, updates=3):
    """Deterministic multi-batch envelope: every account gets several
    versions spread across files; acct_id >= 100 has no dim row (quarantine)."""
    os.makedirs(src_dir)
    msgs = []
    seq = 0
    for u in range(updates):
        for a in range(accts):
            aid = a + (100 if a >= accts - 2 else 0)  # last two are orphans
            msgs.append({"tbl": "acct", "acct_id": aid, "seq": seq,
                         "status": f"s{u}-{aid}"})
            seq += 1
    msgs.append({"tbl": "other", "acct_id": 999, "seq": 0, "status": "noise"})
    per = (len(msgs) + n_files - 1) // n_files
    for i in range(n_files):
        with open(f"{src_dir}/f{i}.ndjson", "w") as f:
            f.writelines(json.dumps(m) + "\n" for m in msgs[i * per:(i + 1) * per])


def test_statement_set_streaming_matches_batch(spark, tmp_path):
    src = str(tmp_path / "msgs")
    _write_envelope_files(src)
    dim = spark.createDataFrame(
        [Row(id=i, segment=f"seg{i % 2}") for i in range(10)]
    )
    spec = _pipeline_spec()

    batch_runner = StatementSetRunner(
        spark, spec, {"dim": dim}, str(tmp_path / "out_batch"))
    raw = spark.read.text(src).select(F.col("value").alias("val"))
    batch_paths = batch_runner.run_batch(raw)

    stream_runner = StatementSetRunner(
        spark, spec, {"dim": dim}, str(tmp_path / "out_stream"))
    stream = file_envelope_stream(spark, src, max_files_per_trigger=1)
    stream_runner.run_streaming(stream)

    for table in ("XREF_ACCT", "FGAC_ACCT", "Q_ACCT"):
        b = sorted(map(tuple, spark.read.parquet(batch_paths[table])
                       .select(spark.read.parquet(batch_paths[table]).columns).collect()))
        s_df = spark.read.parquet(stream_runner.table_path(table))
        s = sorted(map(tuple, s_df.select(*spark.read.parquet(batch_paths[table]).columns)
                       .collect()))
        if table == "Q_ACCT":
            # reject stream is append-only: dedup for comparison
            s = sorted(set(s))
            b = sorted(set(b))
        assert s == b, f"{table}: streaming != batch at quiescence"
    # sanity: quarantine caught exactly the orphan accounts
    q = spark.read.parquet(stream_runner.table_path("Q_ACCT"))
    assert set(r["acct_id"] for r in q.collect()) == {105, 106}


def test_statement_set_restart_is_noop(spark, tmp_path):
    """Re-running with the same checkpoint re-processes nothing and outputs
    are unchanged (idempotent recovery, PR-3)."""
    src = str(tmp_path / "msgs")
    _write_envelope_files(src, n_files=2)
    dim = spark.createDataFrame([Row(id=i, segment="s") for i in range(10)])
    spec = _pipeline_spec()
    runner = StatementSetRunner(spark, spec, {"dim": dim}, str(tmp_path / "out"))
    stream = file_envelope_stream(spark, src, max_files_per_trigger=1)
    runner.run_streaming(stream)
    before = sorted(map(tuple, spark.read.parquet(runner.table_path("XREF_ACCT")).collect()))
    log_count = runner._xref_store("XREF_ACCT", spec.tables()["XREF_ACCT"]).log(spark).count()

    runner2 = StatementSetRunner(spark, spec, {"dim": dim}, str(tmp_path / "out"))
    stream2 = file_envelope_stream(spark, src, max_files_per_trigger=1)
    runner2.run_streaming(stream2)
    after = sorted(map(tuple, spark.read.parquet(runner2.table_path("XREF_ACCT")).collect()))
    log_count2 = runner2._xref_store("XREF_ACCT", spec.tables()["XREF_ACCT"]).log(spark).count()
    assert before == after
    assert log_count == log_count2  # nothing re-appended


def test_parse_state_ttl():
    from confluent_data_ingestion_spark.streaming.sources import parse_state_ttl

    assert parse_state_ttl("5 min") == "5 minutes"
    assert parse_state_ttl("900 ms") == "900 milliseconds"
    assert parse_state_ttl("2 h") == "2 hours"
    assert parse_state_ttl("0 ms") is None  # keep state forever
    with pytest.raises(ValueError):
        parse_state_ttl("whenever")


# ---------------------------------------------------------------------------
# Tumbling window aggregation under Structured Streaming (watermarked)
# ---------------------------------------------------------------------------
def test_tumbling_window_streaming_matches_batch(spark, tmp_path):
    from confluent_data_ingestion_spark.operators.temporal import (
        tumbling_window_agg,
    )

    src = str(tmp_path / "win_in")
    os.makedirs(src)
    rows = [
        {"et": "a", "ts": "2026-01-01T00:00:10", "v": 1.0},
        {"et": "a", "ts": "2026-01-01T00:01:10", "v": 2.0},
        {"et": "b", "ts": "2026-01-01T00:00:20", "v": 4.0},
        {"et": "a", "ts": "2026-01-01T00:02:30", "v": 8.0},
    ]
    with open(f"{src}/p1.ndjson", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in rows)

    def typed(df):
        return df.select(
            F.get_json_object("val", "$.et").alias("event_type"),
            F.get_json_object("val", "$.ts").cast("timestamp").alias("ts"),
            F.get_json_object("val", "$.v").cast("double").alias("value"),
        )

    aggs = [F.count("*").alias("n"), F.sum("value").alias("s")]

    # the SAME operator body runs in both execution modes — watermark added
    # on the streaming side so state is bounded in a real deployment
    stream = typed(file_envelope_stream(spark, src)).withWatermark("ts", "1 minute")
    q = (
        tumbling_window_agg(
            stream, time_col="ts", window_seconds=60,
            group_cols=["event_type"], aggs=aggs,
        )
        .writeStream.format("memory")
        .queryName("win_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "win_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch_df = spark.read.text(src).select(F.col("value").alias("val"))
    expected = {
        (r["event_type"], str(r["window_start"])): (r["n"], r["s"])
        for r in tumbling_window_agg(
            typed(batch_df), time_col="ts", window_seconds=60,
            group_cols=["event_type"], aggs=aggs,
        ).collect()
    }
    got = {
        (r["event_type"], str(r["window_start"])): (r["n"], r["s"])
        for r in spark.sql("select * from win_stream").collect()
    }
    assert got == expected
    assert got[("a", "2026-01-01 00:00:00")] == (1, 1.0)
    assert got[("a", "2026-01-01 00:01:00")] == (1, 2.0)


# ---------------------------------------------------------------------------
# Custom stateful operator: applyInPandasWithState sessionizer
# ---------------------------------------------------------------------------
def test_stateful_sessionize_across_microbatches(spark, tmp_path):
    from confluent_data_ingestion_spark.streaming.stateful import (
        stateful_sessionize,
    )

    src = str(tmp_path / "ss_in")
    os.makedirs(src)
    # file 1: two clusters for key 1 (session A closed by the 2nd cluster)
    with open(f"{src}/a.ndjson", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in [
            {"k": 1, "ts": "2026-01-01T00:00:00", "v": 1.0},
            {"k": 1, "ts": "2026-01-01T00:10:00", "v": 2.0},
            {"k": 1, "ts": "2026-01-01T02:00:00", "v": 4.0},
        ])
    # file 2 (separate microbatch): closes key 1's 2nd session, opens 3rd;
    # key 2 appears and stays open (never emitted)
    with open(f"{src}/b.ndjson", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in [
            {"k": 1, "ts": "2026-01-01T05:00:00", "v": 8.0},
            {"k": 2, "ts": "2026-01-01T00:00:00", "v": 16.0},
        ])
    # the file source orders batches by modification time — pin it so the
    # "state crosses microbatches" scenario is what actually runs
    now = os.path.getmtime(f"{src}/b.ndjson")
    os.utime(f"{src}/a.ndjson", (now - 10, now - 10))

    stream = file_envelope_stream(spark, src, max_files_per_trigger=1).select(
        F.get_json_object("val", "$.k").cast("bigint").alias("k"),
        F.get_json_object("val", "$.ts").cast("timestamp").alias("ts"),
        F.get_json_object("val", "$.v").cast("double").alias("v"),
    )
    q = (
        stateful_sessionize(
            stream, key_col="k", time_col="ts", value_col="v",
            gap_seconds=1800,
        )
        .writeStream.format("memory")
        .queryName("ss_out")
        .option("checkpointLocation", str(tmp_path / "ss_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["key"], str(r["session_start"])): (str(r["session_end"]), r["n_events"], r["sum_value"])
        for r in spark.sql("select * from ss_out").collect()
    }
    # session A: 00:00-00:10 (2 events), closed within batch 1
    # session B: 02:00-02:00, closed by batch 2's 05:00 event (state crossed
    # the microbatch boundary); session C (05:00) and key 2 stay open
    assert got == {
        (1, "2026-01-01 00:00:00"): ("2026-01-01 00:10:00", 2, 3.0),
        (1, "2026-01-01 02:00:00"): ("2026-01-01 02:00:00", 1, 4.0),
    }


def test_stateful_sessionize_late_row_merges_into_open_session(spark, tmp_path):
    from confluent_data_ingestion_spark.streaming.stateful import (
        stateful_sessionize,
    )

    src = str(tmp_path / "ss_late")
    os.makedirs(src)
    with open(f"{src}/a.ndjson", "w") as f:
        f.write(json.dumps({"k": 1, "ts": "2026-01-01T01:00:00", "v": 1.0}) + "\n")
    # late row 10 min BEFORE the open session start, then a gap-closer
    with open(f"{src}/b.ndjson", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in [
            {"k": 1, "ts": "2026-01-01T00:50:00", "v": 2.0},
            {"k": 1, "ts": "2026-01-01T03:00:00", "v": 4.0},
        ])
    now = os.path.getmtime(f"{src}/b.ndjson")
    os.utime(f"{src}/a.ndjson", (now - 10, now - 10))

    stream = file_envelope_stream(spark, src, max_files_per_trigger=1).select(
        F.get_json_object("val", "$.k").cast("bigint").alias("k"),
        F.get_json_object("val", "$.ts").cast("timestamp").alias("ts"),
        F.get_json_object("val", "$.v").cast("double").alias("v"),
    )
    q = (
        stateful_sessionize(stream, key_col="k", time_col="ts",
                            value_col="v", gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("ss_late_out")
        .option("checkpointLocation", str(tmp_path / "ss_late_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [
        (r["key"], str(r["session_start"]), str(r["session_end"]),
         r["n_events"], r["sum_value"])
        for r in spark.sql("select * from ss_late_out").collect()
    ]
    # the late 00:50 row merged into the open 01:00 session before 03:00
    # closed it: one session, front-extended
    assert got == [(1, "2026-01-01 00:50:00", "2026-01-01 01:00:00", 2, 3.0)]


def test_session_window_streaming_append_emits_closed_sessions(spark, tmp_path):
    from confluent_data_ingestion_spark.operators.temporal import (
        session_window_agg,
    )

    src = str(tmp_path / "sess_in")
    os.makedirs(src)
    rows = [
        {"k": 1, "ts": "2026-01-01T00:00:00", "v": 1.0},
        {"k": 1, "ts": "2026-01-01T00:10:00", "v": 2.0},
        # far-future row advances the watermark past key 1's session end
        {"k": 2, "ts": "2026-01-02T00:00:00", "v": 4.0},
    ]
    with open(f"{src}/p1.ndjson", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in rows)

    stream = file_envelope_stream(spark, src).select(
        F.get_json_object("val", "$.k").cast("bigint").alias("k"),
        F.get_json_object("val", "$.ts").cast("timestamp").alias("ts"),
        F.get_json_object("val", "$.v").cast("double").alias("v"),
    ).withWatermark("ts", "1 minute")
    q = (
        session_window_agg(
            stream, time_col="ts", gap_seconds=1800, group_cols=["k"],
            aggs=[F.count("*").alias("n"), F.sum("v").alias("s")],
        )
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["k"], str(r["window_start"])): (str(r["window_end"]), r["n"], r["s"])
        for r in spark.sql("select * from sess_stream").collect()
    }
    # key 1's session closed below the final watermark -> emitted in append
    # mode; key 2's session is still open against the watermark -> withheld
    assert got == {
        (1, "2026-01-01 00:00:00"): ("2026-01-01 00:40:00", 2, 3.0),
    }


# ---------------------------------------------------------------------------
# S1 contract: kafka_envelope_stream against a fake in-process Kafka source.
# The sandbox has no broker and no kafka connector jar, but Spark 4's Python
# Data Source API lets us register a source NAMED "kafka" serving the real
# Kafka wire schema (key/value binary, topic, partition, offset, timestamp,
# timestampType), so the S1 code path — option flow through
# kafka_source_options into readStream.format("kafka") and the value->val
# projection — executes end-to-end.  The fake echoes the options it received
# back into the message payloads, proving subscribe/bootstrap reached the
# source.
# ---------------------------------------------------------------------------
def test_kafka_envelope_stream_against_fake_broker(spark, tmp_path):
    import datetime as dt

    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    class _FakeKafkaReader(SimpleDataSourceStreamReader):
        N = 3

        def __init__(self, options):
            self._opts = options

        def _rows(self):
            topic = self._opts.get("subscribe", "?")
            boot = self._opts.get("kafka.bootstrap.servers", "?")
            ts = dt.datetime(2026, 1, 1)
            return [
                (
                    b"k%d" % i,
                    json.dumps({"topic": topic, "bootstrap": boot,
                                "n": i}).encode(),
                    topic, 0, i, ts, 1,
                )
                for i in range(self.N)
            ]

        def initialOffset(self):
            return {"offset": 0}

        def read(self, start):
            s = int(start["offset"])
            if s >= self.N:
                return iter([]), start
            return iter(self._rows()[s:]), {"offset": self.N}

        def readBetweenOffsets(self, start, end):
            return iter(self._rows()[int(start["offset"]):int(end["offset"])])

    class _FakeKafka(DataSource):
        @classmethod
        def name(cls):
            # Spark reserves the literal name "kafka" (registration raises
            # DATA_SOURCE_ALREADY_EXISTS), so the fake registers under its
            # own name and the test injects it via format_name.
            return "fakekafka"

        def schema(self):
            return ("key binary, value binary, topic string, partition int, "
                    "offset bigint, timestamp timestamp, timestampType int")

        def simpleStreamReader(self, schema):
            return _FakeKafkaReader(self.options)

    spark.dataSource.register(_FakeKafka)
    from confluent_data_ingestion_spark.streaming.sources import (
        kafka_envelope_stream,
    )

    env = kafka_envelope_stream(spark, "b:9092", "t-orders",
                                format_name="fakekafka",
                                max_offsets_per_trigger=100)
    assert env.isStreaming and env.columns == ["val"]
    q = (
        env.writeStream.format("memory")
        .queryName("kafka_env")
        .option("checkpointLocation", str(tmp_path / "kafka_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    payloads = [json.loads(r["val"])
                for r in spark.sql("select * from kafka_env").collect()]
    assert len(payloads) == 3
    # options round-tripped through the source: S1's WITH-clause contract
    assert all(p["topic"] == "t-orders" for p in payloads)
    assert all(p["bootstrap"] == "b:9092" for p in payloads)


# ---------------------------------------------------------------------------
# Streaming incremental dedup: the index grows ACROSS microbatches — a doc
# first accepted in batch 1 must label dup_exact when it reappears in
# batch 2.
# ---------------------------------------------------------------------------
def test_streaming_ingest_dedup_index_grows_across_batches(spark, tmp_path):
    from confluent_data_ingestion_spark.streaming.incremental import (
        init_dedup_index,
        streaming_ingest_dedup,
    )

    base = spark.createDataFrame(
        [Row(doc_id=1, text="the quick brown fox jumps over the lazy dog")]
    )
    idx_dir = str(tmp_path / "index")
    init_dedup_index(base, idx_dir)

    # two NDJSON files -> two microbatches (maxFilesPerTrigger=1),
    # ordered by file modification time (set below).
    d = tmp_path / "in"
    d.mkdir()
    (d / "batch_a.ndjson").write_text("\n".join([
        json.dumps({"doc_id": 10,
                    "text": "the quick brown fox jumps over the lazy dog"}),
        json.dumps({"doc_id": 11,
                    "text": "a wholly novel document body appears right here"}),
    ]))
    (d / "batch_b.ndjson").write_text("\n".join([
        json.dumps({"doc_id": 20,
                    "text": "a wholly novel document body appears right here"}),
        json.dumps({"doc_id": 21,
                    "text": "another entirely different novel text shows up"}),
    ]))
    # FileStreamSource orders by modification time: force a -> b
    t = os.path.getmtime(d / "batch_b.ndjson")
    os.utime(d / "batch_a.ndjson", (t - 60, t - 60))

    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
        .select(F.from_json(
            F.col("value"), "doc_id long, text string").alias("j"))
        .select("j.doc_id", "j.text")
    )
    q = streaming_ingest_dedup(
        stream, idx_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    got = {r["doc_id"]: r["verdict"]
           for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got[10] == "dup_exact"   # matched the pre-built base index
    assert got[11] == "novel"       # first sighting, accepted into index
    assert got[20] == "dup_exact"   # SAME text as 11 -> caught by grown index
    assert got[21] == "novel"


def test_stateful_funnel_across_microbatches(spark, tmp_path):
    from confluent_data_ingestion_spark.streaming.stateful import (
        stateful_funnel,
    )

    src = str(tmp_path / "fn_in")
    os.makedirs(src)
    # batch 1: u1 views then clicks; u2 clicks BEFORE viewing (click must
    # not count toward stage 2 — wrong order)
    with open(f"{src}/a.ndjson", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in [
            {"u": 1, "ts": "2026-01-01T00:00:01", "e": "view"},
            {"u": 1, "ts": "2026-01-01T00:00:05", "e": "click"},
            {"u": 2, "ts": "2026-01-01T00:00:02", "e": "click"},
            {"u": 2, "ts": "2026-01-01T00:00:04", "e": "view"},
        ])
    # batch 2: u1 purchases (stage carried in state across the batch
    # boundary); u2 clicks AFTER its view -> advances to stage 2 now
    with open(f"{src}/b.ndjson", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in [
            {"u": 1, "ts": "2026-01-01T00:01:00", "e": "purchase"},
            {"u": 2, "ts": "2026-01-01T00:01:01", "e": "click"},
        ])
    now = os.path.getmtime(f"{src}/b.ndjson")
    os.utime(f"{src}/a.ndjson", (now - 10, now - 10))

    stream = file_envelope_stream(spark, src, max_files_per_trigger=1).select(
        F.get_json_object("val", "$.u").cast("bigint").alias("u"),
        F.get_json_object("val", "$.ts").cast("timestamp").alias("ts"),
        F.get_json_object("val", "$.e").alias("e"),
    )
    q = (
        stateful_funnel(stream, ["view", "click", "purchase"],
                        user_col="u", time_col="ts", type_col="e")
        .writeStream.format("memory")
        .queryName("fn_out")
        .option("checkpointLocation", str(tmp_path / "fn_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["user_id"], r["stage"]): (r["step_name"], str(r["ts"]))
           for r in spark.sql("select * from fn_out").collect()}
    assert got == {
        (1, 1): ("view", "2026-01-01 00:00:01"),
        (1, 2): ("click", "2026-01-01 00:00:05"),
        (1, 3): ("purchase", "2026-01-01 00:01:00"),   # state crossed batches
        (2, 1): ("view", "2026-01-01 00:00:04"),
        (2, 2): ("click", "2026-01-01 00:01:01"),      # first click ignored
    }

    import pytest as _pytest
    with _pytest.raises(ValueError, match="steps"):
        stateful_funnel(stream, [], user_col="u", time_col="ts",
                        type_col="e")


def test_stateful_funnel_restart_from_checkpoint(spark, tmp_path):
    """A RESTARTED query (same checkpoint) must resume funnel state, not
    re-derive it: the user's stage survives process death."""
    from confluent_data_ingestion_spark.streaming.stateful import (
        stateful_funnel,
    )

    src = str(tmp_path / "fr_in")
    out = str(tmp_path / "fr_out")
    ckpt = str(tmp_path / "fr_ckpt")
    os.makedirs(src)

    def run_once():
        stream = file_envelope_stream(spark, src).select(
            F.get_json_object("val", "$.u").cast("bigint").alias("u"),
            F.get_json_object("val", "$.ts").cast("timestamp").alias("ts"),
            F.get_json_object("val", "$.e").alias("e"),
        )
        q = (
            stateful_funnel(stream, ["view", "click", "purchase"],
                            user_col="u", time_col="ts", type_col="e")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with open(f"{src}/a.ndjson", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in [
            {"u": 1, "ts": "2026-01-01T00:00:01", "e": "view"},
            {"u": 1, "ts": "2026-01-01T00:00:02", "e": "click"},
        ])
    run_once()                 # first process: reaches stage 2, then dies

    with open(f"{src}/b.ndjson", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in [
            # would be stage 1+2 again if state were lost; with state it
            # must be ignored (stage already passed) ...
            {"u": 1, "ts": "2026-01-01T00:00:09", "e": "view"},
            # ... and the purchase advances straight to stage 3
            {"u": 1, "ts": "2026-01-01T00:00:10", "e": "purchase"},
        ])
    run_once()                 # second process: resumes from checkpoint

    got = {(r["user_id"], r["stage"]): r["step_name"]
           for r in spark.read.parquet(out).collect()}
    assert got == {
        (1, 1): "view",
        (1, 2): "click",
        (1, 3): "purchase",    # resumed at stage 2 — no duplicate advances
    }


def test_stateful_funnel_drops_null_event_times(spark, tmp_path):
    """A null/NaT event time must not advance the funnel (regression:
    NaT -> astype(int64) garbage could advance stage 0), matching the
    batch funnel's null-dropping min/join semantics."""
    from confluent_data_ingestion_spark.streaming.stateful import (
        stateful_funnel,
    )

    src = str(tmp_path / "fnn_in")
    os.makedirs(src)
    with open(f"{src}/a.ndjson", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in [
            {"u": 1, "ts": None, "e": "view"},              # null ts: ignored
            {"u": 1, "ts": "2026-01-01T00:00:03", "e": "view"},
            {"u": 1, "ts": None, "e": "click"},             # null ts: ignored
            {"u": 2, "ts": None, "e": "view"},              # u2: ONLY null ts
        ])

    stream = file_envelope_stream(spark, src).select(
        F.get_json_object("val", "$.u").cast("bigint").alias("u"),
        F.get_json_object("val", "$.ts").cast("timestamp").alias("ts"),
        F.get_json_object("val", "$.e").alias("e"),
    )
    q = (
        stateful_funnel(stream, ["view", "click"],
                        user_col="u", time_col="ts", type_col="e")
        .writeStream.format("memory")
        .queryName("fnn_out")
        .option("checkpointLocation", str(tmp_path / "fnn_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["user_id"], r["stage"]): (r["step_name"], str(r["ts"]))
           for r in spark.sql("select * from fnn_out").collect()}
    # u1 advances only on its timestamped view; u2 (all-null ts) never
    # appears — neither a bogus advance row nor a garbage timestamp
    assert got == {(1, 1): ("view", "2026-01-01 00:00:03")}


# ---------------------------------------------------------------------------
# Delta backend for UpsertSnapshot
# ---------------------------------------------------------------------------
def _delta_ok(spark):
    from confluent_data_ingestion_spark.session import delta_available

    return delta_available(spark)


def test_upsert_backend_validation_and_auto_fallback(spark, tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="backend"):
        _mk_store(tmp_path, backend="iceberg")

    store = _mk_store(tmp_path, backend="auto")
    store.upsert(spark.createDataFrame([Row(k=1, seq=1, v="a")]))
    if not _delta_ok(spark):
        # sandbox has no delta-spark: auto must resolve to the parquet log
        assert store.backend == "parquet-log"
        assert store.snapshot(spark).collect()[0]["v"] == "a"

    if not _delta_ok(spark):
        hard = UpsertSnapshot(str(tmp_path / "d"), ["k"], ["seq"],
                              backend="delta")
        with _pytest.raises(RuntimeError, match="delta-spark"):
            hard.upsert(spark.createDataFrame([Row(k=1, seq=1, v="a")]))


def test_upsert_delta_merge_replay_idempotent(spark, tmp_path):
    """Delta-backend contract: latest-wins MERGE, strictly-newer condition,
    idempotent double replay (skipped where delta-spark is unavailable)."""
    import pytest as _pytest

    if not _delta_ok(spark):
        _pytest.skip("delta-spark not installed in this environment")
    store = _mk_store(tmp_path, backend="delta")
    b1 = spark.createDataFrame([Row(k=1, seq=5, v="new"), Row(k=2, seq=1, v="b")])
    b2 = spark.createDataFrame([Row(k=1, seq=3, v="stale")])
    assert store.upsert(b1, batch_id=1)
    assert store.upsert(b2, batch_id=2)      # late arrival: older seq loses
    assert not store.upsert(b1, batch_id=1)  # replay: marker skips the MERGE
    assert store.upsert(b1.selectExpr("k", "seq", "v"), batch_id=3)  # re-MERGE
    snap = {r["k"]: (r["seq"], r["v"]) for r in store.snapshot(spark).collect()}
    # double-applied newest batch is a no-op: strictly-newer keeps target
    assert snap == {1: (5, "new"), 2: (1, "b")}


def test_upsert_delta_contract_replay_idempotent_on_stub(spark, tmp_path):
    """Exactly-once contract for the delta backend WITHOUT delta-spark:
    the real ``_upsert_delta`` body (MERGE clause construction,
    strictly-newer update condition, marker replay skip) executes against
    the DataFrame-backed MERGE emulator.  Double replay is idempotent both
    via the marker (same batch_id) and via the strictly-newer MERGE
    condition (same data, new batch_id)."""
    from fake_delta import FakeDeltaStore

    store = FakeDeltaStore(str(tmp_path / "fd"), ["k"], ["seq"],
                           backend="delta")
    b1 = spark.createDataFrame([Row(k=1, seq=5, v="new"), Row(k=2, seq=1, v="b")])
    b2 = spark.createDataFrame([Row(k=1, seq=3, v="stale")])
    assert store.upsert(b1, batch_id=1)
    assert store.upsert(b2, batch_id=2)      # late arrival: older seq loses
    assert not store.upsert(b1, batch_id=1)  # replay: marker skips the MERGE
    assert store.upsert(b1, batch_id=3)      # re-MERGE: strictly-newer no-ops
    snap = {r["k"]: (r["seq"], r["v"]) for r in store.snapshot(spark).collect()}
    assert snap == {1: (5, "new"), 2: (1, "b")}


def test_upsert_delta_contract_matches_parquet_log_on_stub(spark, tmp_path):
    """Differential on the emulator: the same batch sequence through the
    parquet-log backend and the stubbed delta backend yields the same
    snapshot in both delete modes — the MERGE clauses _upsert_delta emits
    reproduce the log's ranking + tombstone semantics."""
    from fake_delta import FakeDeltaStore

    batches = [
        [Row(k=1, seq=1, v="a", deleted="false"),
         Row(k=2, seq=1, v="b", deleted="false")],
        [Row(k=1, seq=3, v="a3", deleted="false"),
         Row(k=1, seq=2, v="a2", deleted="false"),
         Row(k=3, seq=1, v="c", deleted="true")],
        [Row(k=2, seq=2, v="gone", deleted="true")],
    ]
    for mode in ("exclude", "tombstone"):
        log_store = UpsertSnapshot(
            str(tmp_path / f"stub-{mode}-log"), ["k"], ["seq"],
            delete_flag_field="deleted", delete_mode=mode,
        )
        fake_store = FakeDeltaStore(
            str(tmp_path / f"stub-{mode}-delta"), ["k"], ["seq"],
            delete_flag_field="deleted", delete_mode=mode, backend="delta",
        )
        for i, rows in enumerate(batches):
            df = spark.createDataFrame(rows)
            log_store.upsert(df, batch_id=i)
            fake_store.upsert(df, batch_id=i)
        got_log = {(r["k"], r["seq"], r["v"])
                   for r in log_store.snapshot(spark).collect()}
        got_fake = {(r["k"], r["seq"], r["v"])
                    for r in fake_store.snapshot(spark).collect()}
        assert got_fake == got_log, f"mode={mode}: {got_fake} != {got_log}"


def test_upsert_delta_auto_selection_probes_availability(spark, tmp_path, monkeypatch):
    """backend='auto' resolves via session.delta_available: patched True it
    picks delta (and the stubbed surface executes); unpatched in this
    sandbox it falls back to the parquet log (covered by
    test_upsert_backend_validation_and_auto_fallback)."""
    from fake_delta import FakeDeltaTable

    from confluent_data_ingestion_spark import session as sess

    monkeypatch.setattr(sess, "delta_available", lambda s: True)
    store = UpsertSnapshot(str(tmp_path / "auto-d"), ["k"], ["seq"],
                           backend="auto")
    monkeypatch.setattr(store, "_delta_table_api", lambda: FakeDeltaTable)
    monkeypatch.setattr(store, "_delta_io_format", lambda: "parquet")
    store.upsert(spark.createDataFrame([Row(k=1, seq=1, v="a")]), batch_id=0)
    assert store.backend == "delta"
    assert store.snapshot(spark).collect()[0]["v"] == "a"


def test_upsert_delta_matches_parquet_log_backend(spark, tmp_path):
    """Differential: the same batch sequence through both backends yields
    the same snapshot (skipped where delta-spark is unavailable)."""
    import pytest as _pytest

    if not _delta_ok(spark):
        _pytest.skip("delta-spark not installed in this environment")
    batches = [
        [Row(k=1, seq=1, v="a", deleted="false"),
         Row(k=2, seq=1, v="b", deleted="false")],
        [Row(k=1, seq=3, v="a3", deleted="false"),
         Row(k=1, seq=2, v="a2", deleted="false"),
         Row(k=3, seq=1, v="c", deleted="true")],
        [Row(k=2, seq=2, v="gone", deleted="true")],
    ]
    for mode in ("exclude", "tombstone"):
        stores = {
            b: UpsertSnapshot(str(tmp_path / f"{mode}-{b}"), ["k"], ["seq"],
                              delete_flag_field="deleted", delete_mode=mode,
                              backend=b)
            for b in ("parquet-log", "delta")
        }
        for i, rows in enumerate(batches):
            for s in stores.values():
                s.upsert(spark.createDataFrame(rows), batch_id=i)
        got = {
            b: {(r["k"], r["seq"], r["v"]) for r in s.snapshot(spark).collect()}
            for b, s in stores.items()
        }
        assert got["delta"] == got["parquet-log"], f"mode={mode}: {got}"


def test_statement_set_mid_batch_failure_exactly_once(spark, tmp_path):
    """Kill the pipeline BETWEEN sink writes inside one microbatch: the
    XREF upsert commits, then the quarantine append dies before writing.
    On restart the batch replays; the marker-commit protocol must skip the
    already-committed XREF (no duplicate log rows) and commit the
    quarantine append exactly once — per-sink exactly-once-effect (the
    reference's PR-3 idempotency requirement)."""
    src = str(tmp_path / "msgs")
    _write_envelope_files(src, n_files=2)
    dim = spark.createDataFrame([Row(id=i, segment="s") for i in range(10)])
    spec = _pipeline_spec()

    # clean reference run
    clean = StatementSetRunner(spark, spec, {"dim": dim}, str(tmp_path / "ok"))
    clean.run_streaming(file_envelope_stream(spark, src, max_files_per_trigger=1))
    clean_xref_log = clean._xref_store(
        "XREF_ACCT", spec.tables()["XREF_ACCT"]).log(spark).count()
    clean_xref = sorted(map(tuple, spark.read.parquet(
        clean.table_path("XREF_ACCT")).collect()))
    clean_q = sorted(map(tuple, spark.read.parquet(
        clean.table_path("Q_ACCT")).collect()))

    # faulty run: die after the first sink (XREF upsert) of batch 0,
    # before the quarantine append writes anything
    out = str(tmp_path / "out")
    faulty = StatementSetRunner(spark, spec, {"dim": dim}, out)

    def _boom(df, table, batch_id):
        raise RuntimeError("injected failure between sinks")

    faulty._append_once = _boom
    import pytest as _pytest

    with _pytest.raises(Exception, match="injected failure"):
        faulty.run_streaming(
            file_envelope_stream(spark, src, max_files_per_trigger=1))
    # the first sink committed before the crash
    store = faulty._xref_store("XREF_ACCT", spec.tables()["XREF_ACCT"])
    assert store.exists() and store.log(spark).count() > 0
    assert not os.path.exists(faulty.table_path("Q_ACCT"))

    # recovery: fresh runner, same out dir + checkpoint — the failed batch
    # replays from the checkpoint with the injection removed
    recovered = StatementSetRunner(spark, spec, {"dim": dim}, out)
    recovered.run_streaming(
        file_envelope_stream(spark, src, max_files_per_trigger=1))

    got_xref_log = recovered._xref_store(
        "XREF_ACCT", spec.tables()["XREF_ACCT"]).log(spark).count()
    got_xref = sorted(map(tuple, spark.read.parquet(
        recovered.table_path("XREF_ACCT")).collect()))
    got_q = sorted(map(tuple, spark.read.parquet(
        recovered.table_path("Q_ACCT")).collect()))
    # no duplicate XREF log rows (replayed batch skipped via marker), no
    # lost/duplicate quarantine rows (append committed exactly once)
    assert got_xref_log == clean_xref_log
    assert got_xref == clean_xref
    assert got_q == clean_q


# ---------------------------------------------------------------------------
# Time travel over the parquet-log store
# ---------------------------------------------------------------------------
def test_snapshot_as_of_each_append(spark, tmp_path):
    from confluent_data_ingestion_spark.streaming.upsert import UpsertSnapshot

    store = UpsertSnapshot(str(tmp_path / "tt"), keys=["k"], order_by=["seq"])
    store.upsert(spark.createDataFrame([Row(k=1, seq=1, v="a")]), batch_id="b0")
    store.upsert(spark.createDataFrame([Row(k=2, seq=1, v="b")]), batch_id="b1")
    store.upsert(spark.createDataFrame([Row(k=1, seq=2, v="a2")]), batch_id="b2")

    def snap(seq):
        return {r["k"]: r["v"] for r in store.snapshot_as_of(spark, seq).collect()}

    assert snap(0) == {1: "a"}
    assert snap(1) == {1: "a", 2: "b"}
    assert snap(2) == {1: "a2", 2: "b"}
    assert store.current_seq() == 2
    # batch ids resolve to their append sequence (string ids welcome)
    assert store.seq_of_batch("b1") == 1
    assert snap(store.seq_of_batch("b1")) == {1: "a", 2: "b"}
    # the current snapshot equals as-of(newest) and carries no __seq column
    cur = store.snapshot(spark)
    assert "__seq" not in cur.columns
    assert {r["k"]: r["v"] for r in cur.collect()} == snap(2)


def test_snapshot_as_of_is_partition_pruned(spark, tmp_path):
    from confluent_data_ingestion_spark.streaming.upsert import UpsertSnapshot

    store = UpsertSnapshot(str(tmp_path / "ttp"), keys=["k"], order_by=["seq"])
    for i in range(4):
        store.upsert(spark.createDataFrame([Row(k=i, seq=1, v=str(i))]))
    plan = (
        store.snapshot_as_of(spark, 1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "__seq" in plan


def test_snapshot_as_of_below_compaction_horizon_raises(spark, tmp_path):
    from confluent_data_ingestion_spark.streaming.upsert import UpsertSnapshot

    store = UpsertSnapshot(str(tmp_path / "ttc"), keys=["k"], order_by=["seq"])
    store.upsert(spark.createDataFrame([Row(k=1, seq=1, v="a")]))
    store.upsert(spark.createDataFrame([Row(k=1, seq=2, v="a2")]))
    store.compact(spark)
    # post-compaction: current state still fully answerable at/after horizon
    assert {r["k"]: r["v"] for r in store.snapshot_as_of(spark, 1).collect()} == {
        1: "a2"
    }
    with pytest.raises(ValueError, match="compacted away"):
        store.snapshot_as_of(spark, 0)
    # appends after compaction keep time travel working forward
    store.upsert(spark.createDataFrame([Row(k=1, seq=3, v="a3")]))
    assert {r["k"]: r["v"] for r in store.snapshot_as_of(spark, 2).collect()} == {
        1: "a3"
    }


def test_legacy_v1_log_migrates_on_first_access(spark, tmp_path):
    """A store written by the pre-__seq format (bare parquet files at the
    log root) must keep working after the upgrade: the first v2 access
    folds the root files into __seq=0 instead of producing Spark's
    'Conflicting directory structures' error, snapshots are unchanged,
    and legacy markers still dedup replays but refuse seq lookups."""
    import os

    path = tmp_path / "legacy"
    store = UpsertSnapshot(str(path), ["k"], ["seq"])
    # simulate the v1 on-disk layout: appends at the log root, marker "1"
    spark.createDataFrame(
        [Row(k=1, seq=1, v="a"), Row(k=2, seq=1, v="b")]
    ).write.mode("append").parquet(store.log_dir)
    spark.createDataFrame([Row(k=1, seq=2, v="a2")]).write.mode(
        "append"
    ).parquet(store.log_dir)
    with open(store._marker("legacy-batch"), "w") as f:
        f.write("1")
    assert any(n.endswith(".parquet") for n in os.listdir(store.log_dir))

    # v2 append on top of the legacy layout: must migrate, not corrupt
    assert store.upsert(
        spark.createDataFrame([Row(k=3, seq=1, v="c")]), batch_id="b-new"
    )
    snap = {r["k"]: r["v"] for r in store.snapshot(spark).collect()}
    assert snap == {1: "a2", 2: "b", 3: "c"}
    # no bare files remain; everything lives under __seq=N partitions
    assert not any(
        n.endswith(".parquet") for n in os.listdir(store.log_dir)
    )
    assert store.log(spark).count() == 4
    # legacy marker still dedups its batch id but has no sequence
    assert store.committed("legacy-batch")
    with pytest.raises(RuntimeError, match="no append sequence"):
        store.seq_of_batch("legacy-batch")
    # the new batch's marker resolves and time travel works from it
    seq = store.seq_of_batch("b-new")
    as_of = {r["k"]: r["v"] for r in store.snapshot_as_of(spark, seq).collect()}
    assert as_of == snap
    # pre-migration history folded into one sequence: as-of it sees v1 rows
    first = {
        r["k"]: r["v"] for r in store.snapshot_as_of(spark, seq - 1).collect()
    }
    assert first == {1: "a2", 2: "b"}


def test_upsert_log_additive_schema_evolution(spark, tmp_path):
    """Columns added by later appends must survive into the snapshot
    (rows predating the column read NULL) — without mergeSchema Spark
    samples one footer and silently drops them."""
    store = UpsertSnapshot(str(tmp_path / "evo"), ["k"], ["seq"])
    store.upsert(spark.createDataFrame([Row(k=1, seq=1, v="a")]), batch_id=0)
    store.upsert(
        spark.createDataFrame([Row(k=2, seq=1, v="b", extra="X"),
                               Row(k=1, seq=2, v="a2", extra="Y")]),
        batch_id=1,
    )
    snap = {r["k"]: (r["v"], r["extra"])
            for r in store.snapshot(spark).collect()}
    assert snap == {1: ("a2", "Y"), 2: ("b", "X")}
    # time travel BEFORE the column existed: the merged schema still
    # carries it, pre-evolution rows answer NULL
    as_of0 = store.snapshot_as_of(spark, 0).collect()
    assert [(r["k"], r["v"], r["extra"]) for r in as_of0] == [(1, "a", None)]

    # compact() re-homogenizes: the rewritten log holds ONE schema (every
    # file carries the evolved column) and the snapshot is unchanged
    store.compact(spark)
    snap2 = {r["k"]: (r["v"], r["extra"])
             for r in store.snapshot(spark).collect()}
    assert snap2 == snap
    import os as _os

    part_files = [
        _os.path.join(dp, f)
        for dp, _, fs in _os.walk(store.log_dir)
        for f in fs if f.endswith(".parquet")
    ]
    for pf in part_files:
        assert "extra" in spark.read.parquet(pf).columns


def test_v1_migration_is_read_triggered_too(spark, tmp_path):
    """log()/snapshot() on a legacy store must not raise even when no new
    batch has been written yet."""
    path = tmp_path / "legacy_ro"
    store = UpsertSnapshot(str(path), ["k"], ["seq"])
    spark.createDataFrame(
        [Row(k=1, seq=1, v="a"), Row(k=1, seq=2, v="b")]
    ).write.mode("append").parquet(store.log_dir)
    snap = store.snapshot(spark).collect()
    assert len(snap) == 1 and snap[0]["v"] == "b"
