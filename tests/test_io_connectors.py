"""Connector-config surface: spec validation parity with the reference's
pydantic rules, compilation to Spark reader/writer configs, and actual
file-source/sink execution including DLQ split and time partitioning."""

import json
import os

import pytest
from pydantic import ValidationError
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from confluent_data_ingestion_spark.io import (
    SinkConnectorSpec,
    SourceConnectorSpec,
    compile_sink,
    compile_source,
    open_source,
    partition_cols_from_path_format,
    split_corrupt_json,
    write_sink,
)


# ---------------------------------------------------------------------------
# Validation rules (parity with gcs_config_generator cross-field checks)
# ---------------------------------------------------------------------------
def test_source_needs_topics_or_regex():
    with pytest.raises(ValidationError):
        SourceConnectorSpec(name="s", **{"gcs.bucket.name": "b",
                                         "input.data.format": "JSON"})
    ok = SourceConnectorSpec(name="s", topics="t", **{
        "gcs.bucket.name": "b", "input.data.format": "JSON"})
    assert ok.topics == "t"
    ok2 = SourceConnectorSpec(name="s", **{
        "gcs.bucket.name": "b", "input.data.format": "JSON",
        "topic-regex.list": "t.*"})
    assert ok2.topic_regex_list == "t.*"


def test_bad_kafka_endpoint_rejected():
    with pytest.raises(ValidationError):
        SourceConnectorSpec(name="s", topics="t", **{
            "gcs.bucket.name": "b", "input.data.format": "JSON",
            "kafka.endpoint": "nohost"})
    ok = SourceConnectorSpec(name="s", topics="t", **{
        "gcs.bucket.name": "b", "input.data.format": "JSON",
        "kafka.endpoint": "SASL_SSL://x:9092"})
    assert ok.kafka_endpoint.endswith(":9092")


def test_maskfield_cross_rules():
    base = dict(name="k", topics="t", **{
        "gcs.bucket.name": "b", "input.data.format": "JSON",
        "output.data.format": "PARQUET"})
    with pytest.raises(ValidationError):  # MaskField without fields
        SinkConnectorSpec(transforms="MaskField", **base)
    with pytest.raises(ValidationError):  # type missing $
        SinkConnectorSpec(
            transforms="MaskField",
            **{"transforms.MaskField.fields": "ssn",
               "transforms.MaskField.type": "bad"}, **base)
    ok = SinkConnectorSpec(
        transforms="MaskField",
        **{"transforms.MaskField.fields": "ssn,email",
           "transforms.MaskField.type":
               "org.apache.kafka.connect.transforms.MaskField$Value"}, **base)
    assert compile_sink(ok).mask_fields == ["ssn", "email"]


def test_positive_int_rules():
    base = dict(name="k", topics="t", **{
        "gcs.bucket.name": "b", "input.data.format": "JSON",
        "output.data.format": "PARQUET"})
    with pytest.raises(ValidationError):
        SinkConnectorSpec(**{"flush.size": 0}, **base)


# ---------------------------------------------------------------------------
# Compilation
# ---------------------------------------------------------------------------
def test_compile_source_options():
    spec = SourceConnectorSpec(name="s", topics="t", csv_delimiter="|", **{
        "gcs.bucket.name": "/data/in", "input.data.format": "CSV",
        "gcs.pattern": "incoming/*.csv", "file.regex": "*.csv",
        "poll.interval.ms": 60000})
    cfg = compile_source(spec)
    assert cfg.format == "csv" and cfg.path == "/data/in/incoming/*.csv"
    assert cfg.options["sep"] == "|"
    assert cfg.trigger_processing_time == "60 seconds"
    # STRING -> envelope shape
    s2 = SourceConnectorSpec(name="s", topics="t", **{
        "gcs.bucket.name": "b", "input.data.format": "STRING"})
    assert compile_source(s2).payload_col == "val"


def test_compile_sink_options_and_partitions():
    spec = SinkConnectorSpec(name="k", topics="events", compression="gz", **{
        "gcs.bucket.name": "/data/out", "topics.dir": "topics",
        "input.data.format": "JSON", "output.data.format": "PARQUET",
        "flush.size": 100000, "rotate.interval.ms": 900000,
        "time.path.format": "'year'=YYYY/'month'=MM/'day'=dd/'hour'=HH",
        "errors.tolerance": "all"})
    cfg = compile_sink(spec)
    assert cfg.path == "/data/out/topics/events"
    assert cfg.options == {"maxRecordsPerFile": "100000", "compression": "gzip"}
    assert cfg.partition_cols == ["year", "month", "day", "hour"]
    assert cfg.trigger_processing_time == "900 seconds"
    assert cfg.dlq_split


def test_partition_cols_from_interval():
    assert partition_cols_from_path_format(None, "DAILY") == ["year", "month", "day"]
    assert partition_cols_from_path_format(None, "MINUTE")[-1] == "minute"
    assert partition_cols_from_path_format(None, None) == []


# ---------------------------------------------------------------------------
# Execution
# ---------------------------------------------------------------------------
def test_open_source_and_dlq_split(spark, tmp_path):
    src = tmp_path / "in"
    os.makedirs(src)
    with open(src / "a.ndjson", "w") as f:
        f.write(json.dumps({"id": 1, "name": "ok"}) + "\n")
        f.write("THIS IS NOT JSON\n")
        f.write(json.dumps({"id": 2, "name": "ok2"}) + "\n")
    spec = SourceConnectorSpec(name="s", topics="t", **{
        "gcs.bucket.name": str(src), "input.data.format": "STRING"})
    env = open_source(spark, spec)
    assert env.columns == ["val"]
    schema = StructType([StructField("id", LongType()),
                         StructField("name", StringType())])
    good, bad = split_corrupt_json(spark, env, schema)
    assert sorted(r["id"] for r in good.collect()) == [1, 2]
    assert [r["val"] for r in bad.collect()] == ["THIS IS NOT JSON"]


def test_write_sink_time_partitioned_masked(spark, tmp_path):
    out = str(tmp_path / "bucket")
    spec = SinkConnectorSpec(
        name="k", topics="events", transforms="MaskField",
        **{"gcs.bucket.name": out, "input.data.format": "JSON",
           "output.data.format": "PARQUET",
           "time.interval": "DAILY", "flush.size": 10,
           "transforms.MaskField.fields": "secret",
           "transforms.MaskField.type":
               "org.apache.kafka.connect.transforms.MaskField$Value"})
    df = spark.createDataFrame([
        Row(id=1, secret="x", ts="2026-01-15 10:00:00"),
        Row(id=2, secret="y", ts="2026-02-20 11:00:00"),
    ]).withColumn("ts", F.col("ts").cast("timestamp"))
    path = write_sink(df, spec, ts_col="ts")
    back = spark.read.parquet(path)
    assert set(back.columns) >= {"id", "secret", "year", "month", "day"}
    assert all(r["secret"] is None for r in back.collect())  # masked
    # directory layout is hive-partitioned by derived time cols
    assert os.path.isdir(f"{path}/year=2026/month=01/day=15")
    assert os.path.isdir(f"{path}/year=2026/month=02/day=20")


# ---------------------------------------------------------------------------
# Kafka-Connect worker JSON artifact parity (reference
# resources/gcs-{sink,source}-connector.json, gcs_config_generator.py).
# ---------------------------------------------------------------------------
SINK_SAMPLE = "/root/reference/resources/gcs-sink-connector.json"
SOURCE_SAMPLE = "/root/reference/resources/gcs-source-connector.json"


def test_normalize_connect_keys():
    from confluent_data_ingestion_spark.io import normalize_connect_config

    raw = {
        "gcs. bucket.name": "b", "input.data. format": "JSON",
        "tasks-max": "5", "cloud provider": "gcp",
        "topic-regex. list": "X**", "gcs credentials.json": "c",
        "value.converter.replace.null.with.default": "False",
    }
    got = normalize_connect_config(raw)
    assert got == {
        "gcs.bucket.name": "b", "input.data.format": "JSON",
        "tasks.max": "5", "cloud.provider": "gcp",
        "topic-regex.list": "X**", "gcs.credentials.json": "c",
        "value.converter.replace.null.with.default": "false",
    }


@pytest.mark.skipif(not os.path.exists(SINK_SAMPLE), reason="reference absent")
def test_connect_json_round_trip_sink_sample():
    import json as _json

    from confluent_data_ingestion_spark.io import (
        load_connect_spec,
        normalize_connect_config,
        render_connect_json,
    )

    with open(SINK_SAMPLE) as f:
        raw = _json.load(f)
    spec = load_connect_spec(raw)
    assert spec.connector_type == "sink"
    assert spec.transforms_maskfield_fields == "DTL CAPXACTION"
    rendered = render_connect_json(spec)
    assert rendered == dict(sorted(normalize_connect_config(raw).items()))


@pytest.mark.skipif(not os.path.exists(SOURCE_SAMPLE), reason="reference absent")
def test_connect_json_round_trip_source_sample():
    import json as _json

    from confluent_data_ingestion_spark.io import (
        load_connect_spec,
        normalize_connect_config,
        render_connect_json,
    )

    with open(SOURCE_SAMPLE) as f:
        raw = _json.load(f)
    spec = load_connect_spec(raw)
    assert spec.connector_type == "source"
    assert spec.topic_regex_list == "CBA_CI_HST**"
    assert spec.value_converter_replace_null == "false"
    rendered = render_connect_json(spec)
    assert rendered == dict(sorted(normalize_connect_config(raw).items()))


def test_render_connect_json_defaults_and_redaction():
    from confluent_data_ingestion_spark.io import render_connect_json

    spec = SinkConnectorSpec(
        name="s", topics="t1",
        **{"gcs.bucket.name": "bkt", "input.data.format": "JSON",
           "output.data.format": "JSON",
           "gcs.credentials.config": "super-secret"})
    cfg = render_connect_json(spec, redact=True)
    assert cfg["connector.class"] == "GcsSink"
    assert cfg["cloud.provider"] == "gcp"
    assert cfg["kafka.auth.mode"] == "SERVICE_ACCOUNT"
    assert cfg["gcs.credentials.config"] == "****************"
    assert "status" not in cfg and "connector_type" not in cfg
    assert all(isinstance(v, str) for v in cfg.values())
    assert list(cfg) == sorted(cfg)


# ---------------------------------------------------------------------------
# Template workbook generation (reference --make-template parity) + the
# dependency-free xlsx writer round trip.
# ---------------------------------------------------------------------------
def test_xlsx_writer_round_trip(tmp_path):
    from confluent_data_ingestion_spark.spec.xlsx import (
        read_records,
        read_sheet,
        sheet_names,
        write_workbook,
    )

    p = str(tmp_path / "t.xlsx")
    write_workbook(p, {
        "S1": [["a", "b&c", "n"], ["x <tag>", True, 1.5], ["", None, 7]],
        "Empty": [],
    })
    assert sheet_names(p) == ["S1", "Empty"]
    grid = read_sheet(p, "S1")
    assert grid[0] == ["a", "b&c", "n"]
    assert grid[1] == ["x <tag>", True, 1.5]
    assert grid[2] == [None, None, 7]   # empty cells read back as None
    recs = read_records(p, "S1")
    assert recs[0] == {"a": "x <tag>", "b&c": "True", "n": "1.5"}


def test_make_connector_template_round_trip(tmp_path):
    from confluent_data_ingestion_spark.io import (
        load_connect_spec,
        load_template_rows,
        make_connector_template,
    )
    from confluent_data_ingestion_spark.spec.xlsx import sheet_names

    p = make_connector_template(str(tmp_path / "connectors.xlsx"))
    assert sheet_names(p) == ["Common", "GCS_Sink", "GCS_Source", "Notes"]
    rows = load_template_rows(p)
    assert [r["connector_type"] for r in rows] == ["sink", "source"]
    # the sample rows validate as real connector specs with the defaults
    sink = load_connect_spec(rows[0])
    assert sink.connector_type == "sink"
    assert sink.transforms_maskfield_fields == "SSN"
    assert sink.flush_size == 100000
    source = load_connect_spec(rows[1])
    assert source.connector_type == "source"
    assert source.topic_regex_list == "DATA_**"
    assert source.poll_interval_ms == 60000
    assert source.tasks_max == 5
