"""Connector-config surface: declarative object-store <-> Kafka I/O specs
compiled to Spark reader/writer configurations.

Mirrors the reference's pydantic connector models and validation rules
(``scripts/gcs_config_generator.py:100-210``,
``sttm2flink-ui-5_4/connector_config/models.py:8-59``) — same field surface
(dotted Connect property names as aliases), same cross-field rules — but the
render target is a Spark execution plan instead of a Kafka-Connect worker
JSON:

 - source spec  -> ``spark.read[Stream]`` format/path/options (a directory
   stream is the cloud-files pattern; ``poll.interval.ms`` -> processing-time
   trigger)
 - sink spec    -> ``df.write[Stream]`` format/path/options + time-based
   directory partitioning (``time.path.format``), file sizing
   (``flush.size`` -> maxRecordsPerFile), rotation (``rotate.interval.ms``
   -> trigger), MaskField SMT -> the FGAC column-masking operator, DLQ
   tolerance -> corrupt-record split.

Scale notes: directory-stream listing cost is bounded by
``maxFilesPerTrigger``; sink files are bounded by ``maxRecordsPerFile`` so a
1000-executor write produces predictable file sizes; time partitioning
yields partition-pruned reads downstream.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Literal, Optional

from pydantic import BaseModel, Field, field_validator, model_validator

AllowedStatus = Literal["RUNNING", "PAUSED"]
AllowedEnv = Literal["dev", "test", "stage", "prod"]
AllowedFormats = Literal["JSON", "AVRO", "PARQUET", "CSV", "STRING"]
AllowedTimeInterval = Literal["MINUTE", "HOURLY", "DAILY"]

_SPARK_FORMAT = {
    "JSON": "json",
    "AVRO": "avro",
    "PARQUET": "parquet",
    "CSV": "csv",
    "STRING": "text",
}


class ConnectorCommon(BaseModel):
    connector_type: Literal["sink", "source"]
    name: str
    cloud_environment: AllowedEnv = Field(default="dev", alias="cloud.environment")
    cloud_provider: str = Field(default="gcp", alias="cloud.provider")
    kafka_endpoint: Optional[str] = Field(default=None, alias="kafka.endpoint")
    kafka_region: Optional[str] = Field(default=None, alias="kafka.region")
    kafka_auth_mode: str = Field(default="SERVICE_ACCOUNT", alias="kafka.auth.mode")
    kafka_service_account_id: Optional[str] = Field(
        default=None, alias="kafka.service.account.id")
    topics_dir: str = Field(default="topics", alias="topics.dir")
    tasks_max: int = Field(default=1, alias="tasks.max")
    status: AllowedStatus = "PAUSED"

    model_config = {"populate_by_name": True}

    @field_validator("kafka_endpoint")
    @classmethod
    def _endpoint(cls, v):
        if v is not None and ("://" not in v or not v.endswith(":9092")):
            raise ValueError(
                "kafka.endpoint should include scheme and end with :9092"
            )
        return v

    @field_validator("tasks_max")
    @classmethod
    def _tasks(cls, v):
        if int(v) <= 0:
            raise ValueError("tasks.max must be positive")
        return int(v)


class SourceConnectorSpec(ConnectorCommon):
    """Object store -> topic/table source (reference S4)."""

    connector_type: Literal["source"] = "source"
    bucket_name: str = Field(alias="gcs.bucket.name")
    input_data_format: AllowedFormats = Field(alias="input.data.format")
    output_data_format: AllowedFormats = Field(default="JSON", alias="output.data.format")
    topics: Optional[str] = None
    topic_regex_list: Optional[str] = Field(default=None, alias="topic-regex.list")
    gcs_credentials_json: Optional[str] = Field(
        default=None, alias="gcs.credentials.json")
    value_converter_decimal_format: Optional[Literal["NUMERIC", "STRING"]] = Field(
        default=None, alias="value.converter.decimal.format")
    value_converter_replace_null: Optional[Literal["true", "false"]] = Field(
        default=None, alias="value.converter.replace.null.with.default")
    gcs_pattern: Optional[str] = Field(default=None, alias="gcs.pattern")
    file_regex: Optional[str] = Field(default=None, alias="file.regex")
    poll_interval_ms: Optional[int] = Field(default=None, alias="poll.interval.ms")
    csv_delimiter: str = ","

    @model_validator(mode="after")
    def _topics_or_regex(self):
        if not self.topics and not self.topic_regex_list:
            raise ValueError("Provide either 'topics' or 'topic-regex.list'")
        return self

    @field_validator("poll_interval_ms")
    @classmethod
    def _poll(cls, v):
        if v is not None and int(v) <= 0:
            raise ValueError("poll.interval.ms must be positive")
        return v


class SinkConnectorSpec(ConnectorCommon):
    """Topic/table -> object store sink (reference S5)."""

    connector_type: Literal["sink"] = "sink"
    topics: str
    bucket_name: str = Field(alias="gcs.bucket.name")
    input_data_format: AllowedFormats = Field(alias="input.data.format")
    output_data_format: AllowedFormats = Field(alias="output.data.format")
    time_interval: Optional[AllowedTimeInterval] = Field(default=None, alias="time.interval")
    timezone: Optional[str] = None
    transforms: Optional[str] = None
    transforms_maskfield_fields: Optional[str] = Field(
        default=None, alias="transforms.MaskField.fields")
    transforms_maskfield_type: Optional[str] = Field(
        default=None, alias="transforms.MaskField.type")
    flush_size: Optional[int] = Field(default=None, alias="flush.size")
    rotate_interval_ms: Optional[int] = Field(default=None, alias="rotate.interval.ms")
    rotate_schedule_interval_ms: Optional[int] = Field(
        default=None, alias="rotate.schedule.interval.ms")
    time_partition_duration_ms: Optional[int] = Field(
        default=None, alias="time.partition.duration.ms")
    time_path_format: Optional[str] = Field(default=None, alias="time.path.format")
    filename_template: Optional[str] = Field(default=None, alias="filename.template")
    gcs_credentials_config: Optional[str] = Field(
        default=None, alias="gcs.credentials.config")
    compression: Optional[Literal["none", "gz", "snappy"]] = None
    errors_tolerance: Optional[Literal["none", "all"]] = Field(
        default=None, alias="errors.tolerance")
    errors_log_enable: Optional[Literal["true", "false"]] = Field(
        default=None, alias="errors.log.enable")
    errors_dlq_headers_enable: Optional[Literal["true", "false"]] = Field(
        default=None, alias="errors.deadletterqueue.context.headers.enable")

    @model_validator(mode="after")
    def _mask_rules(self):
        if self.transforms and "MaskField" in self.transforms:
            if not self.transforms_maskfield_fields:
                raise ValueError(
                    "MaskField configured but transforms.MaskField.fields is blank")
            if not self.transforms_maskfield_type or "$" not in self.transforms_maskfield_type:
                raise ValueError(
                    "MaskField type should look like "
                    "org.apache.kafka.connect.transforms.MaskField$Value")
        return self

    @field_validator("flush_size", "rotate_interval_ms",
                     "rotate_schedule_interval_ms", "time_partition_duration_ms")
    @classmethod
    def _pos(cls, v):
        if v is not None and int(v) <= 0:
            raise ValueError("Must be a positive integer")
        return v


# ---------------------------------------------------------------------------
# Compilation to Spark reader/writer configs
# ---------------------------------------------------------------------------
@dataclass
class SourceConfig:
    format: str
    path: str
    options: dict = field(default_factory=dict)
    trigger_processing_time: str | None = None
    payload_col: str | None = None  # set for STRING format (envelope shape)


@dataclass
class SinkConfig:
    format: str
    path: str
    options: dict = field(default_factory=dict)
    partition_cols: list[str] = field(default_factory=list)
    trigger_processing_time: str | None = None
    mask_fields: list[str] = field(default_factory=list)
    dlq_split: bool = False  # errors.tolerance=all -> split corrupt records


def compile_source(spec: SourceConnectorSpec) -> SourceConfig:
    fmt = _SPARK_FORMAT[spec.input_data_format]
    path = f"{spec.bucket_name.rstrip('/')}"
    if spec.gcs_pattern:
        path = f"{path}/{spec.gcs_pattern.lstrip('/')}"
    opts: dict = {}
    if spec.file_regex:
        opts["pathGlobFilter"] = spec.file_regex
    if fmt == "csv":
        opts["sep"] = spec.csv_delimiter
        opts["header"] = "false"
    trigger = None
    if spec.poll_interval_ms:
        trigger = f"{max(1, spec.poll_interval_ms // 1000)} seconds"
    return SourceConfig(
        format=fmt,
        path=path,
        options=opts,
        trigger_processing_time=trigger,
        payload_col="val" if fmt == "text" else None,
    )


# time.path.format like "'year'=YYYY/'month'=MM/'day'=dd/'hour'=HH" -> the
# directory partition columns to derive from the event timestamp.
_PATH_TOKENS = [
    ("YYYY", "year"), ("yyyy", "year"), ("MM", "month"),
    ("dd", "day"), ("HH", "hour"),
]


def partition_cols_from_path_format(fmt: str | None,
                                    interval: str | None) -> list[str]:
    if fmt:
        cols = []
        for token, col in _PATH_TOKENS:
            if token in fmt and col not in cols:
                cols.append(col)
        return cols
    if interval == "DAILY":
        return ["year", "month", "day"]
    if interval == "HOURLY":
        return ["year", "month", "day", "hour"]
    if interval == "MINUTE":
        return ["year", "month", "day", "hour", "minute"]
    return []


def compile_sink(spec: SinkConnectorSpec) -> SinkConfig:
    fmt = _SPARK_FORMAT[spec.output_data_format]
    path = f"{spec.bucket_name.rstrip('/')}/{spec.topics_dir.strip('/')}/{spec.topics}"
    opts: dict = {}
    if spec.flush_size:
        opts["maxRecordsPerFile"] = str(spec.flush_size)
    if spec.compression and spec.compression != "none":
        opts["compression"] = {"gz": "gzip"}.get(spec.compression, spec.compression)
    trigger = None
    if spec.rotate_interval_ms or spec.rotate_schedule_interval_ms:
        ms = spec.rotate_interval_ms or spec.rotate_schedule_interval_ms
        trigger = f"{max(1, ms // 1000)} seconds"
    masks = []
    if spec.transforms and "MaskField" in (spec.transforms or ""):
        masks = [
            c.strip() for c in (spec.transforms_maskfield_fields or "").split(",")
            if c.strip()
        ]
    return SinkConfig(
        format=fmt,
        path=path,
        options=opts,
        partition_cols=partition_cols_from_path_format(
            spec.time_path_format, spec.time_interval),
        trigger_processing_time=trigger,
        mask_fields=masks,
        dlq_split=spec.errors_tolerance == "all",
    )


# ---------------------------------------------------------------------------
# Execution helpers
# ---------------------------------------------------------------------------
def open_source(spark, spec: SourceConnectorSpec, schema=None, *,
                streaming: bool = False):
    """Materialize a source spec as a DataFrame (batch) or streaming
    DataFrame.  STRING format produces the one-column envelope shape."""
    cfg = compile_source(spec)
    reader = spark.readStream if streaming else spark.read
    reader = reader.format(cfg.format).options(**cfg.options)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load(cfg.path)
    if cfg.payload_col:
        from pyspark.sql import functions as F

        df = df.select(F.col("value").alias(cfg.payload_col))
    return df


def with_time_partitions(df, ts_col: str, cols: list[str]):
    """Derive the sink's directory-partition columns from an event
    timestamp (reference 'year'=YYYY/'month'=MM/... path format)."""
    from pyspark.sql import functions as F

    exprs = {
        "year": F.date_format(F.col(ts_col), "yyyy"),
        "month": F.date_format(F.col(ts_col), "MM"),
        "day": F.date_format(F.col(ts_col), "dd"),
        "hour": F.date_format(F.col(ts_col), "HH"),
        "minute": F.date_format(F.col(ts_col), "mm"),
    }
    for c in cols:
        df = df.withColumn(c, exprs[c])
    return df


def write_sink(df, spec: SinkConnectorSpec, *, ts_col: str | None = None):
    """Write a batch DataFrame per a sink spec: masking applied, time
    partitions derived, file size bounded.  Returns the output path."""
    from ..operators.fgac import mask_columns

    cfg = compile_sink(spec)
    if cfg.mask_fields:
        df = mask_columns(df, {c: "null" for c in cfg.mask_fields})
    if cfg.partition_cols:
        if not ts_col:
            raise ValueError("time-partitioned sink needs ts_col")
        df = with_time_partitions(df, ts_col, cfg.partition_cols)
    writer = df.write.format(cfg.format).options(**cfg.options).mode("append")
    if cfg.partition_cols:
        writer = writer.partitionBy(*cfg.partition_cols)
    writer.save(cfg.path)
    return cfg.path


def split_corrupt_json(spark, df, schema, payload_col: str = "val"):
    """DLQ pattern (reference T7): parse the payload against a schema; rows
    that fail to parse go to the dead-letter side unchanged.

    Uses the corrupt-record column convention (PERMISSIVE parse mode) —
    ``from_json`` yields an all-null struct for malformed input, so
    malformed-ness is detected via the dedicated corrupt column, not null
    fields (which legitimate sparse records also have).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    corrupt = "_corrupt_record"
    parse_schema = StructType(list(schema.fields) + [StructField(corrupt, StringType())])
    parsed = df.withColumn(
        "__parsed__",
        F.from_json(F.col(payload_col), parse_schema,
                    {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt}),
    )
    is_bad = F.col(f"__parsed__.{corrupt}").isNotNull() | F.col("__parsed__").isNull()
    good = parsed.filter(~is_bad).select(
        *[F.col(f"__parsed__.{f.name}").alias(f.name) for f in schema.fields])
    bad = parsed.filter(is_bad).drop("__parsed__")
    return good, bad
