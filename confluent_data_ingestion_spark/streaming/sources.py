"""Streaming envelope sources.

The reference models a Kafka topic as a one-column table whose ``val``
column holds the raw message payload (``scripts/sttm_to_flink_v22.py:306``,
``resources/output/final-output.sql:5-11``).  Both sources below produce
exactly that shape — a streaming DataFrame with a single string payload
column — so every downstream stage (view projection, XREF dedup, FGAC) is
identical between batch and streaming.

Scale notes: the file source lists + splits files across executors (no
driver data path); ``maxFilesPerTrigger`` bounds per-microbatch volume the
same way Kafka's ``maxOffsetsPerTrigger`` does.  Kafka partitions map 1:1 to
Spark input partitions — repartitioning after the scan is only needed when
topic partitioning is skewed relative to the business key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_envelope_stream(
    spark: SparkSession,
    path: str,
    *,
    payload_col: str = "val",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream a directory of newline-delimited message files (NDJSON or
    CSV lines) as a one-payload-column envelope — the file-based stand-in
    for a Kafka topic (and the test harness for the streaming runtime)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path).select(F.col("value").alias(payload_col))


def kafka_source_options(
    bootstrap_servers: str,
    topics: str | list[str] | None = None,
    *,
    topic_pattern: str | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
) -> dict[str, str]:
    """Kafka reader options for the raw-topic scan (reference S1).

    Mirrors the connector surface: ``topics`` / ``topics.regex``
    (``scripts/gcs_config_generator.py:183-210``) map to Spark's
    ``subscribe`` / ``subscribePattern``.
    """
    if (topics is None) == (topic_pattern is None):
        raise ValueError("exactly one of topics / topic_pattern is required")
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if topics is not None:
        opts["subscribe"] = ",".join(topics) if isinstance(topics, list) else topics
    else:
        opts["subscribePattern"] = topic_pattern
    if max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_envelope_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str | list[str] | None = None,
    *,
    payload_col: str = "val",
    format_name: str = "kafka",
    **kwargs,
) -> DataFrame:
    """`readStream.format("kafka")` -> one-string-column envelope.

    ``format_name`` exists for contract testing: Spark reserves the
    source name ``kafka`` (a Python Data Source cannot shadow it), so the
    test suite registers a fake Python source serving the real Kafka wire
    schema under another name and injects it here — everything else
    (option construction, load, value->payload projection) is the
    production path.  Against a real broker the default needs the
    spark-sql-kafka connector package on the classpath.
    """
    opts = kafka_source_options(bootstrap_servers, topics, **kwargs)
    return (
        spark.readStream.format(format_name)
        .options(**opts)
        .load()
        .select(F.col("value").cast("string").alias(payload_col))
    )


_TTL_UNITS = {
    "ms": "milliseconds", "millisecond": "milliseconds", "milliseconds": "milliseconds",
    "s": "seconds", "sec": "seconds", "second": "seconds", "seconds": "seconds",
    "min": "minutes", "minute": "minutes", "minutes": "minutes",
    "h": "hours", "hour": "hours", "hours": "hours",
    "d": "days", "day": "days", "days": "days",
}


def parse_state_ttl(ttl: str) -> str | None:
    """Flink per-statement state-TTL hint (reference T2,
    ``resources/sql/xref-queries.sql:69-70``: ``set 'sql.state.ttl' = '5
    min'``) -> a Spark watermark delay string.

    Spark's keyed streaming state is bounded by the watermark horizon, so
    the TTL maps onto the delay passed to :func:`watermark_dedup` /
    ``withWatermark``.  ``'0 ms'`` (Flink: keep state forever) returns
    None — no watermark, state retained for the life of the query.
    """
    import re as _re

    m = _re.fullmatch(r"\s*(\d+)\s*([A-Za-z]+)\s*", ttl or "")
    if not m:
        raise ValueError(f"unparseable state TTL {ttl!r}")
    n, unit = int(m.group(1)), m.group(2).lower()
    if unit not in _TTL_UNITS:
        raise ValueError(f"unknown TTL unit {unit!r}")
    if n == 0:
        return None
    return f"{n} {_TTL_UNITS[unit]}"


def watermark_dedup(
    df: DataFrame, keys: list[str], ts_col: str, delay: str
) -> DataFrame:
    """Streaming duplicate elimination with bounded state (reference T4):
    late/duplicate records within the watermark horizon are collapsed by
    key; state for a key is dropped once the watermark passes it.  This is
    the unbounded-stream complement of the batch latest-by-key dedup."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
