"""Connector-config workbook template generation.

Parity with the reference CLI's ``--make-template``
(``scripts/gcs_config_generator.py:324-410``): a starter workbook with a
``Common`` sheet (one row per connector), per-type ``GCS_Sink`` /
``GCS_Source`` sheets keyed by connector name, and a ``Notes`` sheet —
same headers, same sample rows.  Rendered with the dependency-free xlsx
writer (no openpyxl in this environment), so the dropdown data-validations
of the original are omitted; the pydantic specs enforce the same enums at
load time instead.
"""

from __future__ import annotations

from ..spec.xlsx import write_workbook

COMMON_HEADERS = [
    "connector_type", "name", "cloud.environment", "kafka.endpoint",
    "kafka.region", "kafka.service.account.id", "topics.dir", "tasks.max",
    "status",
]

SINK_HEADERS = [
    "name", "topics", "gcs.credentials.config", "gcs.bucket.name",
    "input.data.format", "output.data.format", "time.interval", "timezone",
    "transforms", "transforms.MaskField.fields", "transforms.MaskField.type",
    "flush.size", "rotate.interval.ms", "rotate.schedule.interval.ms",
    "time.partition.duration.ms", "time.path.format", "filename.template",
    "compression", "errors.tolerance", "errors.log.enable",
    "errors.deadletterqueue.context.headers.enable",
]

SOURCE_HEADERS = [
    "name", "topic-regex.list", "topics", "gcs.credentials.json",
    "gcs.bucket.name", "input.data.format", "output.data.format",
    "value.converter.decimal.format",
    "value.converter.replace.null.with.default", "gcs.pattern", "file.regex",
    "poll.interval.ms",
]

_COMMON_SAMPLES = [
    ["sink", "GcsSinkConnector_sample", "prod", "SASL_SSL://abc:9092",
     "us-east4", "sa-xxxxx", "sink", "1", "RUNNING"],
    ["source", "GcsSourceConnector_sample", "prod", "SASL_SSL://abc:9092",
     "us-east4", "sa-yyyyy", "file/splitfiles_sample", "5", "PAUSED"],
]

_SINK_SAMPLE = [
    "GcsSinkConnector_sample", "t1,t2", "secret://gcs/sink/creds",
    "bkt-d-use4-gcs-landing", "JSON", "JSON", "HOURLY", "US/Eastern",
    "MaskField", "SSN", "org.apache.kafka.connect.transforms.MaskField$Value",
    "100000", "900000", "", "3600000",
    "'year'=YYYY/'month'=MM/'day'=dd/'hour'=HH",
    "${topic}-${timestamp}.json", "gz", "all", "true", "true",
]

_SOURCE_SAMPLE = [
    "GcsSourceConnector_sample", "DATA_**", "", "secret://gcs/source/creds",
    "bkt-a-use4-gcs-landing", "STRING", "STRING", "NUMERIC", "false",
    "", "", "60000",
]

_NOTES = (
    "Instructions: 1) Fill Common (one row per connector). "
    "2) Fill the matching GCS_Sink / GCS_Source row keyed by name. "
    "3) Load with io.load_template_rows / validate with the connector specs."
)


def make_connector_template(path: str) -> str:
    """Write the starter workbook; returns ``path``."""
    write_workbook(path, {
        "Common": [COMMON_HEADERS, *_COMMON_SAMPLES],
        "GCS_Sink": [SINK_HEADERS, _SINK_SAMPLE],
        "GCS_Source": [SOURCE_HEADERS, _SOURCE_SAMPLE],
        "Notes": [[_NOTES]],
    })
    return path


def load_template_rows(path: str) -> list[dict[str, str]]:
    """Workbook -> combined per-connector config rows, the reference's
    ``build_rows`` merge (``gcs_config_generator.py:228-269``): Common row
    + the same-name row of the type sheet, empty cells dropped, sink/source
    defaults applied."""
    from ..spec.xlsx import read_records

    common = read_records(path, "Common")
    sink = {r.get("name"): r for r in read_records(path, "GCS_Sink")}
    source = {r.get("name"): r for r in read_records(path, "GCS_Source")}
    rows = []
    for c in common:
        ctype, name = c.get("connector_type", ""), c.get("name", "")
        if not ctype or not name:
            continue
        extra = (sink if ctype == "sink" else source).get(name, {})
        combined = {k: v for k, v in {**c, **extra}.items() if v != ""}
        combined.setdefault("cloud.provider", "gcp")
        combined.setdefault("kafka.auth.mode", "SERVICE_ACCOUNT")
        combined.setdefault("connector.class",
                            "GcsSink" if ctype == "sink" else "GcsSource")
        combined.setdefault("tasks.max", "1" if ctype == "sink" else "5")
        combined.setdefault("status", "PAUSED")
        rows.append(combined)
    return rows
