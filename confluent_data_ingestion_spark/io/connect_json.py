"""Kafka-Connect worker JSON artifact parity.

The reference ships real connector JSON artifacts
(``resources/gcs-sink-connector.json`` / ``gcs-source-connector.json``) and
renders them from spreadsheet rows (``scripts/gcs_config_generator.py``:
``normalize_key``:58-62, ``build_rows`` defaults :228-269,
``assemble_config``:309-312).  This module reproduces that artifact surface
from the repo's pydantic connector specs, so a user can diff our output
against a connector config exported from the Connect cluster:

 - ``normalize_connect_config``: the reference's key cleanup — collapse
   spaces around dots, alias map for the hand-mangled variants seen in the
   committed samples ("gcs. bucket name", "tasks-max", ...), boolean-ish
   value coercion — applied when ingesting an existing artifact.
 - ``render_connect_json``: spec -> the worker config dict (dotted
   property names, string values, control fields dropped, reference
   defaults applied).  ``json.dumps(..., indent=2)`` of this dict is the
   artifact file.
"""

from __future__ import annotations

import re
from typing import Any

from .connectors import ConnectorCommon, SinkConnectorSpec, SourceConnectorSpec

# reference SENSITIVE_KEYS (gcs_config_generator.py:30-37)
SENSITIVE_KEYS = {
    "gcs.credentials.config",
    "gcs.credentials.json",
    "basic.auth.user.info",
    "sasl.jaas.config",
    "kafka.api.key",
    "kafka.api.secret",
}

# reference NORMALIZE_MAP (gcs_config_generator.py:40-56): the residue the
# space-collapse regex can't fix (missing dots, dashes for dots)
_ALIAS_MAP = {
    "cloud provider": "cloud.provider",
    "gcs bucket name": "gcs.bucket.name",
    "gcs.bucket name": "gcs.bucket.name",
    "gcs credentials.json": "gcs.credentials.json",
    "input data format": "input.data.format",
    "output data format": "output.data.format",
    "output data.format": "output.data.format",
    "input data.format": "input.data.format",
    "tasks-max": "tasks.max",
    "topic-regex list": "topic-regex.list",
}

_BOOLISH_KEYS = {
    "errors.log.enable",
    "errors.deadletterqueue.context.headers.enable",
    "value.converter.replace.null.with.default",
}

_REDACTED = "****************"


def normalize_connect_key(key: str) -> str:
    """Reference ``normalize_key``: trim, collapse spaces around dots,
    collapse runs of spaces, then the residual alias map."""
    k = str(key).strip()
    k = re.sub(r"\s*\.\s*", ".", k)
    k = re.sub(r"\s{2,}", " ", k)
    return _ALIAS_MAP.get(k, k)


def _coerce_boolish(val: Any) -> str:
    s = str(val).strip().lower()
    if s in {"true", "t", "yes", "y", "1"}:
        return "true"
    if s in {"false", "f", "no", "n", "0"}:
        return "false"
    return str(val)


def normalize_connect_config(raw: dict[str, Any]) -> dict[str, str]:
    """Clean a hand-authored / exported connector config: normalized keys,
    stringified values, boolean-ish coercion.  Later duplicates win (the
    reference's dict-merge behavior)."""
    out: dict[str, str] = {}
    for k, v in raw.items():
        nk = normalize_connect_key(k)
        sv = str(v).strip()
        out[nk] = _coerce_boolish(sv) if nk in _BOOLISH_KEYS else sv
    return out


def load_connect_spec(
    raw: dict[str, Any],
) -> SourceConnectorSpec | SinkConnectorSpec:
    """Existing worker config dict -> validated spec (keys normalized
    first; connector type inferred from ``connector.class`` when the
    control field is absent)."""
    cfg = normalize_connect_config(raw)
    ctype = cfg.pop("connector_type", None)
    if ctype is None:
        klass = cfg.get("connector.class", "")
        ctype = "sink" if "sink" in klass.lower() else "source"
    cfg.pop("connector.class", None)
    model = SinkConnectorSpec if ctype == "sink" else SourceConnectorSpec
    return model.model_validate({**cfg, "connector_type": ctype})


def render_connect_json(
    spec: ConnectorCommon, redact: bool = False
) -> dict[str, str]:
    """Spec -> Kafka-Connect worker config dict, field-for-field the
    reference artifact: dotted property keys, every value a string,
    control fields (connector_type, status) dropped
    (``assemble_config``:309-312), ``connector.class`` + provider/auth
    defaults filled like ``build_rows``:256-262.  Keys sorted for a stable
    artifact diff.  ``redact=True`` masks SENSITIVE_KEYS the way the
    committed samples do."""
    dump = spec.model_dump(by_alias=True, exclude_none=True)
    dump.pop("connector_type", None)
    dump.pop("status", None)
    dump.pop("csv_delimiter", None)  # repo-internal, not a Connect property
    cfg = {k: str(v) for k, v in dump.items()}
    cfg.setdefault(
        "connector.class",
        "GcsSink" if spec.connector_type == "sink" else "GcsSource",
    )
    for k in _BOOLISH_KEYS:
        if k in cfg:
            cfg[k] = _coerce_boolish(cfg[k])
    if redact:
        for k in SENSITIVE_KEYS:
            if k in cfg:
                cfg[k] = _REDACTED
    return dict(sorted(cfg.items()))
