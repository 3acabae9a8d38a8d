from .runner import StatementSetRunner
from .sources import (
    parse_state_ttl,
    file_envelope_stream,
    kafka_envelope_stream,
    kafka_source_options,
    watermark_dedup,
)
from .upsert import UpsertSnapshot

__all__ = [
    "StatementSetRunner",
    "UpsertSnapshot",
    "file_envelope_stream",
    "parse_state_ttl",
    "kafka_envelope_stream",
    "kafka_source_options",
    "watermark_dedup",
]
