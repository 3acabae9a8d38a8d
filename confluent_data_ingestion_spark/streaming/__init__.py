from .runner import StatementSetRunner
from .sources import (
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
    "kafka_envelope_stream",
    "kafka_source_options",
    "watermark_dedup",
]
