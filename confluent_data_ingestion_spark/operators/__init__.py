from .envelope import csv_view, discriminator_filter, json_view
from .fgac import lookup_join, mask_columns, ordered_join
from .quarantine import quarantine_antijoin
from .xref import latest_by_key
from .arms import union_arms

__all__ = [
    "json_view",
    "csv_view",
    "discriminator_filter",
    "latest_by_key",
    "lookup_join",
    "ordered_join",
    "mask_columns",
    "quarantine_antijoin",
    "union_arms",
]
