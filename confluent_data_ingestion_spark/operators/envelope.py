"""Envelope -> typed view operators.

A raw stream table is one opaque payload column (default ``val``) carrying a
multi-table JSON or CSV record; a discriminator identifies the logical table
(reference semantics: ``resources/output/final-output.sql:3-11``,
``scripts/sttm_to_flink_v22.py:218-228``, ``resources/sql/history-queries.sql``).

Scale notes:
 - Discriminator filters and column extraction are plain Catalyst expressions,
   so predicate pushdown + column pruning reach the source scan; each logical
   view only pays for its own messages.
 - ``json_view``'s default mode parses the payload ONCE with ``from_json``
   into a struct and projects fields out of it — N x cheaper than N
   ``get_json_object`` calls, which would each re-parse the payload.  Set
   ``single_parse=False`` to force per-field JSON_VALUE parity mode.
 - Everything is JVM-side whole-stage-codegen; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..functions.dialect import translate_expr
from ..functions.exprs import (
    cast_wrap,
    json_path,
    normalize_type,
    rewrite_predicate_as_json,
)


def discriminator_filter(
    df: DataFrame,
    predicate: str | None = None,
    *,
    table_name: str | None = None,
    field: str = "$.tbl",
    payload_col: str = "val",
) -> DataFrame:
    """Keep only the messages belonging to one logical table.

    Either pass an explicit SQL ``predicate`` (uppercase bare tokens are
    rewritten to JSON extractions, reference P6 semantics) or a
    ``table_name`` + discriminator ``field`` for the equality form.
    """
    if predicate:
        return df.filter(F.expr(rewrite_predicate_as_json(predicate, payload_col)))
    if table_name is None:
        raise ValueError("need predicate or table_name")
    disc = F.get_json_object(F.col(payload_col).cast("string"), field)
    return df.filter(disc == F.lit(table_name))


def json_view(
    df: DataFrame,
    columns: list[tuple[str, str, str]],
    *,
    payload_col: str = "val",
    predicate: str | None = None,
    table_name: str | None = None,
    discriminator_field: str = "$.tbl",
    single_parse: bool = True,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Typed projection of a JSON envelope.

    ``columns``: list of (target_name, json_field_or_path, target_type).
    Applies the discriminator first (so parsing only pays for matching rows),
    then extracts + trims + empty->NULL + safe-casts each field (P1+P3).
    """
    if predicate or table_name:
        df = discriminator_filter(
            df, predicate, table_name=table_name, field=discriminator_field,
            payload_col=payload_col,
        )
    payload = F.col(payload_col).cast("string")
    out: list[Column] = []
    simple = [c for c in columns if not c[1].startswith("$")]
    use_struct = single_parse and len(simple) == len(columns)
    if use_struct:
        # One from_json parse; fields come out as strings then get the same
        # trim/nullif/cast normalization as the per-field path.
        schema = StructType([StructField(f, StringType()) for _, f, _ in columns])
        parsed = F.from_json(payload, schema)
        df = df.withColumn("__parsed__", parsed)
        for name, field, ttype in columns:
            raw = f"__parsed__.`{field}`"
            out.append(F.expr(translate_expr(cast_wrap(raw, ttype))).alias(name))
        projected = df.select(*([F.col(k) for k in (keep_cols or [])] + out))
        return projected
    for name, field, ttype in columns:
        path = field if field.startswith("$") else json_path(field)
        raw = f"get_json_object(CAST({payload_col} AS STRING), '{path}')"
        out.append(F.expr(translate_expr(cast_wrap(raw, ttype))).alias(name))
    return df.select(*([F.col(k) for k in (keep_cols or [])] + out))


def csv_view(
    df: DataFrame,
    columns: list[tuple[str, int, str]],
    *,
    payload_col: str = "val",
    delimiter: str = ",",
    predicate: str | None = None,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Typed projection of a positional CSV envelope (P2+P3).

    ``columns``: list of (target_name, zero_based_index, target_type).
    The payload is split ONCE into an array column, then each position is
    picked with try_element_at (out-of-range -> NULL, Flink SPLIT_INDEX
    parity) and normalized with the trim/empty->NULL/safe-cast rule.
    """
    if predicate:
        df = df.filter(F.expr(rewrite_predicate_as_json(predicate, payload_col)))
    delim_sql = delimiter.replace("'", "''")
    from ..functions.dialect import _regex_quote_literal  # shared escaping

    qdelim = _regex_quote_literal(f"'{delim_sql}'")
    df = df.withColumn(
        "__parts__", F.expr(f"split(CAST({payload_col} AS STRING), {qdelim})")
    )
    out = []
    for name, idx, ttype in columns:
        raw = f"try_element_at(__parts__, {int(idx) + 1})"
        out.append(F.expr(translate_expr(cast_wrap(raw, ttype))).alias(name))
    return df.select(*([F.col(k) for k in (keep_cols or [])] + out))
