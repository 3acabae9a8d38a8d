"""Per-column expression building: precedence, auto-extraction, cast wrapping,
and predicate sanitation/rewriting.

Semantics mirrored from the reference generator (SURVEY.md section 2.2):
 - precedence  ExprOverride > SourceTransformExpr > auto(MessageFormat +
   FieldSelector)        (reference ``scripts/sttm_to_flink_v22.py:116-157``)
 - auto JSON   JSON_VALUE on the payload column, bracket-notation escaping
   for keys needing it   (``scripts/sttm_to_flink_v22.py:54-67``)
 - auto CSV    SPLIT_INDEX positional extraction
 - cast wrap   strings -> CAST(TRIM(x) AS STRING); other types ->
   CAST(NULLIF(TRIM(x), '') AS T) — empty string must become NULL before the
   cast (``scripts/sttm_to_flink_v22.py:146-147``), and with safe casts a
   malformed value becomes NULL rather than an error
 - predicate sanitation: strip leading WHERE/AND/OR and trailing ';'
   (``scripts/sttm_to_flink_v22.py:69-77``)
 - discriminator-predicate token rewrite: bare UPPERCASE column-ish tokens
   outside quotes become JSON extractions on the payload
   (``scripts/sttm_to_flink_v22.py:79-112``)
"""

from __future__ import annotations

import re

from .dialect import translate_expr

# SQL keywords / function names that must never be rewritten to JSON paths in
# discriminator predicates (mirrors the reference's reserved set).
_RESERVED = {
    "AND", "OR", "NOT", "NULL", "IS", "IN", "LIKE", "BETWEEN", "EXISTS",
    "CASE", "WHEN", "THEN", "ELSE", "END", "TRUE", "FALSE", "CAST", "AS",
    "TRIM", "UPPER", "LOWER", "COALESCE", "NULLIF", "SUBSTRING", "CONCAT",
    "JSON_VALUE", "SPLIT_INDEX", "REGEXP", "CHAR_LENGTH", "TO_DATE",
    "TO_TIMESTAMP_LTZ", "ESCAPE", "DISTINCT", "INT", "BIGINT", "STRING",
    "DOUBLE", "DATE", "TIMESTAMP", "BOOLEAN", "DECIMAL", "VARCHAR",
}

_SIMPLE_KEY = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def json_path(field: str) -> str:
    """$.field, with bracket notation for keys that aren't simple identifiers."""
    if _SIMPLE_KEY.match(field):
        return f"$.{field}"
    escaped = field.replace("'", "\\'")
    return f"$['{escaped}']"


def auto_expr(field_selector: str, message_format: str, payload_col: str = "val",
              delimiter: str = ",", source_field: str | None = None) -> str:
    """Auto extraction expression for a column with no explicit expression.

    JSON: the field key is ``source_field`` when given (v22 workbooks put
    the payload column in FieldSelector and the key in SourceField,
    reference ``sttm_to_flink_v22.py:131-135``), else ``field_selector``.
    CSV: ``field_selector`` is the position; ``source_field`` (if given) is
    the column being split, else the payload column.
    """
    fmt = (message_format or "JSON").strip().upper()
    if fmt == "CSV":
        base = source_field or payload_col
        return f"SPLIT_INDEX(CAST({base} AS STRING), '{delimiter}', {int(field_selector)})"
    sel = (source_field or field_selector or "").strip()
    path = sel if sel.startswith("$") else json_path(sel)
    return f"JSON_VALUE(CAST({payload_col} AS STRING), '{path}')"


_STRING_TYPES = re.compile(r"^\s*(STRING|VARCHAR|CHAR|TEXT)\s*(\(\s*\d+\s*\))?\s*$", re.I)


def normalize_type(t: str | None) -> str:
    """Normalize an STTM TargetDataType to a Spark SQL type string."""
    if not t or not str(t).strip():
        return "STRING"
    s = str(t).strip().upper()
    m = re.match(r"^DECIMAL\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$", s)
    if m:
        return f"DECIMAL({m.group(1)},{m.group(2)})"
    base = re.sub(r"\(.*\)$", "", s).strip()
    mapping = {
        "VARCHAR": "STRING", "CHAR": "STRING", "TEXT": "STRING", "STRING": "STRING",
        "INT": "INT", "INTEGER": "INT", "SMALLINT": "INT", "TINYINT": "INT",
        "BIGINT": "BIGINT", "LONG": "BIGINT",
        "DOUBLE": "DOUBLE", "FLOAT": "DOUBLE", "REAL": "DOUBLE",
        "DATE": "DATE",
        "TIMESTAMP": "TIMESTAMP", "DATETIME": "TIMESTAMP", "TIMESTAMP_LTZ": "TIMESTAMP",
        "BOOLEAN": "BOOLEAN", "BOOL": "BOOLEAN",
        "DECIMAL": "DECIMAL(38,10)", "NUMERIC": "DECIMAL(38,10)",
    }
    return mapping.get(base, "STRING")


def cast_wrap(expr: str, target_type: str | None) -> str:
    """Wrap an extraction expression with the reference's cast/normalize rule.

    Strings: trim only.  Non-strings: empty-after-trim -> NULL, then a safe
    cast to the target type.  If the user expression already starts with
    CAST(/TRY_CAST( it is passed through untouched (reference addendum rule).
    """
    stripped = expr.strip()
    if re.match(r"^(TRY_)?CAST\s*\(", stripped, re.I):
        return stripped
    t = normalize_type(target_type)
    if _STRING_TYPES.match(t):
        return f"CAST(TRIM({stripped}) AS STRING)"
    return f"CAST(NULLIF(TRIM({stripped}), '') AS {t})"


def choose_expr(
    expr_override: str | None,
    source_transform_expr: str | None,
    field_selector: str | None,
    message_format: str | None,
    target_type: str | None,
    payload_col: str = "val",
    delimiter: str = ",",
    source_field: str | None = None,
) -> str:
    """Build the final Spark SQL expression for one target column.

    Precedence: ExprOverride > SourceTransformExpr > auto(format+selector).
    Explicit expressions get an auto-CAST to the target type unless they
    already start with CAST( (reference ``sttm_to_flink_v22.py:116-157``).
    Returns Spark SQL (dialect-translated).
    """
    expr_override = (expr_override or "").strip()
    source_transform_expr = (source_transform_expr or "").strip()
    has_selector = (
        (field_selector is not None and str(field_selector).strip() != "")
        or (source_field is not None and str(source_field).strip() != "")
    )
    if expr_override:
        chosen = expr_override
        wrapped = _autocast_explicit(chosen, target_type)
    elif source_transform_expr:
        chosen = source_transform_expr
        wrapped = _autocast_explicit(chosen, target_type)
    elif has_selector:
        chosen = auto_expr(str(field_selector or ""), message_format or "JSON",
                           payload_col, delimiter, source_field=source_field)
        wrapped = cast_wrap(chosen, target_type)
    else:
        wrapped = f"CAST(NULL AS {normalize_type(target_type)})"
    return translate_expr(wrapped)


def _autocast_explicit(expr: str, target_type: str | None) -> str:
    if re.match(r"^(TRY_)?CAST\s*\(", expr, re.I):
        return expr
    return f"CAST({expr} AS {normalize_type(target_type)})"


def sanitize_predicate(pred: str) -> str:
    """Strip leading WHERE/AND/OR and trailing ';' from a filter cell."""
    p = (pred or "").strip().rstrip(";").strip()
    p = re.sub(r"^(WHERE|AND|OR)\b\s*", "", p, flags=re.I)
    return p.strip()


def combine_predicates(preds: list[str]) -> str | None:
    """Sanitize, dedupe (order-preserving), and AND-join row predicates."""
    seen: list[str] = []
    for p in preds:
        s = sanitize_predicate(p)
        if s and s not in seen:
            seen.append(s)
    if not seen:
        return None
    if len(seen) == 1:
        return seen[0]
    return " AND ".join(f"({p})" for p in seen)


_TOKEN = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def rewrite_predicate_as_json(pred: str, payload_col: str = "val") -> str:
    """Rewrite bare UPPERCASE tokens in a view discriminator predicate into
    JSON extractions on the payload column.

    Heuristic (kept spec-compatible with the reference): a token is rewritten
    iff it is fully uppercase, not reserved, not followed by '(', and either
    longer than 3 chars or contains '_'.  Tokens inside string literals are
    untouched.  Returns Spark SQL.
    """
    out: list[str] = []
    i = 0
    while i < len(pred):
        c = pred[i]
        if c == "'":
            j = i + 1
            while j < len(pred) and pred[j] != "'":
                j += 1
            out.append(pred[i : j + 1])
            i = j + 1
            continue
        m = _TOKEN.match(pred, i)
        if m:
            tok = m.group(0)
            nxt = pred[m.end() : m.end() + 1]
            is_call = nxt == "("
            if (
                tok.upper() == tok
                and tok.upper() not in _RESERVED
                and not is_call
                and (len(tok) > 3 or "_" in tok)
                and not tok.isdigit()
            ):
                out.append(
                    f"get_json_object(CAST({payload_col} AS STRING), '{json_path(tok)}')"
                )
            else:
                out.append(tok)
            i = m.end()
            continue
        out.append(c)
        i += 1
    return translate_expr("".join(out), safe_cast=False)
