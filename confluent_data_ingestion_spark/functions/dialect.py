"""Flink-SQL -> Spark-SQL expression dialect translation.

The reference pipeline spec carries raw SQL expression cells written in the
Confluent Flink dialect (see SURVEY.md section 2.7; reference
``resources/output/final-output.sql`` and ``scripts/sttm_to_flink_v22.py``
for the emitted shapes).  We translate those function names/semantics to
Spark SQL *before* handing the string to ``F.expr`` so Catalyst sees a plain
native expression — no UDFs, no custom parser rules, full codegen.

Functions handled (Flink -> Spark):
  JSON_VALUE(x, path)        -> get_json_object(x, path)           (NULL-safe)
  SPLIT_INDEX(s, delim, i)   -> try_element_at(split(s, qdelim), i+1)
                                (Flink is 0-based, NULL out-of-range; Spark
                                split() takes a REGEX so the literal delimiter
                                is regex-escaped)
  REGEXP(x, pat)             -> regexp_like(x, pat)
  IS_DECIMAL(x)              -> (try_cast(x AS DECIMAL(38,10)) IS NOT NULL)
  TO_TIMESTAMP_LTZ(e, p)     -> timestamp_millis/seconds(try_cast(e AS BIGINT))
  TO_TIMESTAMP_LTZ(s, 'fmt') -> to_timestamp(s, 'fmt')
  CAST(x AS T)               -> TRY_CAST(x AS T) in safe mode (Flink pipelines
                                expect malformed input to become NULL, not
                                fail the job; also keeps behavior identical
                                whether or not the session runs ANSI mode)

Everything else (TRIM, NULLIF, COALESCE, CHAR_LENGTH, TO_DATE, CASE WHEN,
LIKE, literals) is already valid Spark SQL and passes through untouched.
"""

from __future__ import annotations

import re

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"


def _scan_string(s: str, i: int) -> int:
    """Given s[i] == "'", return index just past the closing quote."""
    i += 1
    while i < len(s):
        if s[i] == "'":
            if i + 1 < len(s) and s[i + 1] == "'":  # escaped ''
                i += 2
                continue
            return i + 1
        i += 1
    return len(s)


def _find_matching_paren(s: str, open_idx: int) -> int:
    """Index of the ')' matching s[open_idx] == '(' (quote-aware), or -1."""
    depth = 0
    i = open_idx
    while i < len(s):
        c = s[i]
        if c == "'":
            i = _scan_string(s, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


def split_top_level_args(s: str) -> list[str]:
    """Split an argument list string on top-level commas (quote/paren aware)."""
    args: list[str] = []
    depth = 0
    cur_start = 0
    i = 0
    while i < len(s):
        c = s[i]
        if c == "'":
            i = _scan_string(s, i)
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "," and depth == 0:
            args.append(s[cur_start:i].strip())
            cur_start = i + 1
        i += 1
    tail = s[cur_start:].strip()
    if tail or args:
        args.append(tail)
    return args


_REGEX_META = re.compile(r"[.^$*+?()\[\]{}|\\]")


def _regex_quote_literal(delim_sql: str) -> str:
    """Regex-escape a delimiter for Spark's split().

    If the argument is a plain SQL string literal we escape metacharacters
    directly; otherwise we wrap at runtime with \\Q...\\E via concat().
    """
    m = re.fullmatch(r"\s*'((?:[^']|'')*)'\s*", delim_sql)
    if m:
        lit = m.group(1)
        escaped = _REGEX_META.sub(lambda mo: "\\\\" + mo.group(0), lit)
        return f"'{escaped}'"
    return f"concat('\\\\Q', {delim_sql}, '\\\\E')"


def _rewrite_call(name: str, args: list[str], safe_cast: bool) -> str | None:
    """Return the Spark SQL replacement for one Flink call, or None to keep."""
    u = name.upper()
    if u == "JSON_VALUE" and len(args) == 2:
        return f"get_json_object({args[0]}, {args[1]})"
    if u == "SPLIT_INDEX" and len(args) == 3:
        delim = _regex_quote_literal(args[1])
        idx = args[2].strip()
        if re.fullmatch(r"\d+", idx):
            pos = str(int(idx) + 1)
        else:
            pos = f"({idx}) + 1"
        return f"try_element_at(split({args[0]}, {delim}), {pos})"
    if u == "REGEXP" and len(args) == 2:
        # Flink string literals are SQL-standard (backslash is NOT an
        # escape), Spark's default literals eat backslashes: '\d' -> 'd'.
        # Double them inside literal patterns so the regex survives.
        pat = args[1]
        m = re.fullmatch(r"\s*'((?:[^']|'')*)'\s*", pat)
        if m:
            pat = "'" + m.group(1).replace("\\", "\\\\") + "'"
        return f"regexp_like({args[0]}, {pat})"
    if u == "IS_DECIMAL" and len(args) == 1:
        return f"(try_cast({args[0]} AS DECIMAL(38,10)) IS NOT NULL)"
    if u == "TO_TIMESTAMP_LTZ" and len(args) == 2:
        second = args[1].strip()
        if re.fullmatch(r"\d+", second):  # precision arity: numeric epoch
            if int(second) == 0:
                return f"timestamp_seconds(try_cast({args[0]} AS BIGINT))"
            return f"timestamp_millis(try_cast({args[0]} AS BIGINT))"
        # format arity: SimpleDateFormat-style 'hh' (as authored in the
        # reference STTM expressions, meaning 24-hour) -> DateTimeFormatter
        # 'HH'; try_to_timestamp so malformed values NULL out under ANSI
        m = re.fullmatch(r"\s*'((?:[^']|'')*)'\s*", second)
        if m and "hh" in m.group(1) and "a" not in m.group(1):
            second = "'" + m.group(1).replace("hh", "HH") + "'"
        return f"try_to_timestamp({args[0]}, {second})"
    if u == "CAST" and safe_cast and len(args) == 1:
        # CAST has 'x AS T' as a single "argument"
        return f"TRY_CAST({args[0]})"
    return None


_TRANSLATED = ("JSON_VALUE", "SPLIT_INDEX", "REGEXP", "IS_DECIMAL", "TO_TIMESTAMP_LTZ", "CAST")


def translate_expr(sql: str, safe_cast: bool = True) -> str:
    """Translate a Flink-dialect SQL expression string into Spark SQL.

    Works inside arbitrarily nested expressions; quote-aware; idempotent on
    already-Spark expressions.  ``safe_cast=True`` additionally converts
    CAST -> TRY_CAST so malformed data degrades to NULL (streaming-pipeline
    semantics; reference requirement ``resources/requirements.txt:50-51``
    routes bad records to error flows instead of failing).
    """
    pattern = re.compile(
        r"\b(" + "|".join(_TRANSLATED) + r")\s*\(", re.IGNORECASE
    )
    # Iterate until fixpoint (handles nested translated calls).
    changed = True
    guard = 0
    while changed and guard < 50:
        changed = False
        guard += 1
        out: list[str] = []
        i = 0
        while i < len(sql):
            c = sql[i]
            if c == "'":
                j = _scan_string(sql, i)
                out.append(sql[i:j])
                i = j
                continue
            m = pattern.match(sql, i)
            if m:
                open_idx = m.end() - 1
                close = _find_matching_paren(sql, open_idx)
                if close != -1:
                    inner = sql[open_idx + 1 : close]
                    # translate inner args first so nesting resolves bottom-up
                    inner_t = translate_expr(inner, safe_cast=safe_cast)
                    args = split_top_level_args(inner_t)
                    repl = _rewrite_call(m.group(1), args, safe_cast)
                    if repl is not None:
                        out.append(repl)
                        i = close + 1
                        changed = True
                        continue
            out.append(c)
            i += 1
        sql = "".join(out)
    return sql
