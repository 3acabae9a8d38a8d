"""Property-based tests (hypothesis) for the Flink->Spark dialect layer:
quote-awareness, idempotence, and structural invariants that must hold for
ANY expression cell a BA could type into an STTM sheet."""

import re
import string

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from confluent_data_ingestion_spark.functions.dialect import (
    split_top_level_args,
    translate_expr,
)
from confluent_data_ingestion_spark.functions.exprs import (
    json_path,
    rewrite_predicate_as_json,
    sanitize_predicate,
)

ident = st.text(alphabet=string.ascii_letters + "_", min_size=1, max_size=12)
simple_literal = st.text(
    alphabet=string.ascii_letters + string.digits + " .%_-", max_size=20)


@given(simple_literal)
@settings(max_examples=200, deadline=None)
def test_string_literals_never_translated(lit):
    """Function names inside string literals must never be rewritten."""
    sql = f"concat('JSON_VALUE(x, y)', '{lit}')"
    out = translate_expr(sql)
    assert "'JSON_VALUE(x, y)'" in out


@given(ident, simple_literal)
@settings(max_examples=200, deadline=None)
def test_translate_idempotent(col, lit):
    sql = f"JSON_VALUE(CAST({col} AS STRING), '$.{lit}')"
    once = translate_expr(sql)
    twice = translate_expr(once)
    assert once == twice


@given(st.lists(ident, min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_split_top_level_args_roundtrip(args):
    joined = ", ".join(args)
    assert [a.strip() for a in split_top_level_args(joined)] == args


@given(ident)
@settings(max_examples=200, deadline=None)
def test_split_args_respects_nesting(a):
    s = f"f({a}, g({a}, {a})), '{a},{a}'"
    parts = split_top_level_args(s)
    assert len(parts) == 2  # nested commas and quoted commas don't split


@given(st.text(alphabet=string.ascii_letters + string.digits + "_ .'$[]-", max_size=40))
@settings(max_examples=300, deadline=None)
def test_json_path_quotes_or_passthrough(key):
    p = json_path(key) if key else None
    if p is None:
        return
    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", key):
        assert p == f"$.{key}"
    else:
        assert p.startswith("$['") and p.endswith("']")


@given(st.sampled_from(["WHERE ", "AND ", "OR ", "", "where "]),
       simple_literal)
@settings(max_examples=200, deadline=None)
def test_sanitize_predicate_strips_prefix_and_semicolon(prefix, body):
    body = body.strip()
    # a body that IS a bare keyword makes the prefix check ambiguous by
    # construction (hypothesis found body='or'); the sanitizer keeps it,
    # which is correct — only a keyword followed by more text is a prefix
    assume(body.lower() not in ("where", "and", "or"))
    out = sanitize_predicate(f"{prefix}{body};")
    assert not out.endswith(";")
    assert not re.match(r"(?i)^(WHERE|AND|OR)\s", out + " ")


@given(st.text(alphabet=string.ascii_uppercase + "_", min_size=4, max_size=12))
@settings(max_examples=200, deadline=None)
def test_predicate_rewrite_uppercase_tokens(tok):
    """Any long bare UPPERCASE non-reserved token becomes a JSON extraction;
    the same token inside quotes never does."""
    from confluent_data_ingestion_spark.functions.exprs import _RESERVED

    pred = f"{tok} = 'LIT_{tok}'"
    out = rewrite_predicate_as_json(pred, "val")
    if tok in _RESERVED:
        return
    assert f"get_json_object(CAST(val AS STRING), '$.{tok}')" in out \
        or f"$['{tok}']" in out
    assert f"'LIT_{tok}'" in out  # literal untouched
