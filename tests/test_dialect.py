"""Pure-Python tests for the Flink->Spark dialect translation layer."""

from confluent_data_ingestion_spark.functions.dialect import (
    split_top_level_args,
    translate_expr,
)
from confluent_data_ingestion_spark.functions.exprs import (
    cast_wrap,
    choose_expr,
    combine_predicates,
    json_path,
    normalize_type,
    rewrite_predicate_as_json,
    sanitize_predicate,
)


def test_json_value():
    assert (
        translate_expr("JSON_VALUE(CAST(val AS STRING), '$.a')")
        == "get_json_object(TRY_CAST(val AS STRING), '$.a')"
    )


def test_json_value_unsafe_cast():
    assert (
        translate_expr("JSON_VALUE(CAST(val AS STRING), '$.a')", safe_cast=False)
        == "get_json_object(CAST(val AS STRING), '$.a')"
    )


def test_split_index_literal_delim_regex_escaped():
    out = translate_expr("SPLIT_INDEX(val, '|', 3)", safe_cast=False)
    assert out == "try_element_at(split(val, '\\\\|'), 4)"


def test_split_index_plain_delim():
    out = translate_expr("SPLIT_INDEX(val, ',', 0)", safe_cast=False)
    assert out == "try_element_at(split(val, ','), 1)"


def test_regexp_and_is_decimal():
    assert translate_expr("REGEXP(x, '^[0-9]+$')") == "regexp_like(x, '^[0-9]+$')"
    assert "try_cast(x AS DECIMAL(38,10)) IS NOT NULL" in translate_expr("IS_DECIMAL(x)")


def test_to_timestamp_ltz_arities():
    assert (
        translate_expr("TO_TIMESTAMP_LTZ(e, 3)", safe_cast=False)
        == "timestamp_millis(try_cast(e AS BIGINT))"
    )
    assert (
        translate_expr("TO_TIMESTAMP_LTZ(e, 0)", safe_cast=False)
        == "timestamp_seconds(try_cast(e AS BIGINT))"
    )
    assert (
        translate_expr("TO_TIMESTAMP_LTZ(s, 'yyyy-MM-dd HH:mm:ss.SSS')", safe_cast=False)
        == "try_to_timestamp(s, 'yyyy-MM-dd HH:mm:ss.SSS')"
    )
    # SimpleDateFormat-style 'hh' (24h intent) -> DateTimeFormatter 'HH'
    assert (
        translate_expr("TO_TIMESTAMP_LTZ(s, 'yyyy-MM-dd hh:mm:ss')", safe_cast=False)
        == "try_to_timestamp(s, 'yyyy-MM-dd HH:mm:ss')"
    )


def test_nested_translation():
    out = translate_expr(
        "CASE WHEN IS_DECIMAL(JSON_VALUE(val, '$.ts')) THEN TO_TIMESTAMP_LTZ(JSON_VALUE(val, '$.ts'), 3) ELSE NULL END",
        safe_cast=False,
    )
    assert "get_json_object(val, '$.ts')" in out
    assert "timestamp_millis" in out
    assert "JSON_VALUE" not in out


def test_string_literals_untouched():
    out = translate_expr("'JSON_VALUE(x, y)' ", safe_cast=False)
    assert out.strip() == "'JSON_VALUE(x, y)'"


def test_split_args():
    assert split_top_level_args("a, f(b, c), 'x,y'") == ["a", "f(b, c)", "'x,y'"]


def test_cast_wrap_string_vs_typed():
    assert cast_wrap("x", "STRING") == "CAST(TRIM(x) AS STRING)"
    assert cast_wrap("x", "INT") == "CAST(NULLIF(TRIM(x), '') AS INT)"
    # pre-cast expressions pass through
    assert cast_wrap("CAST(x AS INT)", "INT") == "CAST(x AS INT)"


def test_normalize_type():
    assert normalize_type("varchar(17)") == "STRING"
    assert normalize_type("long") == "BIGINT"
    assert normalize_type("datetime") == "TIMESTAMP"
    assert normalize_type("decimal(10,2)") == "DECIMAL(10,2)"
    assert normalize_type(None) == "STRING"


def test_choose_expr_precedence():
    # override wins over transform and auto
    e = choose_expr("UPPER(x)", "LOWER(x)", "f", "JSON", "STRING")
    assert e.startswith("TRY_CAST(UPPER(x)") or e.startswith("CAST(UPPER(x)")
    # transform wins over auto
    e = choose_expr(None, "LOWER(x)", "f", "JSON", "STRING")
    assert "LOWER(x)" in e
    # auto JSON
    e = choose_expr(None, None, "fieldA", "JSON", "INT")
    assert "get_json_object" in e and "$.fieldA" in e and "NULLIF" in e
    # auto CSV
    e = choose_expr(None, None, "2", "CSV", "STRING", delimiter="|")
    assert "try_element_at" in e and ", 3)" in e
    # unmapped -> typed NULL
    e = choose_expr(None, None, None, "JSON", "INT")
    assert "NULL" in e and "INT" in e


def test_sanitize_and_combine_predicates():
    assert sanitize_predicate(" WHERE a = 1; ") == "a = 1"
    assert sanitize_predicate("AND x IS NULL") == "x IS NULL"
    assert combine_predicates(["a=1", "a=1", "b=2"]) == "(a=1) AND (b=2)"
    assert combine_predicates(["", " "]) is None
    assert combine_predicates(["a=1"]) == "a=1"


def test_rewrite_predicate_as_json():
    out = rewrite_predicate_as_json("INFA_TABLE_NAME LIKE '%_CBA_CI'")
    assert out.startswith("get_json_object(CAST(val AS STRING), '$.INFA_TABLE_NAME')")
    assert "'%_CBA_CI'" in out
    # reserved words, short tokens, function calls untouched
    out = rewrite_predicate_as_json("AND_X = 1 AND abc = TRIM(Y)")
    assert "get_json_object(CAST(val AS STRING), '$.AND_X')" in out
    assert "TRIM(Y)" in out  # function call untouched, lowercase abc untouched


def test_json_path_bracket_escape():
    assert json_path("simple_key") == "$.simple_key"
    assert json_path("weird key") == "$['weird key']"
