"""Flattener tests: golden-pair parity with the reference tool + the
distributed mapInPandas wrapper."""

import json
import os

import pytest

from confluent_data_ingestion_spark.flatten import flatten_json, schema_manifest

GOLDEN_IN = "/root/reference/resources/json-flattener-input.json"
GOLDEN_OUT = "/root/reference/resources/rows.ndjson"


@pytest.mark.skipif(not os.path.exists(GOLDEN_IN), reason="reference not present")
def test_golden_pair_exact():
    with open(GOLDEN_IN) as f:
        doc = json.load(f)
    with open(GOLDEN_OUT) as f:
        expected = [json.loads(line) for line in f if line.strip()]
    got = flatten_json(doc)
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g == e, f"row {g.get('_row_id')} differs:\n{g}\n{e}"


def test_no_arrays_no_rows():
    assert flatten_json({"a": 1, "b": {"c": 2}}) == []


def test_scalar_array_and_inheritance():
    rows = flatten_json({"id": 7, "xs": [10, 20], "sib": {"hidden": 1}})
    assert len(rows) == 2
    assert rows[0]["xs"] == 10 and rows[0]["id"] == 7
    assert rows[0]["tableName"] == "xs" and rows[0]["_path"] == "/xs/0"
    assert "sib_hidden" not in rows[0]  # sibling branch never leaks


def test_dict_array_parent_child_lineage():
    doc = {"items": [{"name": "x", "subs": [1, 2]}, {"subs": [3]}]}
    rows = flatten_json(doc)
    # item 0 has a scalar -> parent row; its subs reference it
    parent = next(r for r in rows if r["tableName"] == "items")
    kids = [r for r in rows if r["tableName"] == "items_subs" and r["_parent_id"] == parent["_row_id"]]
    assert {k["items_subs"] for k in kids} == {1, 2}
    assert kids[0]["items_name"] == "x"  # element scalars inherit into children
    # item 1 has no scalars -> no parent row; its sub parents to None
    orphan = [r for r in rows if r["tableName"] == "items_subs" and r["items_subs"] == 3]
    assert orphan[0]["_parent_id"] is None


def test_emit_empty_parent_flag():
    doc = {"items": [{"subs": [1]}]}
    assert len(flatten_json(doc)) == 1
    rows = flatten_json(doc, emit_empty_parent=True)
    assert len(rows) == 2
    stub = next(r for r in rows if r["tableName"] == "items")
    kid = next(r for r in rows if r["tableName"] == "items_subs")
    assert kid["_parent_id"] == stub["_row_id"]


def test_list_of_lists():
    rows = flatten_json({"m": [[1, 2], [3]]})
    assert [r["m"] for r in rows] == [1, 2, 3]
    assert rows[0]["_path"] == "/m/0/0" and rows[2]["_path"] == "/m/1/0"
    assert rows[0]["_depth"] == 2


def test_guards():
    doc = {"a": [{"b": [1, 2, 3]}], "c": [1] * 10}
    assert len(flatten_json(doc, max_rows=4)) == 4
    deep = flatten_json({"a": [{"b": [1]}]}, max_depth=1)
    assert deep == []  # list at depth 1 allowed but elements need depth<=1? root arrays only
    wide = flatten_json({"x": 1, "y": 2, "z": 3, "arr": [9]}, max_cols=8)
    assert all(len(r) <= 8 for r in wide)


def test_numeric_to_float():
    rows = flatten_json({"xs": [1], "flag": True}, numeric_to_float=True)
    assert rows[0]["xs"] == 1.0 and isinstance(rows[0]["xs"], float)
    assert rows[0]["flag"] is True  # bools stay bools


def test_schema_manifest():
    rows = flatten_json({"xs": [1, None]})
    m = schema_manifest([rows])
    assert "xs" in m and "xs" in m["xs"]["columns"]
    assert set(m["xs"]["types"]["xs"]) == {"int", "NoneType"}


def test_flatten_df_distributed(spark):
    from confluent_data_ingestion_spark.flatten import flatten_df
    from pyspark.sql import Row

    docs = [
        Row(doc_id=1, val=json.dumps({"k": "a", "xs": [1, 2]})),
        Row(doc_id=2, val=json.dumps({"k": "b", "items": [{"n": 1, "subs": [5]}]})),
        Row(doc_id=3, val="not json"),
        Row(doc_id=4, val=json.dumps({"flat": "doc"})),
    ]
    out = flatten_df(spark.createDataFrame(docs), payload_col="val", key_col="doc_id")
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_key"], []).append(r)
    assert len(by_doc["1"]) == 2
    assert len(by_doc["2"]) == 2  # parent row + sub row
    assert "3" not in by_doc and "4" not in by_doc
    sub = next(r for r in by_doc["2"] if r["tableName"] == "items_subs")
    parent = next(r for r in by_doc["2"] if r["tableName"] == "items")
    assert sub["_parent_id"] == parent["_row_id"]
    payload = json.loads(sub["row_json"])
    assert payload["items_subs"] == 5 and payload["k"] == "b"


# ---------------------------------------------------------------------------
# Schema-compiled flattener: differential parity vs the per-doc Python walk.
# ---------------------------------------------------------------------------
def _py_rows(doc, doc_key):
    return [
        {"doc_key": doc_key, **row}
        for row in flatten_json(doc)
    ]


def _spark_rows(spark, docs, schema_ddl):
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from confluent_data_ingestion_spark.flatten import flatten_with_schema

    schema = StructType.fromDDL(schema_ddl)
    df = spark.createDataFrame(
        [(str(k), _json.dumps(d)) for k, d in docs], "doc_key string, val string"
    )
    out = flatten_with_schema(df, schema, payload_col="val", key_col="doc_key")
    rows = []
    for r in out.collect():
        d = r.asDict()
        rows.append({k: v for k, v in d.items() if v is not None})
    return rows


def _normalize(rows):
    def key(r):
        return (r["doc_key"], r["_row_id"])

    out = []
    for r in sorted(rows, key=key):
        out.append(tuple(sorted((k, str(v)) for k, v in r.items() if v is not None)))
    return out


DOC = {
    "a": 7,
    "b": {"c": "x", "tags": ["p", "q"]},
    "items": [
        {"sku": "s1", "qty": 2, "subs": [{"k": 1}, {"k": 2}]},
        {"sku": "s2", "qty": 3, "subs": []},
    ],
    "mat": [[10, 20], [30]],
}
DOC_DDL = (
    "a bigint, b struct<c: string, tags: array<string>>, "
    "items array<struct<sku: string, qty: bigint, subs: array<struct<k: bigint>>>>, "
    "mat array<array<bigint>>"
)


def test_compiled_matches_python_walk(spark):
    docs = [("d1", DOC), ("d2", {"a": 1, "b": {"c": "y", "tags": []},
                                 "items": [], "mat": []})]
    expect = []
    for k, d in docs:
        expect.extend(_py_rows(d, k))
    got = _spark_rows(spark, docs, DOC_DDL)
    assert _normalize(got) == _normalize(expect)


def test_compiled_row_id_is_depth_first_emit_order(spark):
    got = _spark_rows(spark, [("d1", DOC)], DOC_DDL)
    by_id = {r["_row_id"]: r for r in got}
    assert sorted(by_id) == list(range(1, len(got) + 1))
    # items element 0's subs rows point at the element's parent row
    parents = [r for r in got if r["tableName"] == "items"]
    subs = [r for r in got if r["tableName"] == "items_subs"]
    p0 = next(r for r in parents if r["items_sku"] == "s1")
    assert all(s["_parent_id"] == p0["_row_id"] for s in subs)
    # scoped inheritance: subs rows carry the element scalars, not siblings'
    assert all(s["items_sku"] == "s1" for s in subs)


def test_compiled_nested_dict_and_list_of_lists(spark):
    got = _spark_rows(spark, [("d1", DOC)], DOC_DDL)
    tags = sorted(r["b_tags"] for r in got if r["tableName"] == "b_tags")
    assert tags == ["p", "q"]
    mat = sorted((r["_path"], r["mat"]) for r in got if r["tableName"] == "mat")
    assert mat == [("/mat/0/0", 10), ("/mat/0/1", 20), ("/mat/1/0", 30)]


GOLDEN_DDL = (
    "type string, "
    "auditData struct<modifiedBy: string, Timestamp: string>, "
    "entId struct<id: bigint>, "
    "SequenceNumber bigint, "
    "product struct<"
    "code: string, closingOnly: array<bigint>, colCusp: struct<Cusp: string>, "
    "eqType: string, futureTemplateId: bigint, Id: struct<id: bigint>, "
    "isPennyTradePrice: boolean, Name: string, "
    "tsf: array<struct<businessDateAdded: string, tradeSourceId: array<bigint>>>, "
    "tsp: array<struct<businessDateAdded: string, tradeSourceId: bigint>>>"
)


@pytest.mark.skipif(not os.path.exists(GOLDEN_IN), reason="reference not present")
def test_compiled_golden_pair_exact(spark):
    """The schema-compiled (pure-JVM) flattener reproduces the reference
    tool's committed golden output, row for row."""
    with open(GOLDEN_IN) as f:
        doc_text = f.read()
    with open(GOLDEN_OUT) as f:
        expected = [json.loads(line) for line in f if line.strip()]
    got = _spark_rows(spark, [("d", json.loads(doc_text))], GOLDEN_DDL)
    assert len(got) == len(expected)
    for r in got:
        r.pop("doc_key")
    by_id = {r["_row_id"]: r for r in got}
    for e in expected:
        g = dict(by_id[e["_row_id"]])
        # golden rows omit null _parent_id? normalize both sides
        e_n = {k: v for k, v in e.items() if v is not None}
        g_n = {k: v for k, v in g.items() if v is not None}
        assert g_n == e_n, f"row {e['_row_id']} differs:\n{g_n}\n{e_n}"


# Scalar-less struct elements with nested arrays: under emit_empty_parent
# the walk emits a parent row per element that _count_struct_elem must also
# count, or every subsequent _row_id/_parent_id shifts (the 'trail' array
# after 'items' is what catches the offset collision).
DOC_EEP = {
    "items": [
        {"subs": [1, 2], "tags": ["a"]},
        {"subs": [], "tags": ["b", "c"]},
    ],
    "wrap": [{"inner": {"deep": [7, 8]}}],
    "trail": ["z", "w"],
}
DOC_EEP_DDL = (
    "items array<struct<subs: array<bigint>, tags: array<string>>>, "
    "wrap array<struct<inner: struct<deep: array<bigint>>>>, "
    "trail array<string>"
)


def _spark_rows_opts(spark, docs, schema_ddl, **opts):
    import json as _json

    from pyspark.sql.types import StructType

    from confluent_data_ingestion_spark.flatten import flatten_with_schema

    df = spark.createDataFrame(
        [(str(k), _json.dumps(d)) for k, d in docs], "doc_key string, val string"
    )
    out = flatten_with_schema(df, StructType.fromDDL(schema_ddl),
                              payload_col="val", key_col="doc_key", **opts)
    return [{k: v for k, v in r.asDict().items() if v is not None}
            for r in out.collect()]


def test_compiled_emit_empty_parent_matches_python_walk(spark):
    docs = [("d1", DOC_EEP), ("d2", {"items": [], "wrap": [], "trail": ["x"]})]
    expect = []
    for k, d in docs:
        expect.extend(
            dict(r, doc_key=k) for r in flatten_json(d, emit_empty_parent=True)
        )
    got = _spark_rows_opts(spark, docs, DOC_EEP_DDL, emit_empty_parent=True)
    assert _normalize(got) == _normalize(expect)
    # the stub parents exist and the children point at them
    stubs = [r for r in got if r["tableName"] == "items" and r["doc_key"] == "d1"]
    assert len(stubs) == 2
    kids = [r for r in got if r["tableName"] == "items_subs"]
    assert {k["_parent_id"] for k in kids} <= {s["_row_id"] for s in stubs}
    # row ids are still the dense depth-first ordinal (no collisions)
    d1_ids = sorted(r["_row_id"] for r in got if r["doc_key"] == "d1")
    assert d1_ids == list(range(1, len(d1_ids) + 1))


def test_compiled_emit_empty_parent_with_max_depth(spark):
    for md in (1, 2, 3):
        expect = [dict(r, doc_key="d1")
                  for r in flatten_json(DOC_EEP, emit_empty_parent=True,
                                        max_depth=md)]
        got = _spark_rows_opts(spark, [("d1", DOC_EEP)], DOC_EEP_DDL,
                               emit_empty_parent=True, max_depth=md)
        assert _normalize(got) == _normalize(expect), f"max_depth={md}"


def test_compiled_max_depth_matches_python_walk(spark):
    """max_depth prunes emission AND the row-id counters identically."""
    for md in (1, 2, 3):
        expect = [dict(r, doc_key="d1")
                  for r in flatten_json(DOC, max_depth=md)]
        import json as _json

        from pyspark.sql.types import StructType

        from confluent_data_ingestion_spark.flatten import flatten_with_schema
        df = spark.createDataFrame([("d1", _json.dumps(DOC))],
                                   "doc_key string, val string")
        out = flatten_with_schema(df, StructType.fromDDL(DOC_DDL),
                                  payload_col="val", key_col="doc_key",
                                  max_depth=md)
        got = [{k: v for k, v in r.asDict().items() if v is not None}
               for r in out.collect()]
        assert _normalize(got) == _normalize(expect), f"max_depth={md}"


# ---------------------------------------------------------------------------
# Typed per-table extraction (reference --schema-out workflow completion).
# ---------------------------------------------------------------------------
def test_discover_and_extract_typed_tables(spark):
    from confluent_data_ingestion_spark.flatten import (
        discover_manifest,
        extract_tables,
        flatten_df,
    )

    docs = [
        (1, {"k": "a", "xs": [1, 2], "items": [{"n": 1, "f": 1.5, "subs": [5]}]}),
        (2, {"k": "b", "xs": [7], "items": [{"n": 2, "f": 2.0, "subs": []}]}),
    ]
    df = spark.createDataFrame(
        [(i, json.dumps(d)) for i, d in docs], "doc_id long, val string"
    )
    flat = flatten_df(df, payload_col="val", key_col="doc_id")
    manifest = discover_manifest(flat)
    assert set(manifest) == {"xs", "items", "items_subs"}
    assert manifest["items"]["types"]["items_n"] == ["int"]
    tables = extract_tables(flat, manifest)
    xs = tables["xs"]
    assert dict(xs.dtypes)["xs"] == "bigint"       # typed, not a JSON string
    assert dict(xs.dtypes)["k"] == "string"
    assert sorted(r["xs"] for r in xs.collect()) == [1, 2, 7]
    items = tables["items"].collect()
    assert dict(tables["items"].dtypes)["items_f"] == "double"
    assert {(r["doc_key"], r["items_n"]) for r in items} == {("1", 1), ("2", 2)}
    subs = tables["items_subs"].collect()
    assert len(subs) == 1 and subs[0]["items_subs"] == 5
    # inherited parent scalars ride into the child table, typed
    assert subs[0]["items_n"] == 1 and subs[0]["k"] == "a"
    # lineage survives extraction
    parent_ids = {r["_row_id"] for r in items}
    assert subs[0]["_parent_id"] in parent_ids


def test_extract_type_widening(spark):
    from confluent_data_ingestion_spark.flatten import extract_tables, flatten_df

    docs = [(1, {"xs": [1, 2.5, None]}), (2, {"xs": ["str", 4]})]
    df = spark.createDataFrame(
        [(i, json.dumps(d)) for i, d in docs], "doc_id long, val string"
    )
    flat = flatten_df(df, payload_col="val", key_col="doc_id")
    tables = extract_tables(flat)
    # int+float+str+None -> string, values rendered verbatim
    assert dict(tables["xs"].dtypes)["xs"] == "string"
    vals = {r["xs"] for r in tables["xs"].collect()}
    assert vals == {"1", "2.5", None, "str", "4"}


@pytest.mark.skipif(not os.path.exists(GOLDEN_IN), reason="reference not present")
def test_extract_golden_pair_typed_tables(spark):
    """The golden doc's flattened tables come back as typed DataFrames whose
    rows match the committed NDJSON row-for-row."""
    from confluent_data_ingestion_spark.flatten import extract_tables, flatten_df

    with open(GOLDEN_IN) as f:
        doc_text = f.read()
    with open(GOLDEN_OUT) as f:
        expected = [json.loads(line) for line in f if line.strip()]
    df = spark.createDataFrame([("d", doc_text)], "doc_key string, val string")
    flat = flatten_df(df, payload_col="val", key_col="doc_key")
    tables = extract_tables(flat)
    by_table = {}
    for e in expected:
        by_table.setdefault(e["tableName"], []).append(e)
    assert set(tables) == set(by_table)
    for t, exp_rows in by_table.items():
        got = {r["_row_id"]: r.asDict() for r in tables[t].collect()}
        assert len(got) == len(exp_rows)
        for e in exp_rows:
            g = got[e["_row_id"]]
            for k, v in e.items():
                if k in ("tableName",):
                    continue
                assert g[k] == v, f"{t} row {e['_row_id']} col {k}: {g[k]!r} != {v!r}"
