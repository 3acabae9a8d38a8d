"""Spark tests for the core pipeline operators (envelope/xref/fgac/quarantine)."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from confluent_data_ingestion_spark.operators import (
    csv_view,
    json_view,
    latest_by_key,
    lookup_join,
    mask_columns,
    ordered_join,
    quarantine_antijoin,
    union_arms,
)


def _envelope(spark):
    rows = [
        Row(val='{"tbl": "cba_ci", "userid": " u1 ", "name": "Ann", "createdon": "2024-01-02", "seq": "7"}'),
        Row(val='{"tbl": "cba_ci", "userid": "u2", "name": "", "createdon": "garbage", "seq": ""}'),
        Row(val='{"tbl": "other", "userid": "zz"}'),
        Row(val='not even json'),
    ]
    return spark.createDataFrame(rows)


def test_json_view_single_parse(spark):
    df = json_view(
        _envelope(spark),
        [("userid", "userid", "STRING"), ("name", "name", "STRING"),
         ("createdon", "createdon", "DATE"), ("seq", "seq", "INT")],
        table_name="cba_ci",
    )
    got = {r["userid"]: r for r in df.collect()}
    assert set(got) == {"u1", "u2"}
    assert got["u1"]["userid"] == "u1"  # trimmed
    assert got["u1"]["createdon"] == datetime.date(2024, 1, 2)
    assert got["u1"]["seq"] == 7
    assert got["u2"]["name"] == ""  # strings keep empties (trim only)
    assert got["u2"]["createdon"] is None  # garbage -> NULL (safe cast)
    assert got["u2"]["seq"] is None  # empty -> NULL before cast


def test_json_view_per_field_parity_mode(spark):
    df = json_view(
        _envelope(spark),
        [("userid", "userid", "STRING"), ("seq", "seq", "INT")],
        table_name="cba_ci",
        single_parse=False,
    )
    got = {r["userid"]: r for r in df.collect()}
    assert got["u1"]["seq"] == 7 and got["u2"]["seq"] is None


def test_json_view_discriminator_predicate(spark):
    rows = [
        Row(val='{"INFA_TABLE_NAME": "DMB13A_CBA_CI", "CI_ID": "1"}'),
        Row(val='{"INFA_TABLE_NAME": "DMB13A_CBA_CI_ADR", "CI_ID": "2"}'),
    ]
    df = json_view(
        spark.createDataFrame(rows),
        [("CI_ID", "CI_ID", "INT")],
        predicate="INFA_TABLE_NAME LIKE '%\\\\_CBA\\\\_CI'",
    )
    # only the _CBA_CI row (escaped _ so it isn't a wildcard)
    assert [r["CI_ID"] for r in df.collect()] == [1]


def test_csv_view_out_of_range_and_empty(spark):
    rows = [Row(val="1|alpha| x |"), Row(val="2|beta"), Row(val="")]
    df = csv_view(
        spark.createDataFrame(rows),
        [("id", 0, "INT"), ("name", 1, "STRING"), ("code", 2, "STRING"),
         ("extra", 5, "STRING")],
        delimiter="|",
    )
    got = sorted(df.collect(), key=lambda r: (r["id"] is None, r["id"]))
    assert got[0]["id"] == 1 and got[0]["name"] == "alpha" and got[0]["code"] == "x"
    assert got[0]["extra"] is None  # out-of-range -> NULL
    assert got[1]["id"] == 2 and got[1]["code"] is None


def test_latest_by_key_ties_and_soft_delete(spark):
    rows = [
        Row(k="a", v="old", ts=datetime.datetime(2024, 1, 1), seq=1, deleted="false"),
        Row(k="a", v="new", ts=datetime.datetime(2024, 1, 2), seq=1, deleted="false"),
        Row(k="a", v="tie-hi", ts=datetime.datetime(2024, 1, 2), seq=9, deleted="false"),
        Row(k="b", v="only", ts=datetime.datetime(2024, 1, 1), seq=1, deleted="false"),
        Row(k="c", v="gone", ts=datetime.datetime(2024, 1, 5), seq=1, deleted="true"),
        Row(k="c", v="kept", ts=datetime.datetime(2024, 1, 1), seq=1, deleted="0"),
        Row(k="d", v="null-ts", ts=None, seq=2, deleted="false"),
    ]
    out = latest_by_key(
        spark.createDataFrame(rows), ["k"], ["ts", "seq"],
        delete_flag_field="deleted",
    )
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {"a": "tie-hi", "b": "only", "c": "kept", "d": "null-ts"}


def test_latest_by_key_salted_matches_plain(spark, tables):
    ev = tables["events"]
    plain = latest_by_key(ev, ["user_id"], ["ts", "event_id"])
    salted = latest_by_key(ev, ["user_id"], ["ts", "event_id"], salt_partitions=8)
    a = {r["user_id"]: r["event_id"] for r in plain.collect()}
    b = {r["user_id"]: r["event_id"] for r in salted.collect()}
    assert a == b


def test_lookup_join_theta_trim(spark):
    left = spark.createDataFrame([Row(cntr=" X1 "), Row(cntr="X2"), Row(cntr=None)])
    right = spark.createDataFrame([Row(cl_n="X1", bpd=10)])
    out = lookup_join(left, right, "TRIM(s.cntr) = TRIM(j.cl_n)", join_type="LEFT")
    got = {(r["cntr"] or ""): r["bpd"] for r in out.collect()}
    assert got[" X1 "] == 10 and got["X2"] is None and got[""] is None


def test_ordered_join_chain(spark, tables):
    out = ordered_join(
        tables["lineitem"], "l",
        [
            (tables["orders"], "o", "l.l_orderkey = o.o_orderkey", "INNER"),
            (tables["customer"], "c", "o.o_custkey = c.c_custkey", "LEFT"),
            (tables["nation"], "n", "c.c_nationkey = n.n_nationkey", "LEFT"),
        ],
    )
    assert out.count() == tables["lineitem"].count()
    assert "n_name" in out.columns


def test_quarantine_both_directions(spark):
    a = spark.createDataFrame([Row(id=1, x="a"), Row(id=2, x="b")])
    b = spark.createDataFrame([Row(id=2, y="B"), Row(id=3, y="C")])
    out = quarantine_antijoin(
        a, b, "a.id = b.id",
        select_left=["id", "'left' AS side"],
        select_right=["id", "'right' AS side"],
        left_reason="xref: none", right_reason="src: none",
    )
    rows = {(r["id"], r["what"]) for r in out.collect()}
    assert rows == {(1, "xref: none"), (3, "src: none")}


def test_union_arms_null_fill(spark):
    a = spark.createDataFrame([Row(x=1, y="a")])
    b = spark.createDataFrame([Row(x=2)])
    out = union_arms([a, b], ["x", "y"])
    got = sorted([(r["x"], r["y"]) for r in out.collect()])
    assert got == [(1, "a"), (2, None)]


def test_mask_columns(spark):
    df = spark.createDataFrame([Row(ssn="123456789", name="Ann", note="hi")])
    out = mask_columns(df, {"ssn": "redact", "name": "sha2", "note": "null"}).collect()[0]
    assert out["ssn"] == "*****6789"
    assert len(out["name"]) == 64
    assert out["note"] is None


def test_robust_stats_ignore_planted_outliers(spark):
    from pyspark.sql import Row

    from confluent_data_ingestion_spark.operators.stats import robust_stats

    base = [Row(g="a", v=float(x)) for x in [10, 11, 12, 13, 14]]
    poisoned = base + [Row(g="a", v=1e12)]
    clean = robust_stats(spark.createDataFrame(base), ["g"], "v").collect()[0]
    dirty = robust_stats(spark.createDataFrame(poisoned), ["g"], "v").collect()[0]
    # one absurd value barely moves median/MAD (mean/stddev would explode)
    assert clean["med_value"] == 12.0
    assert abs(dirty["med_value"] - 12.5) < 1e-9
    assert clean["mad_value"] == 1.0 and dirty["mad_value"] == 1.5
    # approx variant stays in the same ballpark on well-behaved data
    approx = robust_stats(
        spark.createDataFrame(base), ["g"], "v", approx=True
    ).collect()[0]
    assert abs(approx["med_value"] - 12.0) <= 1.0
