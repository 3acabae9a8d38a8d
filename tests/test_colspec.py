"""v3/v4.5 column-spec path: load the reference's own STTM_v3_template.xlsx
and execute the full golden-output scenario (views -> typed inserts -> FGAC
join -> two-arm quarantine UNION ALL) on a synthetic $.tbl envelope."""

import json
import os

import pytest

from confluent_data_ingestion_spark.plans import compile_colspec
from confluent_data_ingestion_spark.spec.colspec import load_colspec

WB = "/root/reference/resources/STTM_v3_template.xlsx"

pytestmark = pytest.mark.skipif(
    not os.path.exists(WB), reason="reference template not present")


def _envelope(spark):
    msgs = [
        # cba_ci: exercise every date/timestamp format branch
        {"tbl": "cba_ci", "cba_ci_userid": "u1", "cba_ci_name": "Ann",
         "cba_ci_createdon": "20260115",                     # yyyyMMdd
         "cba_ci_modifiedon": "2026-01-15 10:30:00.123"},    # 23-char ts
        {"tbl": "cba_ci", "cba_ci_userid": "u2", "cba_ci_name": "Bob",
         "cba_ci_createdon": "2026-02-20",                   # yyyy-MM-dd
         "cba_ci_modifiedon": "1767225600"},                 # 10-digit epoch s
        {"tbl": "cba_ci", "cba_ci_userid": "u3", "cba_ci_name": "Cy",
         "cba_ci_createdon": "junk",                         # -> NULL
         "cba_ci_modifiedon": "1767225600123"},              # 13-digit epoch ms
        # xref: u1 matched, u9 orphan
        {"tbl": "cba_ci_xref", "cba_ci_xref_userid": "u1",
         "cba_ci_xref_f2": "f2-1", "cba_ci_xref_f3": "f3-1"},
        {"tbl": "cba_ci_xref", "cba_ci_xref_userid": "u9",
         "cba_ci_xref_f2": "f2-9", "cba_ci_xref_f3": "f3-9"},
        # adr: u1 matched, u2 unmatched (no xref)
        {"tbl": "cba_ci_adr", "cba_ci_adr_userid": "u1",
         "cba_ci_adr_line": "1 Main", "cba_ci_adr_city": "Springfield",
         "cba_ci_adr_state": "IL"},
        {"tbl": "cba_ci_adr", "cba_ci_adr_userid": "u2",
         "cba_ci_adr_line": "2 Oak", "cba_ci_adr_city": "Shelby",
         "cba_ci_adr_state": "OH"},
    ]
    return spark.createDataFrame([(json.dumps(m),) for m in msgs], "val string")


def test_load_colspec_template():
    spec = load_colspec(WB)
    assert spec.raw_table == "hm_db" and spec.table_identifier_field == "$.tbl"
    assert spec.view_name("cba_ci") == "hm_cba_ci_vw"
    vc = spec.view_columns()
    assert vc["cba_ci"] == ["cba_ci_userid", "cba_ci_name",
                            "cba_ci_createdon", "cba_ci_modifiedon"]
    assert set(spec.targets()) == {
        "hm_cba_ci", "hm_cba_ci_xref", "hm_cba_ci_adr",
        "hm_cba_ci_adr_fgac", "hm_cba_ci_quarantine",
    }
    assert spec.with_props("hm_cba_ci")["value.format"] == "avro-registry"


def test_colspec_views_and_typed_insert(spark):
    spec = load_colspec(WB)
    out = compile_colspec(spark, spec, _envelope(spark))
    # views: untyped string projections with discriminator filter
    vw = out["hm_cba_ci_vw"]
    assert vw.columns == ["cba_ci_userid", "cba_ci_name",
                          "cba_ci_createdon", "cba_ci_modifiedon"]
    assert vw.count() == 3
    # typed target: every CASE branch of the golden date/ts expressions
    tgt = out["hm_cba_ci"].orderBy("cba_ci_userid").collect()
    types = dict(out["hm_cba_ci"].dtypes)
    assert types["cba_ci_createdon"] == "date"
    assert types["cba_ci_modifiedon"] == "timestamp"
    assert str(tgt[0]["cba_ci_createdon"]) == "2026-01-15"
    assert str(tgt[1]["cba_ci_createdon"]) == "2026-02-20"
    assert tgt[2]["cba_ci_createdon"] is None  # junk -> NULL, no job failure
    assert tgt[0]["cba_ci_modifiedon"] is not None  # 23-char literal parsed
    assert tgt[1]["cba_ci_modifiedon"] is not None  # epoch seconds
    assert tgt[2]["cba_ci_modifiedon"] is not None  # epoch millis
    # epoch-second and epoch-milli rows differ (different instants)
    assert tgt[1]["cba_ci_modifiedon"] != tgt[0]["cba_ci_modifiedon"]


def test_colspec_fgac_join_and_quarantine_arms(spark):
    spec = load_colspec(WB)
    out = compile_colspec(spark, spec, _envelope(spark))
    fgac = {r["cba_ci_adr_userid"]: r for r in out["hm_cba_ci_adr_fgac"].collect()}
    assert len(fgac) == 2
    assert fgac["u1"]["cba_ci_xref_f2"] == "f2-1"      # enriched
    assert fgac["u2"]["cba_ci_xref_f2"] is None        # left join miss
    # quarantine: two anti-join arms UNION ALL
    q = sorted((r["cba_ci_user_id"], r["what"])
               for r in out["hm_cba_ci_quarantine"].collect())
    assert q == [("u2", "xref: none"), ("u9", "adr: none")]


def test_detect_format_and_row_per_table():
    from confluent_data_ingestion_spark.spec.colspec import (
        detect_format,
        row_per_table_ddl,
    )

    colspec = [{"Target Table": "t", "Target Column": "c"}]
    rpt = [{"schema": "s1", "table": "accounts", "col_a": "", "col_b": ""}]
    assert detect_format(colspec) == "column-spec"
    assert detect_format(rpt) == "row-per-table"
    assert detect_format([]) == "column-spec"
    ddl = row_per_table_ddl(rpt, name_prefix="pre_")
    assert ddl[0]["table"] == "pre_accounts"
    assert "`col_a` STRING" in ddl[0]["sql"]
    assert "CREATE TABLE `s1`.`pre_accounts`" in ddl[0]["sql"]
