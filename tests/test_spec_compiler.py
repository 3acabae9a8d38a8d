"""End-to-end spec -> compiler tests mirroring the reference's
View -> XREF -> FGAC -> Quarantine pipeline shape."""

import json

import pytest
from pyspark.sql import Row

from confluent_data_ingestion_spark.plans import compile_pipeline
from confluent_data_ingestion_spark.spec import load_spec, validate_spec
from confluent_data_ingestion_spark.spec.validate import has_errors


def _row(**kw):
    base = {"PipelineStage": "VIEW", "TargetTable": "t", "TargetColumn": "c"}
    base.update(kw)
    return base


def _envelope(spark):
    msgs = [
        {"INFA_TABLE_NAME": "DMB13A_CBA_CI", "CI_ID": "1", "NM": " Ann ", "SEQ": "1", "DEL": "false"},
        {"INFA_TABLE_NAME": "DMB13A_CBA_CI", "CI_ID": "1", "NM": "Anna", "SEQ": "2", "DEL": "false"},
        {"INFA_TABLE_NAME": "DMB13A_CBA_CI", "CI_ID": "2", "NM": "Bob", "SEQ": "9", "DEL": "true"},
        {"INFA_TABLE_NAME": "DMB13A_CBA_CI", "CI_ID": "2", "NM": "Rob", "SEQ": "1", "DEL": "false"},
        {"INFA_TABLE_NAME": "DMB13A_CBA_CI", "CI_ID": "3", "NM": "Cyd", "SEQ": "4", "DEL": "false"},
        {"INFA_TABLE_NAME": "OTHER_TBL", "CI_ID": "99", "NM": "x", "SEQ": "1", "DEL": "false"},
    ]
    rows = [Row(val=json.dumps(m)) for m in msgs]
    rows += [Row(val="10,X1,ent-a"), Row(val="30,X3,ent-c")]  # CSV records ride along
    return spark.createDataFrame(rows)


SPEC_ROWS = [
    # JSON view
    _row(TargetTable="CBA_CI_view", TargetColumn="CI_ID", TargetDataType="INT",
         IsTargetPK="Y", FieldSelector="CI_ID",
         FilterPredicate="INFA_TABLE_NAME LIKE '%CBA_CI'"),
    _row(TargetTable="CBA_CI_view", TargetColumn="NM", TargetDataType="STRING",
         FieldSelector="NM"),
    _row(TargetTable="CBA_CI_view", TargetColumn="SEQ", TargetDataType="INT",
         FieldSelector="SEQ"),
    _row(TargetTable="CBA_CI_view", TargetColumn="DEL", TargetDataType="STRING",
         FieldSelector="DEL"),
    # CSV view with auto-index (CI_ID explicit 0; others auto -> 1, 2)
    _row(TargetTable="ENT_view", TargetColumn="CI_ID", TargetDataType="INT",
         IsTargetPK="Y", MessageFormat="CSV", FieldSelector="0",
         FilterPredicate="val NOT LIKE '{%'"),
    _row(TargetTable="ENT_view", TargetColumn="CODE", TargetDataType="STRING",
         MessageFormat="CSV"),
    _row(TargetTable="ENT_view", TargetColumn="ENT", TargetDataType="STRING",
         MessageFormat="CSV"),
    # XREF: latest by CI_ID ordered by SEQ, excluding soft-deleted
    _row(PipelineStage="XREF", TargetTable="XREF_CBA_CI", TargetColumn="CI_ID",
         TargetDataType="INT", IsTargetPK="Y", SourceTable="CBA_CI_view",
         FieldSelector="CI_ID", OrderByFields="SEQ",
         DeleteFlagField="DEL", DeleteFlagValues="true,1"),
    _row(PipelineStage="XREF", TargetTable="XREF_CBA_CI", TargetColumn="NM",
         SourceTable="CBA_CI_view", FieldSelector="NM"),
    _row(PipelineStage="XREF", TargetTable="XREF_CBA_CI", TargetColumn="SEQ",
         TargetDataType="INT", SourceTable="CBA_CI_view", FieldSelector="SEQ"),
    # FGAC: xref joined to entitlements, masked name
    _row(PipelineStage="FGAC", TargetTable="FGAC_CBA_CI", TargetColumn="CI_ID",
         TargetDataType="INT", IsTargetPK="Y", SourceTable="XREF_CBA_CI",
         FieldSelector="s.CI_ID", JoinTable="ENT_view", JoinAlias="e",
         JoinType="INNER", JoinCondition="s.CI_ID * 10 = e.CI_ID"),
    _row(PipelineStage="FGAC", TargetTable="FGAC_CBA_CI", TargetColumn="NM_MASKED",
         SourceTable="XREF_CBA_CI", SourceTransformExpr="s.NM",
         ExprOverride="mask:sha2"),
    _row(PipelineStage="FGAC", TargetTable="FGAC_CBA_CI", TargetColumn="ENT",
         SourceTable="XREF_CBA_CI", FieldSelector="e.ENT"),
    # Quarantine: xref rows with no entitlement
    _row(PipelineStage="QUARANTINE", TargetTable="Q_CBA_CI", TargetColumn="CI_ID",
         TargetDataType="INT", IsTargetPK="Y", SourceTable="XREF_CBA_CI",
         FieldSelector="CI_ID", JoinTable="ENT_view", JoinAlias="e",
         JoinCondition="s.CI_ID * 10 = e.CI_ID"),
    _row(PipelineStage="QUARANTINE", TargetTable="Q_CBA_CI", TargetColumn="WHAT",
         SourceTable="XREF_CBA_CI", SourceTransformExpr="'ent: none'"),
]


def test_validate_clean():
    spec = load_spec(SPEC_ROWS)
    issues = validate_spec(spec)
    assert not has_errors(issues), issues


def test_validate_catches_errors():
    bad = SPEC_ROWS + [
        _row(TargetTable="CBA_CI_view", TargetColumn="CI_ID"),  # dup column
        _row(PipelineStage="XREF", TargetTable="XREF_NOPK", TargetColumn="A",
             SourceTable="CBA_CI_view", FieldSelector="A"),  # no PK
        _row(TargetTable="BAD_CSV", TargetColumn="A", MessageFormat="CSV",
             FieldSelector="abc"),  # non-numeric CSV selector
    ]
    issues = validate_spec(load_spec(bad))
    msgs = [m for s, _, m in issues if s == "ERROR"]
    assert any("duplicate" in m for m in msgs)
    assert any("no IsTargetPK" in m for m in msgs)
    assert any("non-negative integer" in m for m in msgs)


def test_xref_auto_upsert_quirk():
    """v21 parity (sttm_to_flink_v21.py:256-259): XREF_* tables with no
    explicit changelog.mode get upsert auto-added; explicit values win."""
    spec = load_spec(SPEC_ROWS)
    assert spec.props_for("XREF_CBA_CI")["changelog.mode"] == "upsert"
    assert "changelog.mode" not in spec.props_for("CBA_CI_view")
    spec2 = load_spec(
        SPEC_ROWS, table_matrix={"XREF_CBA_CI": {"changelog.mode": "retract"}}
    )
    assert spec2.props_for("XREF_CBA_CI")["changelog.mode"] == "retract"
    issues = validate_spec(spec2)
    assert any("changelog.mode=upsert" in m for s, _, m in issues if s == "ERROR")


def test_format_autodetect_dispatch():
    """One entry point for both STTM dialects (reference
    sttm2flink-ui-5_4/sttm2flink/generator.py:33-39 header sniffing)."""
    import os

    from confluent_data_ingestion_spark.spec import (
        detect_spec_format,
        load_any_spec,
    )
    from confluent_data_ingestion_spark.spec.colspec import ColSpec
    from confluent_data_ingestion_spark.spec.models import PipelineSpec

    assert detect_spec_format(["PipelineStage", "TargetTable", "TargetColumn"]) == "mapping"
    assert detect_spec_format(["Source Table", "Target Table", "Target Column"]) == "column-spec"
    assert detect_spec_format(["TargetTable", "TargetColumn"]) == "mapping"
    assert detect_spec_format(["whatever"]) == "column-spec"

    got = load_any_spec(SPEC_ROWS)
    assert isinstance(got, PipelineSpec)
    colspec_rows = [{"Source Table": "cust", "Source Column": "id",
                     "Target Table": "t", "Target Column": "user_id",
                     "Target Data Type": "INT", "Expression": "hm_cust_vw.id"}]
    assert isinstance(load_any_spec(colspec_rows), ColSpec)

    v22 = "/root/reference/resources/STTM_v22.xlsx"
    v3 = "/root/reference/resources/STTM_v3_template.xlsx"
    if os.path.exists(v22):
        assert isinstance(load_any_spec(v22), PipelineSpec)
    if os.path.exists(v3):
        assert isinstance(load_any_spec(v3), ColSpec)


@pytest.fixture(scope="module")
def compiled(spark):
    spec = load_spec(SPEC_ROWS)
    return compile_pipeline(spark, spec, {"raw": _envelope(spark)})


def test_view_stage(compiled):
    got = {r["CI_ID"]: r for r in compiled["CBA_CI_view"].collect()}
    assert set(got) == {1, 2, 3}  # discriminator dropped OTHER_TBL + CSV rows? no:
    # CSV rows fail JSON extraction -> CI_ID NULL; LIKE filter excludes them
    assert got[1]["NM"] in ("Ann", "Anna")  # both versions present pre-dedup
    rows = compiled["CBA_CI_view"].collect()
    assert len(rows) == 5  # 5 CBA_CI messages


def test_csv_view_auto_index(compiled):
    got = {r["CI_ID"]: r for r in compiled["ENT_view"].collect()}
    assert got[10]["CODE"] == "X1" and got[10]["ENT"] == "ent-a"
    assert got[30]["ENT"] == "ent-c"


def test_xref_stage_dedup_and_soft_delete(compiled):
    got = {r["CI_ID"]: r for r in compiled["XREF_CBA_CI"].collect()}
    assert got[1]["NM"] == "Anna" and got[1]["SEQ"] == 2  # latest by SEQ
    assert got[2]["NM"] == "Rob"  # SEQ 9 version was soft-deleted
    assert got[3]["NM"] == "Cyd"


def test_fgac_stage_join_and_mask(compiled):
    rows = compiled["FGAC_CBA_CI"].collect()
    got = {r["CI_ID"]: r for r in rows}
    assert set(got) == {1, 3}  # CI 2 has no entitlement (20 missing)
    assert got[1]["ENT"] == "ent-a"
    assert len(got[1]["NM_MASKED"]) == 64  # sha2-256 hex


def test_quarantine_stage(compiled):
    rows = compiled["Q_CBA_CI"].collect()
    assert [(r["CI_ID"], r["WHAT"]) for r in rows] == [(2, "ent: none")]
