"""Emit layer: the rendered Spark SQL artifacts parse with Spark's own
parser AND, when executed, produce the same results as the DataFrame
compiler (SQL path == DataFrame path lock-step)."""

import json

from pyspark.sql import functions as F

from confluent_data_ingestion_spark.emit import (
    emit_bundle,
    emit_yaml_bundles,
    validate_statements,
)
from confluent_data_ingestion_spark.plans import compile_pipeline
from confluent_data_ingestion_spark.spec import load_spec


def _spec():
    def R(**kw):
        return kw

    return load_spec(
        [
            R(PipelineStage="VIEW", TargetTable="V_ACCT", TargetColumn="acct_id",
              TargetDataType="BIGINT", IsTargetPK="Y", FieldSelector="acct_id",
              FilterPredicate="JSON_VALUE(CAST(val AS STRING), '$.tbl') = 'acct'"),
            R(PipelineStage="VIEW", TargetTable="V_ACCT", TargetColumn="seq",
              TargetDataType="BIGINT", FieldSelector="seq"),
            R(PipelineStage="VIEW", TargetTable="V_ACCT", TargetColumn="status",
              TargetDataType="STRING", FieldSelector="status"),
            R(PipelineStage="XREF", TargetTable="XREF_ACCT", TargetColumn="acct_id",
              TargetDataType="BIGINT", IsTargetPK="Y", SourceTable="V_ACCT",
              FieldSelector="acct_id", OrderByFields="seq"),
            R(PipelineStage="XREF", TargetTable="XREF_ACCT", TargetColumn="seq",
              TargetDataType="BIGINT", SourceTable="V_ACCT", FieldSelector="seq"),
            R(PipelineStage="XREF", TargetTable="XREF_ACCT", TargetColumn="status",
              SourceTable="V_ACCT", FieldSelector="status"),
            R(PipelineStage="FGAC", TargetTable="FGAC_ACCT", TargetColumn="acct_id",
              TargetDataType="BIGINT", IsTargetPK="Y", SourceTable="XREF_ACCT",
              FieldSelector="s.acct_id", JoinTable="dim", JoinAlias="d",
              JoinType="INNER", JoinCondition="s.acct_id = d.id"),
            R(PipelineStage="FGAC", TargetTable="FGAC_ACCT", TargetColumn="masked",
              SourceTable="XREF_ACCT", SourceTransformExpr="s.status",
              ExprOverride="mask:sha2"),
        ],
        table_matrix={"XREF_ACCT": {"changelog.mode": "upsert",
                                    "topic": "${table_name}_topic"}},
    )


def _envelope(spark):
    msgs = [
        {"tbl": "acct", "acct_id": 1, "seq": 1, "status": "new"},
        {"tbl": "acct", "acct_id": 1, "seq": 2, "status": "active"},
        {"tbl": "acct", "acct_id": 2, "seq": 1, "status": "new"},
        {"tbl": "other", "acct_id": 9, "seq": 1, "status": "x"},
    ]
    return spark.createDataFrame([(json.dumps(m),) for m in msgs], "val string")


def test_bundle_sections_and_yaml():
    b = emit_bundle(_spec())
    assert "CREATE OR REPLACE TEMPORARY VIEW V_ACCT" in b["views.sql"]
    assert "CREATE TABLE IF NOT EXISTS XREF_ACCT" in b["tables.sql"]
    assert "PRIMARY KEY (acct_id) NOT ENFORCED" in b["tables.sql"]
    assert "'changelog.mode'='upsert'" in b["tables.sql"]
    assert "'topic'='XREF_ACCT_topic'" in b["tables.sql"]  # ${table_name} macro
    assert "ROW_NUMBER() OVER (PARTITION BY acct_id ORDER BY seq DESC" in b["inserts.sql"]
    assert "EXECUTE STATEMENT SET" in b["00_all.sql"]
    import yaml

    y = yaml.safe_load(emit_yaml_bundles(_spec())["inserts.yaml"])
    assert len(y["statements"]) == 2


def test_all_statements_parse(spark):
    b = emit_bundle(_spec())
    report = validate_statements(spark, b["00_all.sql"])
    bad = [r for r in report if not r["ok"]]
    assert not bad, bad


def test_emitted_sql_matches_compiler(spark):
    spec = _spec()
    env = _envelope(spark)
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, segment string")
    compiled = compile_pipeline(spark, spec, {"raw": env, "dim": dim})

    env.createOrReplaceTempView("raw")
    b = emit_bundle(spec)
    for stmt in b["views.sql"].split(";"):
        if stmt.strip():
            spark.sql(stmt)
    # view parity
    sql_rows = sorted(map(tuple, spark.sql("SELECT * FROM V_ACCT").collect()))
    df_rows = sorted(map(tuple, compiled["V_ACCT"].collect()))
    assert sql_rows == df_rows
    # xref parity: execute the insert's SELECT body
    ins = b["inserts.sql"].split(";")[0]
    body = ins[ins.index("SELECT"):]
    sql_rows = sorted(map(tuple, spark.sql(body).collect()))
    df_rows = sorted(map(tuple, compiled["XREF_ACCT"].collect()))
    assert sql_rows == df_rows
    assert [r[2] for r in sql_rows] == ["active", "new"]  # latest won


def test_validate_statements_multi_dialect_chain(spark):
    from confluent_data_ingestion_spark.emit import validate_statements_multi

    sql = """
    SELECT a, COUNT(*) FROM t GROUP BY a;
    SELECT a FROM t LATERAL VIEW explode(xs) e AS x;
    SELEC broken FRM t
    """
    rep = validate_statements_multi(spark, sql)
    # plain ANSI parses under the first dialect in the chain
    assert rep[0]["ok"] and rep[0]["dialect"] == "spark"
    assert rep[0]["spark_ok"] and rep[0]["duckdb_ok"]
    # Spark-only syntax: accepted by spark, rejected by duckdb — the
    # per-dialect columns record the split, like the reference's report
    assert rep[1]["ok"] and rep[1]["spark_ok"] and not rep[1]["duckdb_ok"]
    assert rep[1]["duckdb_error"]
    # garbage parses nowhere
    assert not rep[2]["ok"] and rep[2]["dialect"] == ""
    assert not rep[2]["spark_ok"] and not rep[2]["duckdb_ok"]
