"""CLI artifact parity: one command from workbook to artifact directory
(reference ``scripts/sttm_to_flink_v22.py:403-422`` main +
``sttm2flink-ui-5_4/sttm2flink/utils.py:28-87`` zip bundling)."""

import os
import zipfile

import pytest

from confluent_data_ingestion_spark.__main__ import main

WB = "/root/reference/resources/STTM_v22.xlsx"

pytestmark = pytest.mark.skipif(
    not os.path.exists(WB), reason="reference workbook not present")


def test_cli_generate_artifact_set(tmp_path):
    out = tmp_path / "artifacts"
    rc = main(["generate", WB, str(out)])
    assert rc == 0

    names = {p.name for p in out.iterdir()}
    assert {"00_all.sql", "views.sql", "tables.sql", "inserts.sql",
            "issues_v22.csv", "views.yaml", "sinks.yaml", "inserts.yaml",
            "bundle.zip"} <= names

    all_sql = (out / "00_all.sql").read_text()
    assert "-- ===== VIEWS =====" in all_sql
    assert "-- ===== TABLES =====" in all_sql
    assert "-- ===== EXECUTE STATEMENT SET" in all_sql

    issues = (out / "issues_v22.csv").read_text().splitlines()
    assert issues[0] == "severity,table,message"
    assert len(issues) > 1  # the BA workbook carries known warnings

    zf = zipfile.ZipFile(out / "bundle.zip")
    assert set(zf.namelist()) == {
        "bundle/create.sql", "bundle/views.sql",
        "bundle/inserts_statement_set.sql", "validation/issues.csv",
    }
    # grouped files carry the same statements as the flat artifacts
    assert zf.read("bundle/views.sql").decode().strip() == \
        (out / "views.sql").read_text().strip()


def test_cli_no_zip_and_fail_on_error(tmp_path):
    out = tmp_path / "nozip"
    rc = main(["generate", WB, str(out), "--no-zip"])
    assert rc == 0
    assert not (out / "bundle.zip").exists()
    # the v22 workbook has warnings but no errors: --fail-on-error still 0
    rc = main(["generate", WB, str(tmp_path / "f"), "--fail-on-error"])
    assert rc == 0


COLSPEC_WB = "/root/reference/resources/STTM_v3_template.xlsx"


@pytest.mark.skipif(not os.path.exists(COLSPEC_WB),
                    reason="reference colspec template not present")
def test_cli_generate_colspec_script(tmp_path):
    out = tmp_path / "colspec"
    rc = main(["generate", COLSPEC_WB, str(out)])
    assert rc == 0
    script = (out / "00_all.sql").read_text()
    assert "CREATE" in script and "INSERT" in script
    zf = zipfile.ZipFile(out / "bundle.zip")
    assert zf.namelist() == ["bundle/00_all.sql"]
    assert zf.read("bundle/00_all.sql").decode() == script


def test_cli_query_list_and_run(tmp_path, capsys):
    """`query --list` prints every registry name without a Spark session;
    `query <name>` runs the operator against --sf-dir, prints rows, and
    --out writes the full result as parquet."""
    rc = main(["query", "--list"])
    assert rc == 0
    names = capsys.readouterr().out.split()
    assert "view_csv_positional" in names and len(names) >= 140

    rc = main(["query", "nope_not_a_query"])
    assert rc == 2

    out = tmp_path / "res"
    rc = main([
        "query", "view_csv_positional",
        "--sf-dir", "/root/testdata/sf0.001",
        "--limit", "3", "--out", str(out),
    ])
    assert rc == 0
    assert "view_csv_positional" not in capsys.readouterr().err
    import pyspark.sql

    spark = pyspark.sql.SparkSession.getActiveSession()
    assert spark is not None and spark.read.parquet(str(out)).count() > 0
