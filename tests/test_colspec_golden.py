"""Golden-file parity: our column-spec emitter (dialect='flink') reproduces
the reference's committed output ``resources/output/final-output.sql`` from
the reference's committed input ``resources/STTM_v3_template.xlsx``.

The golden file has one known hand-edit wart (SURVEY.md section 5: the
hm_cba_ci insert lost a ``then`` keyword at final-output.sql:98), so that
single insert is compared against the *template's* expression instead.
"""

import os
import re

import pytest

from confluent_data_ingestion_spark.emit.colspec_render import (
    render_colspec_inserts,
    render_colspec_script,
    render_colspec_sinks,
    render_colspec_views,
)
from confluent_data_ingestion_spark.spec.colspec import load_colspec

WB = "/root/reference/resources/STTM_v3_template.xlsx"
GOLDEN = "/root/reference/resources/output/final-output.sql"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(WB) and os.path.exists(GOLDEN)),
    reason="reference artifacts not present")


def _norm_stmts(text: str) -> list[str]:
    """Whitespace-insensitive statement list."""
    text = _strip_comments(text)
    out = []
    for stmt in text.split(";"):
        s = re.sub(r"\s+", " ", stmt).strip()
        if s:
            out.append(s)
    return out


def _strip_comments(text: str) -> str:
    return "\n".join(l for l in text.splitlines() if not l.strip().startswith("--"))


def test_views_section_matches_golden():
    spec = load_colspec(WB)
    golden = open(GOLDEN).read()
    g_views = golden.split("-- ===== SINK TABLES =====")[0]
    ours = render_colspec_views(spec, dialect="flink")
    assert _norm_stmts(_strip_comments(ours)) == _norm_stmts(_strip_comments(g_views))


def test_sinks_section_matches_golden():
    spec = load_colspec(WB)
    golden = open(GOLDEN).read()
    g_sinks = golden.split("-- ===== SINK TABLES =====")[1].split("-- ===== INSERTS =====")[0]
    ours = render_colspec_sinks(spec, dialect="flink")
    assert _norm_stmts(_strip_comments(ours)) == _norm_stmts(_strip_comments(g_sinks))


def test_inserts_match_golden_except_known_wart():
    spec = load_colspec(WB)
    golden = open(GOLDEN).read()
    g_ins = golden.split("-- ===== INSERTS =====")[1]
    ours = render_colspec_inserts(spec, dialect="flink")

    def inserts_by_target(text: str) -> dict[str, str]:
        body = text.replace("execute statement set", "").replace("begin", "", 1)
        body = body.rsplit("end", 1)[0]
        out = {}
        for stmt in _norm_stmts(body):
            m = re.match(r"INSERT INTO (\S+)", stmt)
            if m:
                out[m.group(1)] = stmt
        return out

    g, o = inserts_by_target(g_ins), inserts_by_target(ours)
    assert set(g) == set(o) == {
        "hm_cba_ci", "hm_cba_ci_xref", "hm_cba_ci_adr",
        "hm_cba_ci_adr_fgac", "hm_cba_ci_quarantine",
    }
    for t in g:
        if t == "hm_cba_ci":
            # golden lost a 'then' in hand-editing (final-output.sql:98);
            # our emit keeps the template's (valid) expression
            assert g[t].replace(" then to_timestamp_ltz", " to_timestamp_ltz") \
                == o[t].replace(" then to_timestamp_ltz", " to_timestamp_ltz")
        else:
            assert g[t] == o[t], t


def test_spark_dialect_script_parses(spark):
    from confluent_data_ingestion_spark.emit import validate_statements

    spec = load_colspec(WB)
    script = render_colspec_script(spec, dialect="spark")
    assert "get_json_object" in script and "json_value" not in script
    report = validate_statements(spark, _strip_comments(
        script.split("-- ===== INSERTS =====")[0]))
    assert all(r["ok"] for r in report), [r for r in report if not r["ok"]]