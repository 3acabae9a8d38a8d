"""Encoding-sniffed CSV spec input (reference UI accepts chardet-sniffed
CSV STTMs, ``sttm2flink-ui-5_4/sttm2flink/generator.py:19-31``): a latin-1
or BOM'd CSV must load to the same spec/emitted SQL as its UTF-8 twin."""

import csv
import io

from confluent_data_ingestion_spark.emit.render import emit_bundle
from confluent_data_ingestion_spark.spec.csvio import (
    read_csv_records,
    sniff_encoding,
)
from confluent_data_ingestion_spark.spec.detect import load_any_spec
from confluent_data_ingestion_spark.spec.models import PipelineSpec

HEADERS = ["PipelineStage", "TargetTable", "TargetColumn", "TargetDataType",
           "IsTargetPK", "FieldSelector", "FilterPredicate"]
ROWS = [
    ["VIEW", "café_view", "CI_ID", "INT", "Y", "CI_ID",
     "INFA_TABLE_NAME LIKE '%CBA_CI'"],
    ["VIEW", "café_view", "NM", "STRING", "", "NM", ""],
]


def _write_csv(path, encoding):
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(HEADERS)
    w.writerows(ROWS)
    with open(path, "w", encoding=encoding, newline="") as f:
        f.write(buf.getvalue())


def test_sniff_encoding_ladder():
    assert sniff_encoding("plain ascii".encode()) == "utf-8"
    assert sniff_encoding("café".encode("utf-8")) == "utf-8"
    assert sniff_encoding("café".encode("latin-1")) == "latin-1"
    assert sniff_encoding(b"\xef\xbb\xbfcol1,col2") == "utf-8-sig"
    assert sniff_encoding("a,b".encode("utf-16")) == "utf-16"


def test_latin1_csv_loads_like_utf8_twin(tmp_path):
    utf8 = tmp_path / "spec_utf8.csv"
    lat1 = tmp_path / "spec_latin1.csv"
    bom = tmp_path / "spec_bom.csv"
    _write_csv(utf8, "utf-8")
    _write_csv(lat1, "latin-1")
    _write_csv(bom, "utf-8-sig")

    specs = [load_any_spec(str(p)) for p in (utf8, lat1, bom)]
    assert all(isinstance(s, PipelineSpec) for s in specs)
    # same parsed rows: the accented table name survives every encoding
    for s in specs[1:]:
        assert [r.model_dump() for r in s.rows] == \
            [r.model_dump() for r in specs[0].rows]
    assert specs[1].rows[0].target_table == "café_view"
    # and the emitted SQL is byte-identical across encodings
    sqls = {emit_bundle(s)["00_all.sql"] for s in specs}
    assert len(sqls) == 1


def test_utf16_records_roundtrip(tmp_path):
    p = tmp_path / "spec_utf16.csv"
    _write_csv(p, "utf-16")
    recs = read_csv_records(str(p))
    assert recs[0]["TargetTable"] == "café_view"
