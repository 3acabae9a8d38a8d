"""Unit tests for duplicate_provenance (cross-source dup-flow matrix)
and vocab_coverage (per-group OOV-rate report)."""

from __future__ import annotations

from confluent_data_ingestion_spark.operators.dedup import (
    duplicate_provenance,
)
from confluent_data_ingestion_spark.operators.text import vocab_coverage


def test_duplicate_provenance_symmetric_rollup(spark):
    pairs = spark.createDataFrame(
        [
            (1, 2),   # srcA-srcB
            (3, 4),   # srcB-srcA  -> same unordered cell
            (1, 5),   # srcA-srcA  -> diagonal
            (2, 6),   # srcB-srcC
        ],
        "doc_a long, doc_b long",
    )
    meta = spark.createDataFrame(
        [(1, "srcA"), (2, "srcB"), (3, "srcB"), (4, "srcA"),
         (5, "srcA"), (6, "srcC")],
        "doc_id long, source string",
    )
    got = {
        (r["source_a"], r["source_b"]): r["n_pairs"]
        for r in duplicate_provenance(pairs, meta).collect()
    }
    assert got == {
        ("srcA", "srcB"): 2,
        ("srcA", "srcA"): 1,
        ("srcB", "srcC"): 1,
    }


def test_duplicate_provenance_custom_group_col(spark):
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    meta = spark.createDataFrame(
        [(1, "en"), (2, "de")], "doc_id long, lang string"
    )
    rows = duplicate_provenance(pairs, meta, group_col="lang").collect()
    assert rows[0].asDict() == {
        "lang_a": "de", "lang_b": "en", "n_pairs": 1
    }


def test_vocab_coverage_hand_computed(spark):
    # corpus types: a(x4), b(x3), c(x2), d(x1); vocab_size=2 -> {a, b}
    docs = spark.createDataFrame(
        [
            ("g1", "a a b c"),
            ("g1", "a b"),
            ("g2", "a b c d"),
            ("g2", ""),
            ("g2", None),
        ],
        "lang string, text string",
    )
    got = {
        r["lang"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in vocab_coverage(docs, 2, "text", "lang").collect()
    }
    # g1: 6 tokens, oov = c(1) -> 1/6; g2: 4 tokens, oov = c,d -> 2/4
    assert got == {
        "g1": (6, 1, round(1 / 6, 6)),
        "g2": (4, 2, 0.5),
    }


def test_vocab_coverage_tie_break_is_lexical(spark):
    # b and c tie at 2 occurrences; vocab_size=2 keeps a (3) and b (tie
    # broken lexically) -> c is OOV
    docs = spark.createDataFrame(
        [("g", "a a a b b c c")], "lang string, text string"
    )
    r = vocab_coverage(docs, 2, "text", "lang").collect()[0]
    assert (r["n_tokens"], r["n_oov"]) == (7, 2)


def test_vocab_coverage_full_vocab_has_zero_oov(spark):
    docs = spark.createDataFrame(
        [("g", "x y z")], "lang string, text string"
    )
    r = vocab_coverage(docs, 10, "text", "lang").collect()[0]
    assert r["n_oov"] == 0 and r["oov_rate"] == 0.0
