"""Distributed BPE training vs a pure-Python reference implementation
(greedy most-frequent-pair merges, count-desc/lexicographic tiebreak)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F


def _py_bpe(texts, n_merges):
    """Independent reference: Sennrich-style BPE on whitespace words."""
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[w] += 1
    segs = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, cnt in words.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += cnt
        if not pairs:
            break
        (a, b), pc = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, a + b, pc))
        for w in segs:
            s, out, carry = segs[w], [], None
            for x in s:
                if carry is None:
                    carry = x
                elif carry == a and x == b:
                    out.append(a + b)
                    carry = None
                else:
                    out.append(carry)
                    carry = x
            if carry is not None:
                out.append(carry)
            segs[w] = out
    return merges, segs


def _texts(spark, sf_dir, n=60):
    from confluent_data_ingestion_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    sub = docs.filter(F.col("doc_id") % 8 == 0).select("doc_id", "text")
    return sub, [r.text for r in sub.collect()]


def test_merges_match_python_reference(spark, sf_dir):
    from confluent_data_ingestion_spark.operators.tokenize import (
        bpe_train_merges,
    )

    sub, texts = _texts(spark, sf_dir)
    want, _ = _py_bpe(texts, 8)
    got = [
        (r.left, r.right, r.merged, r.pair_count)
        for r in bpe_train_merges(sub, n_merges=8).orderBy("rank").collect()
    ]
    assert got == want


def test_segment_matches_python_reference(spark, sf_dir):
    from confluent_data_ingestion_spark.operators.tokenize import (
        bpe_segment, bpe_train_merges,
    )

    sub, texts = _texts(spark, sf_dir)
    merges = bpe_train_merges(sub, n_merges=6)
    _, segs = _py_bpe(texts, 6)
    out = bpe_segment(sub, merges).collect()
    for r in out:
        want = [segs[w] for w in r.text.split(" ") if w]
        got = [list(t) for t in r.tokens if t]
        assert got == want, r.text

    # segmentation is lossless: concatenating tokens restores each word
    # (empty words are dropped before segmenting, mirroring training)
    for r in out:
        words = [w for w in r.text.split(" ") if w]
        assert len(words) == len(r.tokens)
        for w, toks in zip(words, r.tokens):
            assert "".join(toks) == w


def test_segment_irregular_whitespace_drops_empty_words(spark):
    """Consecutive/leading/trailing spaces yield empty words; training's
    word table drops them, so segmentation must too — otherwise the
    engine emits an empty token the SQL oracle (which inner-joins on
    non-empty words) never sees, shifting every later position."""
    from confluent_data_ingestion_spark.operators.tokenize import (
        bpe_segment, bpe_train_merges,
    )

    texts = ["ab  ab ab", " ab ab", "ab ab ", "cd  cd", "   "]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train_merges(df, n_merges=2)
    _, segs = _py_bpe(texts, 2)
    got = {r.doc_id: [list(t) for t in r.tokens]
           for r in bpe_segment(df, merges).collect()}
    for i, t in enumerate(texts):
        want = [segs[w] for w in t.split(" ") if w]
        assert got[i] == want, t


def test_segment_plan_is_zero_shuffle(spark, sf_dir):
    from confluent_data_ingestion_spark.operators.tokenize import (
        bpe_segment, bpe_train_merges,
    )

    sub, _ = _texts(spark, sf_dir)
    merges = bpe_train_merges(sub, n_merges=3)
    plan = (
        bpe_segment(sub, merges)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_n_merges_validation(spark, sf_dir):
    from confluent_data_ingestion_spark.operators.tokenize import (
        bpe_train_merges,
    )

    sub, _ = _texts(spark, sf_dir)
    with pytest.raises(ValueError):
        bpe_train_merges(sub, n_merges=0)
