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


# ---------------------------------------------------------------------------
# doremi_reweight
# ---------------------------------------------------------------------------


def test_doremi_reweight_hand_computed(spark):
    import math

    from confluent_data_ingestion_spark.operators.sampling import (
        doremi_reweight,
    )

    # dom A: losses 1.0, 2.0 -> avg 1.5; dom B: 1.0 -> avg 1.0 (baseline)
    df = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("B", 1.0)], "source string, loss double"
    )
    out = {
        r["source"]: r
        for r in doremi_reweight(df, eta=1.0, smoothing=0.25).collect()
    }
    assert out["A"]["n_docs"] == 2 and out["B"]["n_docs"] == 1
    assert out["A"]["avg_loss"] == 1.5
    assert out["A"]["excess"] == 0.5
    assert out["B"]["excess"] == 0.0
    fa = round(math.exp(0.5), 12)
    fb = 1.0
    wa = 0.75 * (fa / (fa + fb)) + 0.25 / 2
    wb = 0.75 * (fb / (fa + fb)) + 0.25 / 2
    assert out["A"]["weight"] == round(wa, 6)
    assert out["B"]["weight"] == round(wb, 6)
    # harder domain strictly upweighted; weights sum to ~1
    assert out["A"]["weight"] > out["B"]["weight"]
    assert abs(out["A"]["weight"] + out["B"]["weight"] - 1.0) < 2e-6


def test_doremi_reweight_uniform_losses_give_uniform_weights(spark):
    from confluent_data_ingestion_spark.operators.sampling import (
        doremi_reweight,
    )

    df = spark.createDataFrame(
        [("A", 2.0), ("B", 2.0), ("C", 2.0)], "source string, loss double"
    )
    ws = {
        r["source"]: r["weight"]
        for r in doremi_reweight(df, smoothing=0.25).collect()
    }
    assert set(ws.values()) == {round(1 / 3, 6)}


def test_doremi_reweight_rejects_bad_smoothing(spark):
    import pytest as _pytest

    from confluent_data_ingestion_spark.operators.sampling import (
        doremi_reweight,
    )

    df = spark.createDataFrame([("A", 1.0)], "source string, loss double")
    with _pytest.raises(ValueError):
        doremi_reweight(df, smoothing=1.0)


# ---------------------------------------------------------------------------
# rank_agreement
# ---------------------------------------------------------------------------


def test_rank_agreement_hand_computed(spark):
    from confluent_data_ingestion_spark.operators.retrieval import (
        rank_agreement,
    )

    # q0: A = [1, 2, 3], B = [2, 1, 4] (ranks 1..3 each)
    # common {1, 2}: A ranks (1, 2), B ranks (2, 1) -> 1 discordant pair
    # union {1,2,3,4} -> jaccard 0.5; tau = -1
    # q1: only in run A -> n_common 0, jaccard 0, tau NULL
    a = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3), (1, 9, 1)],
        "query_id long, doc_id long, rank int",
    )
    b = spark.createDataFrame(
        [(0, 2, 1), (0, 1, 2), (0, 4, 3)],
        "query_id long, doc_id long, rank int",
    )
    got = {
        r["query_id"]: (r["n_common"], r["jaccard_k"], r["kendall_tau"])
        for r in rank_agreement(a, b, k=3).collect()
    }
    assert got == {
        0: (2, 0.5, -1.0),
        1: (0, 0.0, None),
    }


def test_rank_agreement_identical_runs(spark):
    from confluent_data_ingestion_spark.operators.retrieval import (
        rank_agreement,
    )

    a = spark.createDataFrame(
        [(0, d, r) for r, d in enumerate([5, 3, 8, 1], start=1)],
        "query_id long, doc_id long, rank int",
    )
    r = rank_agreement(a, a, k=4).collect()[0]
    assert (r["n_common"], r["jaccard_k"], r["kendall_tau"]) == (4, 1.0, 1.0)


# ---------------------------------------------------------------------------
# truncation_recall
# ---------------------------------------------------------------------------


def test_truncation_recall_perfect_when_prefix_carries_signal(spark):
    from confluent_data_ingestion_spark.operators.similarity import (
        truncation_recall,
    )

    # vectors whose tail is ZERO: dot products and norms are identical
    # with or without it, so truncation cannot change any cosine ->
    # recall 1.0 (the MRL best case)
    rows = [
        (i, [float(i % 7), float((i * 3) % 5), 0.0, 0.0])
        for i in range(1, 30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = truncation_recall(
        df, df.filter("vec_id % 10 = 0"), k=3, dims=2
    ).collect()
    assert len(out) == 2  # queries 10, 20
    assert all(r["recall_at_k"] == 1.0 and r["n_overlap"] == 3 for r in out)


def test_truncation_recall_zero_when_signal_in_tail(spark):
    from confluent_data_ingestion_spark.operators.similarity import (
        truncation_recall,
    )

    # prefix constant, ALL signal in the tail: the truncated ranking is
    # pure tie-break noise; engineered so the tie-broken top-1 differs
    # from the true top-1
    rows = [
        (1, [1.0, 0.0, 0.0]),   # query
        (2, [1.0, 0.9, 0.1]),
        (3, [1.0, 0.0, 1.0]),   # true nearest (tail matches query's 0 tail? no)
        (4, [1.0, 0.01, 0.0]),  # true nearest by tail; id sorts after 2, 3
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = truncation_recall(
        df, df.filter("vec_id = 1"), k=1, dims=1
    ).collect()[0]
    # full top-1 = vec 4 (tail [0.01, 0] closest in angle to [0, 0]...
    # all prefixes equal so truncated cosine ties at 1.0 -> tie-break
    # picks min neighbor_id = 2 -> zero overlap
    assert out["n_overlap"] == 0 and out["recall_at_k"] == 0.0


def test_truncation_recall_rejects_bad_dims(spark):
    import pytest as _pytest

    from confluent_data_ingestion_spark.operators.similarity import (
        truncation_recall,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError):
        truncation_recall(df, df, dims=0)


# ---------------------------------------------------------------------------
# ols_trend
# ---------------------------------------------------------------------------


def test_ols_trend_exact_line(spark):
    from confluent_data_ingestion_spark.operators.stats import ols_trend

    # key 1: y = 2x + 1 exactly -> slope 2, intercept 1, r2 = 1
    # key 2: single point -> NULLs
    # key 3: flat line y = 5 -> slope 0, intercept 5, r2 NULL (0/0)
    rows = (
        [(1, x, 2.0 * x + 1.0) for x in range(5)]
        + [(2, 3, 7.0)]
        + [(3, x, 5.0) for x in range(4)]
    )
    df = spark.createDataFrame(rows, "k long, x int, y double")
    got = {
        r["k"]: (r["n_points"], r["slope"], r["intercept"], r["r2"])
        for r in ols_trend(df, "k", "x", "y").collect()
    }
    assert got[1] == (5, 2.0, 1.0, 1.0)
    assert got[2] == (1, None, None, None)
    assert got[3] == (4, 0.0, 5.0, None)


def test_ols_trend_null_coordinates_dropped(spark):
    from confluent_data_ingestion_spark.operators.stats import ols_trend

    # key 1: exact line plus two junk rows (null x / null y) — the fit and
    # n_points must both ignore them (counting them while the sums skip
    # them would corrupt every derived statistic)
    # key 2: all rows null-coordinate -> key absent entirely
    rows = (
        [(1, x, 2.0 * x + 1.0) for x in range(5)]
        + [(1, None, 99.0), (1, 9, None), (2, None, 1.0), (2, 4, None)]
    )
    df = spark.createDataFrame(rows, "k long, x int, y double")
    got = {
        r["k"]: (r["n_points"], r["slope"], r["intercept"], r["r2"])
        for r in ols_trend(df, "k", "x", "y").collect()
    }
    assert got == {1: (5, 2.0, 1.0, 1.0)}


def test_ols_trend_matches_numpy(spark):
    import numpy as np

    from confluent_data_ingestion_spark.operators.stats import ols_trend

    xs = [0, 1, 2, 5, 7, 11, 13]
    ys = [3.1, 4.9, 4.2, 9.8, 11.5, 18.0, 19.25]
    df = spark.createDataFrame(
        list(zip([1] * len(xs), xs, ys)), "k long, x int, y double"
    )
    r = ols_trend(df, "k", "x", "y").collect()[0]
    slope, intercept = np.polyfit(xs, ys, 1)
    corr = np.corrcoef(xs, ys)[0, 1]
    # operator derives intercept from the 6-dp-rounded slope: compare
    # against the same construction
    assert r["slope"] == round(float(slope), 6)
    assert abs(r["intercept"] - float(intercept)) < 1e-4
    assert abs(r["r2"] - float(corr) ** 2) < 1e-6


# ---------------------------------------------------------------------------
# engine-parity property: ols_trend vs a DuckDB replica on random frames
# (the strongest oracle form — this is the class of test that would have
# caught the round(double, 6) shortest-string divergence pre-gate)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_OLS_SQL = """
WITH s AS (
  SELECT k, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
         sum(CAST(round(y, 6) AS DECIMAL(18,6))) AS sy,
         -- width-28 casts push DuckDB onto the hugeint path (the
         -- int64 width-18 multiply overflows); values are identical
         sum(CAST(round(y, 6) AS DECIMAL(28,6))
             * CAST(round(y, 6) AS DECIMAL(28,6))) AS syy,
         sum(x * CAST(round(y, 6) AS DECIMAL(28,6))) AS sxy
  FROM pts WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY 1
),
d AS (
  SELECT k, n, sx, sy,
    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny
  FROM s
),
sl AS (SELECT *, CASE WHEN denx > 0 THEN
                   floor((num / denx) * 1000000.0 + 0.5) / 1000000.0
                 END AS slope FROM d)
SELECT k, CAST(n AS BIGINT) AS n_points, slope,
       CASE WHEN slope IS NOT NULL
            THEN floor(((CAST(sy AS DOUBLE) - slope * sx) / n)
                       * 1000000.0 + 0.5) / 1000000.0 END AS intercept,
       CASE WHEN denx > 0 AND deny > 0
            THEN floor((pow(num, 2) / (denx * deny))
                       * 1000000.0 + 0.5) / 1000000.0 END AS r2
FROM sl
"""


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),       # key
            st.one_of(st.none(),                          # null x drops row
                      st.integers(min_value=0, max_value=40)),
            st.one_of(st.none(),                          # null y drops row
                      st.floats(min_value=-1000, max_value=1000,
                                allow_nan=False, allow_infinity=False)),
        ),
        min_size=1, max_size=30,
    )
)
@settings(max_examples=10, deadline=None)
def test_ols_trend_engine_parity(spark, pts):
    import duckdb
    import pandas as pd

    from confluent_data_ingestion_spark.operators.stats import ols_trend

    rows = [(k, x, None if y is None else round(y, 4)) for k, x, y in pts]
    df = spark.createDataFrame(rows, "k long, x int, y double")
    got = {
        r["k"]: (r["n_points"], r["slope"], r["intercept"], r["r2"])
        for r in ols_trend(df, "k", "x", "y").collect()
    }
    con = duckdb.connect()
    con.register("pts", pd.DataFrame(rows, columns=["k", "x", "y"]))
    want = {
        int(k): (int(n), s, i, r)
        for k, n, s, i, r in con.execute(_OLS_SQL).fetchall()
    }
    assert got == want
