"""Round-14 operators: declarative data contracts, mutual-margin
matching, waterfilling budget allocation, EWMA residuals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from confluent_data_ingestion_spark.operators.contracts import (
    validate_contract,
)
from confluent_data_ingestion_spark.operators.sampling import (
    token_budget_waterfill,
)
from confluent_data_ingestion_spark.operators.similarity import (
    mutual_margin_pairs,
)
from confluent_data_ingestion_spark.operators.stats import ewma_residual


# ---------------------------------------------------------------------------
# validate_contract
# ---------------------------------------------------------------------------


def _report(df, checks, refs=None):
    rows = validate_contract(df, checks, refs).collect()
    return {(r["check"], r["column"]): r for r in rows}


def test_contract_clean_table_all_pass(spark):
    df = spark.createDataFrame(
        [(1, "O", 10.0), (2, "F", 20.0), (3, "P", 30.0)],
        "k long, st string, v double",
    )
    rep = _report(df, [
        {"check": "not_null", "column": "k"},
        {"check": "unique", "column": "k"},
        {"check": "min", "column": "v", "value": 5.0},
        {"check": "max", "column": "v", "value": 30.0},
        {"check": "in_set", "column": "st", "values": ["O", "F", "P"]},
        {"check": "matches", "column": "st", "pattern": "^[OFP]$"},
    ])
    assert all(r["status"] == "pass" for r in rep.values())
    assert rep[("not_null", "k")]["observed"] == 1.0
    assert rep[("min", "v")]["observed"] == 10.0
    assert rep[("max", "v")]["observed"] == 30.0


def test_contract_violations_measured_exactly(spark):
    # 4 rows: one null key, one dup pair, one bad status
    df = spark.createDataFrame(
        [(1, "O"), (1, "F"), (None, "X"), (2, "O")],
        "k long, st string",
    )
    rep = _report(df, [
        {"check": "not_null", "column": "k"},           # 3/4
        {"check": "unique", "column": "k"},             # 2 distinct / 3
        {"check": "in_set", "column": "st",
         "values": ["O", "F"], "min_rate": 0.5},        # 3/4 -> pass
    ])
    assert rep[("not_null", "k")]["observed"] == 0.75
    assert rep[("not_null", "k")]["status"] == "fail"
    assert rep[("unique", "k")]["observed"] == round(2 / 3, 6)
    assert rep[("unique", "k")]["status"] == "fail"
    assert rep[("in_set", "st")]["observed"] == 0.75
    assert rep[("in_set", "st")]["status"] == "pass"


def test_contract_foreign_key_orphans(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    rep = _report(
        child,
        [{"check": "foreign_key", "column": "fk", "ref": "p",
          "ref_column": "pk"}],
        refs={"p": parent},
    )
    r = rep[("foreign_key", "fk")]
    # 1 orphan (9) out of 3 non-null children
    assert r["observed"] == round(1 / 3, 6)
    assert r["status"] == "fail"
    tol = _report(
        child,
        [{"check": "foreign_key", "column": "fk", "ref": "p",
          "ref_column": "pk", "max_orphan_rate": 0.5}],
        refs={"p": parent},
    )
    assert tol[("foreign_key", "fk")]["status"] == "pass"


def test_contract_rejects_bad_input(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="empty"):
        validate_contract(df, [])
    with pytest.raises(ValueError, match="unknown check kinds"):
        validate_contract(df, [{"check": "nope", "column": "k"}])
    with pytest.raises(ValueError, match="refs"):
        validate_contract(
            df,
            [{"check": "foreign_key", "column": "k", "ref": "missing",
              "ref_column": "k"}],
        )


# ---------------------------------------------------------------------------
# mutual_margin_pairs
# ---------------------------------------------------------------------------


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_mutual_margin_basic_match(spark):
    # a1 ~ b1 (aligned), a2 ~ b2 (aligned), cross pairs orthogonal-ish
    a = _vecs(spark, [(0, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])])
    b = _vecs(spark, [(1, [0.9, 0.1, 0.0]), (3, [0.1, 0.9, 0.0])])
    got = {
        (r["a_id"], r["b_id"])
        for r in mutual_margin_pairs(a, b, k=2, margin_threshold=1.0)
        .collect()
    }
    assert got == {(0, 1), (2, 3)}


def test_mutual_margin_requires_mutuality(spark):
    # b0 is everyone's favourite in B, but b0's top-1 in A is a0 —
    # so only (a0, b0) can survive; a1 must not match anything
    a = _vecs(spark, [(0, [1.0, 0.0]), (2, [0.8, 0.1])])
    b = _vecs(spark, [(1, [1.0, 0.05])])
    got = [
        (r["a_id"], r["b_id"])
        for r in mutual_margin_pairs(a, b, k=1, margin_threshold=0.0)
        .collect()
    ]
    assert got == [(0, 1)]


def test_mutual_margin_filters_flat_neighborhoods(spark):
    # the hub/flat-neighborhood failure mode the ratio margin exists
    # for: every vector is nearly equally close to everything (all
    # cross cosines ~1), so no pair STANDS OUT against its local
    # neighborhoods — margins sit at ~1.0 and a threshold strictly
    # above 1 rejects them all, while mutual top-1 alone (threshold 0)
    # would happily emit matches
    a = _vecs(spark, [
        (0, [1.0, 0.0]),
        (2, [0.998, 0.0632]),
    ])
    b = _vecs(spark, [
        (1, [0.9995, 0.0316]),
        (3, [0.9995, -0.0316]),
    ])
    strict = mutual_margin_pairs(
        a, b, k=2, margin_threshold=1.05
    ).collect()
    assert strict == []
    loose = mutual_margin_pairs(
        a, b, k=2, margin_threshold=0.0
    ).collect()
    assert len(loose) >= 1
    assert all(abs(r["margin"] - 1.0) < 0.05 for r in loose)


def test_mutual_margin_candidates_restrict_scoring(spark):
    a = _vecs(spark, [(0, [1.0, 0.0]), (2, [0.0, 1.0])])
    b = _vecs(spark, [(1, [0.9, 0.1]), (3, [0.1, 0.9])])
    cand = spark.createDataFrame(
        [(0, 1)], "a_id long, b_id long"
    )
    got = [
        (r["a_id"], r["b_id"])
        for r in mutual_margin_pairs(
            a, b, k=2, margin_threshold=0.0, candidates=cand
        ).collect()
    ]
    # only the candidate pair is scored, so only it can match
    assert got == [(0, 1)]
    with pytest.raises(ValueError, match="k must be"):
        mutual_margin_pairs(a, b, k=0)


# ---------------------------------------------------------------------------
# token_budget_waterfill
# ---------------------------------------------------------------------------


def _domains(spark, pairs):
    # document-level frame: one doc per (domain, tokens) entry
    return spark.createDataFrame(pairs, "d string, t long")


def test_waterfill_partial_cap(spark):
    df = _domains(spark, [("a", 10), ("b", 20), ("c", 100)])
    out = {
        r["domain"]: r
        for r in token_budget_waterfill(df, "d", "t", budget=60).collect()
    }
    assert out["a"]["tokens_alloc"] == 10.0 and not out["a"]["capped"]
    assert out["b"]["tokens_alloc"] == 20.0 and not out["b"]["capped"]
    assert out["c"]["tokens_alloc"] == 30.0 and out["c"]["capped"]
    assert out["c"]["level"] == 30.0


def test_waterfill_two_capped_domains_share_level(spark):
    # the case that breaks naive min-over-candidates level selection:
    # avail [10, 20, 100, 100], budget 70 -> level 20,
    # allocs [10, 20, 20, 20]
    df = _domains(
        spark, [("a", 10), ("b", 20), ("c", 100), ("d", 100)]
    )
    out = {
        r["domain"]: r
        for r in token_budget_waterfill(df, "d", "t", budget=70).collect()
    }
    assert out["a"]["tokens_alloc"] == 10.0
    assert out["b"]["tokens_alloc"] == 20.0
    assert out["c"]["tokens_alloc"] == 20.0 and out["c"]["capped"]
    assert out["d"]["tokens_alloc"] == 20.0 and out["d"]["capped"]
    total = sum(r["tokens_alloc"] for r in out.values())
    assert total == 70.0


def test_waterfill_budget_covers_everything(spark):
    df = _domains(spark, [("a", 10), ("b", 20)])
    out = {
        r["domain"]: r
        for r in token_budget_waterfill(df, "d", "t", budget=1000)
        .collect()
    }
    assert all(not r["capped"] for r in out.values())
    assert all(r["level"] is None for r in out.values())
    assert out["a"]["tokens_alloc"] == 10.0
    assert out["b"]["tokens_alloc"] == 20.0


def test_waterfill_zero_budget_and_doc_level_resum(spark):
    # two docs in domain a sum to 30; zero budget allocates zero
    df = _domains(spark, [("a", 10), ("a", 20), ("b", 5)])
    out = {
        r["domain"]: r
        for r in token_budget_waterfill(df, "d", "t", budget=0).collect()
    }
    assert out["a"]["tokens_available"] == 30
    assert out["a"]["tokens_alloc"] == 0.0 and out["a"]["capped"]
    assert out["b"]["tokens_alloc"] == 0.0 and out["b"]["capped"]
    with pytest.raises(ValueError, match="budget"):
        token_budget_waterfill(df, "d", "t", budget=-1)


# ---------------------------------------------------------------------------
# ewma_residual
# ---------------------------------------------------------------------------


def test_ewma_hand_computed(spark):
    # key 1 daily sums: d1=1, d2=2, d3=3 (d3 split across two events)
    # e1=1, e2=.25*2+.75*1=1.25 -> residual 3-1.25=1.75,
    # ewma_last=.25*3+.75*1.25=1.6875
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 1.0),
            (1, "2024-01-02 10:00:00", 2.0),
            (1, "2024-01-03 09:00:00", 1.0),
            (1, "2024-01-03 11:00:00", 2.0),
        ],
        "k long, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = ewma_residual(df, "k", "ts", "v", alpha=0.25).collect()[0]
    assert r["n_days"] == 3
    assert str(r["last_day"]) == "2024-01-03"
    assert r["last_value"] == 3.0
    assert r["ewma_prev"] == 1.25
    assert r["ewma_last"] == 1.6875
    assert r["residual"] == 1.75


def test_ewma_single_day_is_null_baseline(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 5.0)], "k long, ts string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = ewma_residual(df, "k", "ts", "v").collect()[0]
    assert r["n_days"] == 1
    assert r["ewma_prev"] is None and r["residual"] is None
    assert r["ewma_last"] == 5.0


def test_ewma_rejects_bad_alpha(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 5.0)], "k long, ts string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    for bad in (0.0, 1.0, -0.5, 2.0):
        with pytest.raises(ValueError, match="alpha"):
            ewma_residual(df, "k", "ts", "v", alpha=bad)


# ---------------------------------------------------------------------------
# group_kfold
# ---------------------------------------------------------------------------


def test_group_kfold_atomic_and_stable(spark):
    from confluent_data_ingestion_spark.operators.sampling import group_kfold

    df = spark.createDataFrame(
        [(i, i % 20) for i in range(200)], "row_id long, grp long"
    )
    out = group_kfold(df, "grp", k=5, seed="s").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["grp"], set()).add(r["fold"])
    # group-atomic: one fold per group
    assert all(len(v) == 1 for v in by_group.values())
    assert all(0 <= f < 5 for v in by_group.values() for f in v)
    # stable under re-evaluation
    again = {
        r["grp"]: r["fold"]
        for r in group_kfold(df, "grp", k=5, seed="s").collect()
    }
    assert {g: next(iter(v)) for g, v in by_group.items()} == again
    # a different seed reshuffles at least one group
    other = {
        r["grp"]: r["fold"]
        for r in group_kfold(df, "grp", k=5, seed="t").collect()
    }
    assert other != again


def test_group_kfold_rejects_bad_k(spark):
    from confluent_data_ingestion_spark.operators.sampling import group_kfold

    df = spark.createDataFrame([(1, 1)], "row_id long, grp long")
    with pytest.raises(ValueError, match="k must be"):
        group_kfold(df, "grp", k=1)


# ---------------------------------------------------------------------------
# allpairs_jaccard (prefix filtering)
# ---------------------------------------------------------------------------


def _pairs_set(rows):
    return {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in rows}


def test_allpairs_prefix_matches_capless_inverted_index(spark):
    from confluent_data_ingestion_spark.operators.dedup import (
        allpairs_jaccard,
        ngram_jaccard_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    words = base.split()
    docs = []
    # near-dup cluster (rotations), verbatim dup, and unrelated docs
    for i in range(4):
        docs.append((i, " ".join(words[i:] + words[:i])))
    docs.append((10, docs[0][1]))
    docs.append((11, "one two three four five six seven eight nine ten"))
    docs.append((12, "completely different text with other tokens here now"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for t in (0.2, 0.5, 0.8):
        got = _pairs_set(
            allpairs_jaccard(df, n=3, threshold=t).collect()
        )
        want = _pairs_set(
            ngram_jaccard_pairs(
                df, n=3, threshold=t, max_group_size=None
            ).collect()
        )
        assert got == want, f"threshold {t}: {got} != {want}"
    with pytest.raises(ValueError, match="threshold"):
        allpairs_jaccard(df, threshold=1.0)


def test_allpairs_prefix_finds_exact_duplicate(spark):
    from confluent_data_ingestion_spark.operators.dedup import (
        allpairs_jaccard,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "entirely unrelated content about weather and sports news"),
        ],
        "doc_id long, text string",
    )
    out = allpairs_jaccard(df, n=3, threshold=0.9).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in out] == [
        (1, 2, 1.0)
    ]


# ---------------------------------------------------------------------------
# lsh_candidate_pairs
# ---------------------------------------------------------------------------


def test_lsh_candidates_identical_vectors_always_collide(spark):
    from confluent_data_ingestion_spark.operators.similarity import (
        lsh_candidate_pairs,
        mutual_margin_pairs,
    )

    planes = [[0.3, -0.7, 0.2], [-0.5, 0.1, 0.9],
              [0.8, 0.4, -0.2], [-0.1, -0.6, 0.5]]
    a = _vecs(spark, [(0, [1.0, 2.0, 3.0]), (2, [-1.0, 0.5, 0.2])])
    b = _vecs(spark, [(1, [1.0, 2.0, 3.0]), (3, [5.0, -2.0, 1.0])])
    cand = {
        (r["a_id"], r["b_id"])
        for r in lsh_candidate_pairs(a, b, planes, bands=2).collect()
    }
    # identical vectors have identical signatures -> collide in every band
    assert (0, 1) in cand
    # candidate-fed scorer only emits candidate pairs
    out = mutual_margin_pairs(
        a, b, k=2, margin_threshold=0.0,
        candidates=lsh_candidate_pairs(a, b, planes, bands=2),
    ).collect()
    assert {(r["a_id"], r["b_id"]) for r in out} <= cand
    with pytest.raises(ValueError, match="divide"):
        lsh_candidate_pairs(a, b, planes, bands=3)
    with pytest.raises(ValueError, match="planes"):
        lsh_candidate_pairs(a, b, [], bands=1)


# ---------------------------------------------------------------------------
# incremental contract counters
# ---------------------------------------------------------------------------


def test_contract_counters_merge_equals_one_shot(spark):
    from confluent_data_ingestion_spark.operators.contracts import (
        contract_counters,
        merge_contract_counters,
        report_from_counters,
    )

    df = spark.createDataFrame(
        [(1, "O", 10.0), (2, "F", -3.0), (None, "X", 99.0), (4, "O", 7.0)],
        "k long, st string, v double",
    )
    checks = [
        {"check": "not_null", "column": "k"},
        {"check": "min", "column": "v", "value": 0.0},
        {"check": "max", "column": "v", "value": 50.0},
        {"check": "in_set", "column": "st", "values": ["O", "F"],
         "min_rate": 0.5},
    ]
    one_shot = {
        (r["check"], r["column"]): (r["observed"], r["status"])
        for r in validate_contract(df, checks).collect()
    }
    acc = None
    for i in range(3):
        batch = df.filter((F.coalesce("k", F.lit(0)) % 3) == i)
        part = contract_counters(batch, checks)
        acc = part if acc is None else merge_contract_counters(acc, part)
    merged = {
        (r["check"], r["column"]): (r["observed"], r["status"])
        for r in report_from_counters(acc, checks).collect()
    }
    assert merged == one_shot


def test_contract_counters_reject_unique_and_schema_mismatch(spark):
    from confluent_data_ingestion_spark.operators.contracts import (
        contract_counters,
        merge_contract_counters,
    )

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="unique"):
        contract_counters(df, [{"check": "unique", "column": "k"}])
    a = contract_counters(df, [{"check": "not_null", "column": "k"}])
    b = contract_counters(
        df, [{"check": "min", "column": "k", "value": 0.0}]
    )
    with pytest.raises(ValueError, match="schemas differ"):
        merge_contract_counters(a, b)


def test_contract_counters_empty_batch_is_neutral(spark):
    from confluent_data_ingestion_spark.operators.contracts import (
        contract_counters,
        merge_contract_counters,
        report_from_counters,
    )

    df = spark.createDataFrame([(1, 5.0), (2, 9.0)], "k long, v double")
    checks = [
        {"check": "not_null", "column": "k"},
        {"check": "min", "column": "v", "value": 0.0},
    ]
    full = contract_counters(df, checks)
    empty = contract_counters(df.filter(F.lit(False)), checks)
    merged = report_from_counters(
        merge_contract_counters(full, empty), checks
    ).collect()
    want = report_from_counters(full, checks).collect()
    assert sorted(map(tuple, merged)) == sorted(map(tuple, want))


# ---------------------------------------------------------------------------
# property tests: the strongest oracle form for the round's operators
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_WORDS = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta", "theta"]


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=3, max_size=12),
        min_size=2, max_size=8,
    ),
    t=st.sampled_from([0.2, 0.4, 0.6, 0.8]),
)
@settings(max_examples=6, deadline=None)
def test_allpairs_prefix_no_miss_property(spark, docs, t):
    """Prefix filtering is exact: equal to the CAPLESS inverted index on
    random corpora at random thresholds — the no-miss theorem, fuzzed."""
    from confluent_data_ingestion_spark.operators.dedup import (
        allpairs_jaccard,
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    got = _pairs_set(allpairs_jaccard(df, n=2, threshold=t).collect())
    want = _pairs_set(
        ngram_jaccard_pairs(
            df, n=2, threshold=t, max_group_size=None
        ).collect()
    )
    assert got == want


@given(
    avail=st.lists(st.integers(min_value=0, max_value=500),
                   min_size=1, max_size=8),
    budget=st.integers(min_value=0, max_value=1500),
)
@settings(max_examples=10, deadline=None)
def test_waterfill_invariants_property(spark, avail, budget):
    """Waterfilling axioms on random instances: allocations are feasible
    (0 <= alloc <= avail), exhaust min(budget, total) exactly, uncapped
    domains take everything, capped domains share one level that is <=
    every capped availability and >= every uncapped one."""
    df = spark.createDataFrame(
        [(f"d{i}", int(a)) for i, a in enumerate(avail)],
        "d string, t long",
    )
    rows = token_budget_waterfill(df, "d", "t", budget=budget).collect()
    total = sum(avail)
    allocs = {r["domain"]: r for r in rows}
    assert len(allocs) == len(avail)
    s = sum(r["tokens_alloc"] for r in rows)
    assert abs(s - min(budget, total)) < 1e-3 * max(1, len(avail))
    levels = {r["level"] for r in rows}
    assert len(levels) == 1  # same (possibly NULL) level on every row
    level = next(iter(levels))
    for r in rows:
        assert -1e-9 <= r["tokens_alloc"] <= r["tokens_available"] + 1e-9
        if r["capped"]:
            assert level is not None
            assert abs(r["tokens_alloc"] - level) < 1e-9
            assert r["tokens_available"] >= level - 1e-6
        else:
            assert r["tokens_alloc"] == float(r["tokens_available"])
            if level is not None:
                assert r["tokens_available"] <= level + 1e-6


@given(
    series=st.lists(
        st.floats(min_value=-100, max_value=100,
                  allow_nan=False, allow_infinity=False),
        min_size=2, max_size=12,
    )
)
@settings(max_examples=10, deadline=None)
def test_ewma_matches_pandas_recursion_property(spark, series):
    """The fold equals pandas ewm(alpha, adjust=False) — the textbook
    recursion — on random daily series."""
    import pandas as pd

    vals = [round(v, 4) for v in series]
    rows = [
        (1, f"2024-01-{d + 1:02d} 12:00:00", v) for d, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "k long, ts string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = ewma_residual(df, "k", "ts", "v", alpha=0.25).collect()[0]
    ew = pd.Series(vals).ewm(alpha=0.25, adjust=False).mean()

    def q6(x):
        import math

        return math.floor(x * 1e6 + 0.5) / 1e6

    assert r["ewma_prev"] == q6(float(ew.iloc[-2]))
    assert r["ewma_last"] == q6(0.25 * vals[-1] + 0.75 * float(ew.iloc[-2]))
    assert r["residual"] == q6(vals[-1] - float(ew.iloc[-2]))


# ---------------------------------------------------------------------------
# streaming contract monitor
# ---------------------------------------------------------------------------


def test_contract_monitor_replay_idempotent_and_quiesces_to_batch(
    spark, tmp_path
):
    from confluent_data_ingestion_spark.streaming.contracts import (
        ContractMonitor,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (None, 9.0), (4, 50.0)],
        "k long, v double",
    )
    checks = [
        {"check": "not_null", "column": "k"},
        {"check": "min", "column": "v", "value": 0.0},
        {"check": "max", "column": "v", "value": 40.0},
    ]
    mon = ContractMonitor(str(tmp_path / "log"), checks)
    for i in range(3):
        mon.apply(df.filter((F.coalesce("k", F.lit(0)) % 3) == i), i)
    mon.apply(df.filter((F.coalesce("k", F.lit(0)) % 3) == 1), 1)  # replay
    got = {
        (r["check"], r["column"]): (r["observed"], r["status"])
        for r in mon.snapshot(spark).collect()
    }
    want = {
        (r["check"], r["column"]): (r["observed"], r["status"])
        for r in validate_contract(df, checks).collect()
    }
    assert got == want
    assert got[("min", "v")] == (-1.0, "fail")
    assert got[("max", "v")] == (50.0, "fail")
    with pytest.raises(ValueError, match="empty"):
        ContractMonitor(str(tmp_path / "x"), [])
