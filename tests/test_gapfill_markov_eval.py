"""Unit tests for the round-13 additions: daily gap-fill resampling
with LOCF, Krippendorff's alpha, retrieval evaluation metrics, and the
Markov transition/stationary operators."""

from __future__ import annotations

from datetime import datetime
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from confluent_data_ingestion_spark.operators.labels import (
    krippendorff_alpha,
)
from confluent_data_ingestion_spark.operators.retrieval import (
    retrieval_eval,
)
from confluent_data_ingestion_spark.operators.temporal import (
    gapfill_locf,
    markov_stationary,
    markov_transitions,
)


def _ts(day: int, hour: int = 0) -> datetime:
    return datetime(2024, 1, day, hour, 0, 0)


# ---------------------------------------------------------------------------
# gapfill_locf
# ---------------------------------------------------------------------------


def test_gapfill_locf_fills_gaps_and_carries_value(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(1, 3), 1.5),
            (1, _ts(1, 9), 2.5),   # day 1: 2 events, sum 4.0
            (1, _ts(4, 1), 3.0),   # days 2-3 are gaps
            (2, _ts(7, 5), 9.0),   # single-day span: no gaps
        ],
        "user_id long, ts timestamp, value double",
    )
    out = gapfill_locf(df, "user_id", "ts", "value")
    rows = {
        (r["user_id"], str(r["day"])): (
            r["n_events"], r["filled"], r["value_sum_locf"]
        )
        for r in out.collect()
    }
    assert rows == {
        (1, "2024-01-01"): (2, False, 4.0),
        (1, "2024-01-02"): (0, True, 4.0),
        (1, "2024-01-03"): (0, True, 4.0),
        (1, "2024-01-04"): (1, False, 3.0),
        (2, "2024-01-07"): (1, False, 9.0),
    }


def test_gapfill_locf_span_is_dense_per_key(spark):
    # property over a messier frame: every key's output is one row per
    # day of [min_day, max_day] with no holes and no extras
    data = [
        (u, _ts(d, h), float(u * d + h))
        for u, days in ((1, [2, 2, 9, 30]), (2, [5]), (3, [1, 31]))
        for d in days
        for h in (0, 12)
    ]
    df = spark.createDataFrame(data, "user_id long, ts timestamp, value double")
    out = gapfill_locf(df, "user_id", "ts", "value").collect()
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    spans = {1: 29, 2: 1, 3: 31}  # days, span endpoints inclusive
    for u, rows in by_user.items():
        days = sorted(str(r["day"]) for r in rows)
        assert len(days) == spans[u]
        assert len(set(days)) == len(days)
        # filled rows have zero events; observed rows never carry NULL
        for r in rows:
            assert (r["n_events"] == 0) == bool(r["filled"])
            assert r["value_sum_locf"] is not None


# ---------------------------------------------------------------------------
# krippendorff_alpha
# ---------------------------------------------------------------------------


def test_krippendorff_alpha_hand_computed(spark):
    # u1: (x, x)       -> m=2, s2=4, term 0
    # u2: (x, y)       -> m=2, s2=2, term 2
    # u3: (y, y, y)    -> m=3, s2=9, term 0
    # u4: (x, -, -)    -> m=1, excluded
    # D_o_total = 2; marginals x=3, y=4 -> n=7, s2_c=25, de_num=24
    # alpha = 1 - 6*2/24 = 0.5
    df = spark.createDataFrame(
        [
            (1, "x", "x", None),
            (2, "x", "y", None),
            (3, "y", "y", "y"),
            (4, "x", None, None),
        ],
        "item long, a string, b string, c string",
    )
    row = krippendorff_alpha(df, "item", ["a", "b", "c"]).collect()[0]
    assert row["n_units"] == 3
    assert row["n_votes"] == 7
    assert row["n_labels"] == 2
    assert row["observed_disagreement"] == round(2 / 7, 6)
    assert row["expected_disagreement"] == round(24 / 42, 6)
    assert row["alpha"] == 0.5


def test_krippendorff_alpha_degenerate_single_label_is_null(spark):
    df = spark.createDataFrame(
        [(1, "x", "x"), (2, "x", "x")],
        "item long, a string, b string",
    )
    row = krippendorff_alpha(df, "item", ["a", "b"]).collect()[0]
    assert row["alpha"] is None
    assert row["expected_disagreement"] == 0.0
    assert row["observed_disagreement"] == 0.0


def test_krippendorff_alpha_perfect_agreement_two_labels(spark):
    # perfect agreement with label diversity: D_o = 0 -> alpha = 1
    df = spark.createDataFrame(
        [(1, "x", "x"), (2, "y", "y"), (3, "x", "x")],
        "item long, a string, b string",
    )
    row = krippendorff_alpha(df, "item", ["a", "b"]).collect()[0]
    assert row["alpha"] == 1.0


def test_krippendorff_alpha_pools_duplicate_unit_ids(spark):
    # votes for the same unit split across rows MUST be pooled (standard
    # Krippendorff semantics).  u1: rows (x,-),(-,x) -> pooled m=2, s2=4,
    # term 0; u2: rows (x,-),(-,y) -> pooled m=2, s2=2, term 2.
    # n=4 votes, marginals x=3,y=1 -> s2_c=10, de_num=6;
    # alpha = 1 - 3*2/6 = 0.  Treating each ROW as the unit would find
    # no pairable unit at all (every row has m=1) and report NULLs.
    df = spark.createDataFrame(
        [(1, "x", None), (1, None, "x"), (2, "x", None), (2, None, "y")],
        "item long, a string, b string",
    )
    row = krippendorff_alpha(df, "item", ["a", "b"]).collect()[0]
    assert row["n_units"] == 2
    assert row["n_votes"] == 4
    assert row["alpha"] == 0.0


def test_krippendorff_alpha_paths_agree_on_unique_ids(spark):
    # the wide codegen path and the melted pooled path are the same
    # statistic — force each on the same unique-id frame
    df = spark.createDataFrame(
        [
            (1, "x", "x", None),
            (2, "x", "y", None),
            (3, "y", "y", "y"),
            (4, "x", None, None),
        ],
        "item long, a string, b string, c string",
    )
    wide = krippendorff_alpha(
        df, "item", ["a", "b", "c"], assume_unique_units=True
    ).collect()[0]
    melted = krippendorff_alpha(
        df, "item", ["a", "b", "c"], wide_max_annotators=2
    ).collect()[0]
    assert wide.asDict() == melted.asDict()


def test_krippendorff_alpha_wide_annotator_pool_takes_melted_path(spark):
    # k=50 raters: the k^2 wide expression would be 2500 codegen terms —
    # above wide_max_annotators the melted path runs instead and must
    # produce the hand-checkable statistic (two unanimous units, one
    # split unit, over a 50-rater pool with sparse votes)
    k = 50
    names = [f"r{i}" for i in range(k)]

    def row(item, votes):
        d = {"item": item, **{n: None for n in names}}
        d.update(votes)
        return d

    rows = [
        row(1, {"r0": "x", "r17": "x", "r49": "x"}),   # m=3, s2=9, term 0
        row(2, {"r3": "x", "r31": "y"}),               # m=2, s2=2, term 2
        row(3, {"r5": "y"}),                           # m=1, excluded
    ]
    schema = "item long, " + ", ".join(f"{n} string" for n in names)
    df = spark.createDataFrame(rows, schema)
    out = krippendorff_alpha(df, "item", names).collect()[0]
    # pairable votes: x=4, y=1 -> n=5, s2_c=17, de_num=8
    # alpha = 1 - 4*2/8 = 0
    assert out["n_units"] == 2
    assert out["n_votes"] == 5
    assert out["alpha"] == 0.0


# ---------------------------------------------------------------------------
# retrieval_eval
# ---------------------------------------------------------------------------


def test_retrieval_eval_hand_computed(spark):
    run = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3), (9, 7, 1)],
        "query_id long, doc_id long, rank int",
    )
    judged = spark.createDataFrame(
        [(0, 2, 2), (0, 4, 3), (0, 3, 1)],
        "query_id long, doc_id long, grade int",
    )
    out = {
        r["query_id"]: r
        for r in retrieval_eval(run, judged, k=3, rel_threshold=2).collect()
    }
    q0 = out[0]
    assert q0["n_rel"] == 2            # docs 2 and 4
    assert q0["hits_k"] == 1           # only doc 2 retrieved
    assert q0["precision_k"] == round(1 / 3, 6)
    assert q0["recall_k"] == 0.5
    assert q0["rr_k"] == 0.5           # first relevant at rank 2
    # DCG: doc1 unjudged 0; doc2 g2 r2: 3/log2(3); doc3 g1 r3: 1/2
    # IDCG: g3 r1: 7; g2 r2: 3/log2(3); g1 r3: 1/2
    import math

    t = round(3 / math.log2(3), 6)
    dcg = round(0.0, 6) + t + 0.5
    idcg = 7.0 + t + 0.5
    assert q0["ndcg_k"] == round(dcg / idcg, 6)
    # query 9 has no judgments at all
    q9 = out[9]
    assert q9["n_rel"] == 0
    assert q9["hits_k"] == 0
    assert q9["recall_k"] is None
    assert q9["rr_k"] == 0.0
    assert q9["ndcg_k"] is None


def test_retrieval_eval_perfect_run_is_1(spark):
    # run retrieves the ideal ordering -> ndcg = 1, rr = 1
    run = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id long, doc_id long, rank int"
    )
    judged = spark.createDataFrame(
        [(0, 10, 3), (0, 11, 1)], "query_id long, doc_id long, grade int"
    )
    r = retrieval_eval(run, judged, k=2, rel_threshold=1).collect()[0]
    assert r["ndcg_k"] == 1.0
    assert r["rr_k"] == 1.0
    assert r["recall_k"] == 1.0
    assert r["precision_k"] == 1.0


# ---------------------------------------------------------------------------
# markov_transitions / markov_stationary
# ---------------------------------------------------------------------------


def _mk_events(spark):
    # u1: A B A B   u2: A A
    rows = [
        (1, 1, _ts(1), "A"), (2, 1, _ts(2), "B"),
        (3, 1, _ts(3), "A"), (4, 1, _ts(4), "B"),
        (5, 2, _ts(1), "A"), (6, 2, _ts(2), "A"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_markov_transitions_counts_and_probs(spark):
    tr = markov_transitions(_mk_events(spark)).collect()
    got = {
        (r["prev_state"], r["next_state"]):
            (r["n_transitions"], r["n_out"], float(r["prob"]))
        for r in tr
    }
    assert got == {
        ("A", "B"): (2, 3, round(2 / 3, 6)),
        ("A", "A"): (1, 3, round(1 / 3, 6)),
        ("B", "A"): (1, 1, 1.0),
    }


def _decimal_power_iteration(trans: dict, states: list, steps: int):
    """Independent Decimal reimplementation with HALF_UP quantization —
    mirrors the operator's arithmetic contract exactly."""
    q6 = Decimal("0.000001")
    p = {
        s: (Decimal(1) / Decimal(len(states))).quantize(q6, ROUND_HALF_UP)
        for s in states
    }
    for _ in range(steps):
        nxt: dict = {}
        for (a, b), pr in trans.items():
            nxt[b] = nxt.get(b, Decimal(0)) + p[a] * pr
        p = {s: v.quantize(q6, ROUND_HALF_UP) for s, v in nxt.items()}
    return p


def test_markov_stationary_matches_decimal_reference(spark):
    from confluent_data_ingestion_spark.caching import release_caches

    tr_df = markov_transitions(_mk_events(spark))
    out = markov_stationary(tr_df, steps=3).collect()
    release_caches()
    trans = {
        ("A", "B"): Decimal(2) / Decimal(3),
        ("A", "A"): Decimal(1) / Decimal(3),
        ("B", "A"): Decimal(1),
    }
    q6 = Decimal("0.000001")
    trans = {k: v.quantize(q6, ROUND_HALF_UP) for k, v in trans.items()}
    want = _decimal_power_iteration(trans, ["A", "B"], 3)
    got = {r["state"]: r for r in out}
    assert set(got) == {"A", "B"}
    for s in ("A", "B"):
        assert got[s]["p_uniform"] == Decimal("0.5")
        assert got[s]["p_stationary"] == want[s]


def test_markov_stationary_absorbing_state_mass(spark):
    from confluent_data_ingestion_spark.caching import release_caches

    # A always moves to B, B self-loops: mass drains to B
    tr = spark.createDataFrame(
        [("A", "B", 10, 10, Decimal("1.000000")),
         ("B", "B", 10, 10, Decimal("1.000000"))],
        "prev_state string, next_state string, n_transitions long,"
        " n_out long, prob decimal(18,6)",
    )
    got = {
        r["state"]: r["p_stationary"]
        for r in markov_stationary(tr, steps=4).collect()
    }
    release_caches()
    assert float(got["B"]) == 1.0
    # A receives no mass after step 1: absent from the iterate -> NULL
    assert got["A"] is None


# ---------------------------------------------------------------------------
# property tests (hypothesis) — structure invariants over random inputs
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),    # user
            st.integers(min_value=1, max_value=28),   # day of month
            st.floats(min_value=-50, max_value=50, allow_nan=False),
        ),
        min_size=1, max_size=25,
    )
)
@settings(max_examples=8, deadline=None)
def test_gapfill_locf_invariants(spark, obs):
    rows = [
        (u, datetime(2024, 1, d, 6, 0, 0), round(v, 2))
        for u, d, v in obs
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    out = gapfill_locf(df, "user_id", "ts", "value").collect()
    by_user: dict[int, dict] = {}
    for r in out:
        by_user.setdefault(r["user_id"], {})[str(r["day"])] = r
    want_days = {}
    for u, d, _ in obs:
        want_days.setdefault(u, set()).add(d)
    for u, days in want_days.items():
        got = by_user[u]
        lo, hi = min(days), max(days)
        # dense span, exact keys
        assert sorted(got) == [
            f"2024-01-{d:02d}" for d in range(lo, hi + 1)
        ]
        # LOCF: a filled day's value equals the nearest preceding
        # observed day's value; observed days are never 'filled'
        last = None
        for d in range(lo, hi + 1):
            r = got[f"2024-01-{d:02d}"]
            if d in days:
                assert not r["filled"] and r["n_events"] >= 1
                last = r["value_sum_locf"]
            else:
                assert r["filled"] and r["n_events"] == 0
                assert r["value_sum_locf"] == last


@given(
    votes=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),
            st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),
            st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),
            st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),
        ),
        min_size=2, max_size=10, unique_by=lambda t: t[0],
    )
)
@settings(max_examples=8, deadline=None)
def test_krippendorff_alpha_bounds_and_column_invariance(spark, votes):
    df = spark.createDataFrame(
        votes, "item long, a string, b string, c string"
    )
    pairable = [
        t for t in votes if sum(x is not None for x in t[1:]) >= 2
    ]
    out = krippendorff_alpha(df, "item", ["a", "b", "c"]).collect()[0]
    assert out["n_units"] == len(pairable)
    if out["alpha"] is not None:
        # nominal alpha is at most 1; the lower bound for >=2 categories
        # is finite but below -1 only in tiny degenerate designs
        assert out["alpha"] <= 1.0
    # annotator-column order must not matter (the melt is a set)
    swapped = krippendorff_alpha(df, "item", ["c", "b", "a"]).collect()[0]
    assert swapped == out


def test_markov_stationary_pagerank_teleport(spark):
    from confluent_data_ingestion_spark.caching import release_caches

    # A -> B only, B -> B: undamped drains A to zero mass (absent);
    # with damping, A keeps exactly the teleport share each round
    tr = spark.createDataFrame(
        [("A", "B", 10, 10, Decimal("1.000000")),
         ("B", "B", 10, 10, Decimal("1.000000"))],
        "prev_state string, next_state string, n_transitions long,"
        " n_out long, prob decimal(18,6)",
    )
    got = {
        r["state"]: r["p_stationary"]
        for r in markov_stationary(tr, steps=3, damping=0.875).collect()
    }
    release_caches()
    # teleport share: (1 - 0.875) / 2 = 0.0625 — A receives ONLY that
    assert float(got["A"]) == 0.0625
    # B gets the rest; mass conserved to rounding
    assert abs(float(got["A"]) + float(got["B"]) - 1.0) < 5e-6
    # reference recursion: p_B' = .0625 + .875 * (p_A + p_B)
    p_a, p_b = Decimal("0.5"), Decimal("0.5")
    q6 = Decimal("0.000001")
    for _ in range(3):
        nb = (Decimal("0.0625")
              + Decimal("0.875") * (p_a + p_b)).quantize(q6, ROUND_HALF_UP)
        p_a, p_b = Decimal("0.0625"), nb
    assert got["B"] == p_b


def test_markov_stationary_rejects_bad_damping(spark):
    import pytest as _pytest

    tr = spark.createDataFrame(
        [("A", "A", 1, 1, Decimal("1.000000"))],
        "prev_state string, next_state string, n_transitions long,"
        " n_out long, prob decimal(18,6)",
    )
    with _pytest.raises(ValueError):
        markov_stationary(tr, damping=0.0)


def test_gapfill_interpolate_hand_computed(spark):
    from confluent_data_ingestion_spark.operators.temporal import (
        gapfill_interpolate,
    )

    # user 1: day1 sum 3.0, day4 sum 9.0 -> gaps at 5.0, 7.0
    df = spark.createDataFrame(
        [
            (1, _ts(1, 2), 1.0), (1, _ts(1, 8), 2.0),
            (1, _ts(4, 1), 9.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    rows = {
        str(r["day"]): (r["n_events"], r["filled"], r["value_sum_interp"])
        for r in gapfill_interpolate(df).collect()
    }
    assert rows == {
        "2024-01-01": (2, False, 3.0),
        "2024-01-02": (0, True, 5.0),
        "2024-01-03": (0, True, 7.0),
        "2024-01-04": (1, False, 9.0),
    }


def test_gapfill_interpolate_grid_matches_locf_grid(spark):
    from confluent_data_ingestion_spark.operators.temporal import (
        gapfill_interpolate, gapfill_locf,
    )

    data = [
        (u, _ts(d, h), float(u + d + h))
        for u, days in ((1, [2, 9, 30]), (2, [5]))
        for d in days for h in (0, 12)
    ]
    df = spark.createDataFrame(data, "user_id long, ts timestamp, value double")
    a = {(r["user_id"], str(r["day"])): (r["n_events"], r["filled"])
         for r in gapfill_locf(df).collect()}
    b = {(r["user_id"], str(r["day"])): (r["n_events"], r["filled"])
         for r in gapfill_interpolate(df).collect()}
    # identical grid, counts and fill flags — only the fill VALUE differs
    assert a == b
