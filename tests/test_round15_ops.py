"""Round-15 regression tests: the four r14 ADVICE fixes (per-index
contract verdicts, quote-safe report rows, candidate dedup in the
margin scorer, strict waterfill level qualification), the LSH
auto-width tuning law, the pruned bitext path's recall vs the
brute-force baseline, and the cross-batch unique monitor."""

from __future__ import annotations

import math
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from confluent_data_ingestion_spark.operators.contracts import (
    contract_counters,
    validate_contract,
)
from confluent_data_ingestion_spark.operators.sampling import (
    token_budget_waterfill,
)
from confluent_data_ingestion_spark.operators.similarity import (
    lsh_auto_width,
    lsh_candidate_pairs,
    lsh_planes,
    mutual_margin_pairs,
)
from confluent_data_ingestion_spark.streaming.contracts import (
    UniqueKeyMonitor,
)


# ---------------------------------------------------------------------------
# validate_contract: per-index verdicts + quote-safe report rows
# ---------------------------------------------------------------------------


def test_contract_duplicate_check_kinds_judge_own_threshold(spark):
    """Two checks of the same (kind, column) with DIFFERENT thresholds:
    each report row's status must be computed against its own bound
    (the r14 name-keyed CASE judged both against the first)."""
    df = spark.createDataFrame(
        [("1-URGENT",), ("2-HIGH",), ("oops",), (None,)], "p string"
    )
    # 2/3 non-null values match ^[1-5]- : passes 0.5, fails 1.0
    rows = validate_contract(
        df,
        [
            {"check": "matches", "column": "p", "pattern": "^[1-5]-",
             "min_rate": 0.5},
            {"check": "matches", "column": "p", "pattern": "^[1-5]-",
             "min_rate": 1.0},
        ],
    ).collect()
    assert len(rows) == 2
    by_thr = {r["threshold"]: r for r in rows}
    assert by_thr[0.5]["status"] == "pass"
    assert by_thr[1.0]["status"] == "fail"
    for r in rows:
        assert abs(r["observed"] - 0.666667) < 1e-9


def test_contract_quoted_column_name(spark):
    """A column name containing a single quote flows through the report
    builder (Column literals, not string-assembled SQL)."""
    df = spark.createDataFrame([(1,), (None,)], ["x"]).withColumnRenamed(
        "x", "o'clock"
    )
    rows = validate_contract(
        df, [{"check": "not_null", "column": "o'clock", "min_rate": 0.4}]
    ).collect()
    assert rows[0]["column"] == "o'clock"
    assert rows[0]["status"] == "pass"
    assert abs(rows[0]["observed"] - 0.5) < 1e-9


# ---------------------------------------------------------------------------
# token_budget_waterfill: strict level qualification
# ---------------------------------------------------------------------------


def test_waterfill_exact_cover_reports_null_level(spark):
    """budget == total availability: nothing is truly capped, so level
    must be NULL and every domain keeps everything (the r14 phantom:
    the last position's cand == avail qualified under <=)."""
    df = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 30)], "d string, t long"
    )
    rows = token_budget_waterfill(df, "d", "t", budget=60).collect()
    assert all(r["level"] is None for r in rows)
    assert all(not r["capped"] for r in rows)
    assert {r["domain"]: r["tokens_alloc"] for r in rows} == {
        "a": 10.0, "b": 20.0, "c": 30.0,
    }


def test_waterfill_mid_scan_exact_level_still_found(spark):
    """When the true level exactly equals a mid-scan availability the
    strict '<' must still find it one position later: avail [10, 30],
    budget 40 -> ... exact cover again; use budget 35: level 25 found
    strictly below 30.  And avail [10, 20, 40], budget 50 -> level 20
    == avail_2 exactly; position 3 recomputes the same level."""
    df = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 40)], "d string, t long"
    )
    out = {
        r["domain"]: r
        for r in token_budget_waterfill(df, "d", "t", budget=50).collect()
    }
    assert out["a"]["tokens_alloc"] == 10.0 and not out["a"]["capped"]
    assert out["b"]["tokens_alloc"] == 20.0 and not out["b"]["capped"]
    assert out["c"]["tokens_alloc"] == 20.0 and out["c"]["capped"]
    assert out["c"]["level"] == 20.0


# ---------------------------------------------------------------------------
# mutual_margin_pairs: candidate dedup
# ---------------------------------------------------------------------------


def _vecs(spark, ids, dim=4, side=0):
    rows = []
    for i in ids:
        v = [
            round(math.sin(i * 17.3 + j * 2.1 + side * 5.7), 6) + 1.5
            for j in range(dim)
        ]
        rows.append((i, v))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_mutual_margin_duplicate_candidates_ignored(spark):
    """A candidates frame with duplicated (a_id, b_id) rows must score
    identically to the distinct frame — duplicates may not occupy two
    ranks or double-count in the top-k sums."""
    a = _vecs(spark, range(0, 8), side=0)
    b = _vecs(spark, range(100, 108), side=1)
    cand = a.crossJoin(b.select(F.col("vec_id").alias("b_id"))).select(
        F.col("vec_id").alias("a_id"), "b_id"
    )
    dup = cand.unionAll(cand).unionAll(cand.limit(7))
    clean = [
        tuple(r)
        for r in mutual_margin_pairs(
            a, b, k=3, margin_threshold=0.9, candidates=cand
        ).collect()
    ]
    dirty = [
        tuple(r)
        for r in mutual_margin_pairs(
            a, b, k=3, margin_threshold=0.9, candidates=dup
        ).collect()
    ]
    assert sorted(clean) == sorted(dirty)
    assert clean  # non-vacuous: some pair survives


# ---------------------------------------------------------------------------
# LSH auto-width tuning law
# ---------------------------------------------------------------------------


def test_lsh_auto_width_rule():
    """Pin the measured log-corpus law (SCALE.md 17th probe): width 4
    through 16k rows (the fixed-plane regime), 5 at the x10 probe, 8 at
    the saturation-fixing 250k point, capped at 15."""
    assert lsh_auto_width(0) == 4
    assert lsh_auto_width(500) == 4
    assert lsh_auto_width(2000) == 4
    assert lsh_auto_width(16000) == 4
    assert lsh_auto_width(20000) == 5
    assert lsh_auto_width(250000) == 8
    assert lsh_auto_width(10**9) == 15  # capped inside the 63-bit fold
    # monotone in n
    widths = [lsh_auto_width(n) for n in (10, 10**3, 10**4, 10**5, 10**6)]
    assert widths == sorted(widths)


def test_lsh_planes_prefix_stability():
    """Growing the signature EXTENDS the plane list — a wider auto
    width never changes the planes a fixed deployment pinned."""
    p16 = lsh_planes("lsh1", 16, 64)
    p32 = lsh_planes("lsh1", 32, 64)
    assert p32[:16] == p16


def test_lsh_candidate_pairs_auto_matches_fixed_at_small_n(spark, sf_dir):
    """At this corpus size the auto path must reproduce the fixed
    16-bit/4-band candidates bit-for-bit (width 4, same seed)."""
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    fixed = lsh_candidate_pairs(a, b, lsh_planes("lsh1", 16, 64), bands=4)
    auto = lsh_candidate_pairs(a, b, planes=None, bands=4, dim=64)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, fixed.collect())
    )


def test_lsh_candidate_pairs_auto_requires_dim(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    with pytest.raises(ValueError, match="dim"):
        lsh_candidate_pairs(emb, emb, planes=None)


def test_bitext_pruned_recall_vs_brute_force(spark, sf_dir):
    """The registry's pruned bitext row vs the brute-force exactness
    baseline (which survives here, as VERDICT r14 asked).  Measured
    recall on the synthetic embeddings is ~0.47 at sf0.001/sf0.01 —
    the honest 16-bit/4-band number for near-UNIFORM 64-dim vectors,
    where mutual-top-1 cosines sit near the hyperplane-collision
    noise floor (real embedding corpora cluster and collide far more;
    the recall knob is bands x width).  This pins the floor so a
    silent candidate-generator regression (seed drift, band slicing
    bug) fails loudly, and checks the pruned path assigns the exact
    brute cosine to every pair both find."""
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    brute = {
        (r["a_id"], r["b_id"]): r["cosine"]
        for r in mutual_margin_pairs(a, b, k=4, margin_threshold=1.0)
        .collect()
    }
    cand = lsh_candidate_pairs(a, b, planes=None, bands=4, dim=64)
    pruned = {
        (r["a_id"], r["b_id"]): r["cosine"]
        for r in mutual_margin_pairs(
            a, b, k=4, margin_threshold=1.0, candidates=cand
        ).collect()
    }
    assert brute, "brute-force baseline found no pairs — vacuous test"
    recall = len(set(pruned) & set(brute)) / len(brute)
    assert recall >= 0.40, f"pruned path recall {recall:.2f} vs brute"
    for pair in set(pruned) & set(brute):
        assert pruned[pair] == brute[pair]


# ---------------------------------------------------------------------------
# UniqueKeyMonitor: cross-batch unique via the dedup digest index
# ---------------------------------------------------------------------------


def _report(mon, spark):
    return {
        r["column"]: r for r in mon.snapshot(spark).collect()
    }


def test_unique_monitor_batch_equals_oneshot(spark):
    """Fold three batches (with cross-batch duplicate keys) and compare
    the snapshot to validate_contract's one-shot unique check over the
    union — distinct-of-union == union-of-per-batch-distinct."""
    b1 = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "x")], "k long, g string"
    )
    b2 = spark.createDataFrame(
        [(3, "x"), (4, "z"), (None, "x")], "k long, g string"
    )
    b3 = spark.createDataFrame([(5, "y")], "k long, g string")
    union = b1.unionAll(b2).unionAll(b3)
    path = tempfile.mkdtemp(prefix="cdis-ukm-")
    mon = UniqueKeyMonitor(path, ["k", "g"])
    for i, b in enumerate((b1, b2, b3)):
        mon.apply(b, i)
    got = _report(mon, spark)
    want = {
        r["column"]: r
        for r in validate_contract(
            union,
            [{"check": "unique", "column": "k"},
             {"check": "unique", "column": "g"}],
        ).collect()
    }
    for col in ("k", "g"):
        assert got[col]["observed"] == want[col]["observed"]
        assert got[col]["status"] == want[col]["status"]
    # 6 non-null k values, 5 distinct; 7 g values, 3 distinct
    assert abs(got["k"]["observed"] - round(5 / 6, 6)) < 2e-6
    assert abs(got["g"]["observed"] - round(3 / 7, 6)) < 2e-6
    assert got["k"]["status"] == "fail" and got["g"]["status"] == "fail"


def test_unique_monitor_replay_idempotent(spark):
    """Re-applying a batch under the same batch_id rewrites its own
    partials — the snapshot must not change (microbatch replay)."""
    b1 = spark.createDataFrame([(1,), (2,)], "k long")
    b2 = spark.createDataFrame([(2,), (3,)], "k long")
    path = tempfile.mkdtemp(prefix="cdis-ukm-r-")
    mon = UniqueKeyMonitor(path, ["k"])
    mon.apply(b1, 0)
    mon.apply(b2, 1)
    before = _report(mon, spark)["k"]
    mon.apply(b2, 1)  # replay
    after = _report(mon, spark)["k"]
    assert before["observed"] == after["observed"]
    assert abs(before["observed"] - 0.75) < 1e-9  # 3 distinct / 4 non-null


def test_unique_monitor_all_unique_passes(spark):
    path = tempfile.mkdtemp(prefix="cdis-ukm-p-")
    mon = UniqueKeyMonitor(path, ["k"])
    mon.apply(spark.createDataFrame([(1,), (2,)], "k long"), 0)
    mon.apply(spark.createDataFrame([(3,)], "k long"), 1)
    rep = _report(mon, spark)["k"]
    assert rep["observed"] == 1.0 and rep["status"] == "pass"


def test_contract_counters_still_rejects_unique(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="UniqueKeyMonitor"):
        contract_counters(df, [{"check": "unique", "column": "k"}])


# ---------------------------------------------------------------------------
# bench tail-line budget (the r14 external failure class)
# ---------------------------------------------------------------------------


def test_bench_tail_line_fits_driver_window_at_280_rows():
    """The driver parses the LAST JSON line from a 2000-char tail
    window; r14's index-keyed map overflowed it at 190 queries and the
    round lost its external bench record.  Pin the current format's
    budget: a registry-ordered int-ms array must stay under the
    in-script 1950 guard at 280 rows with realistic (5-digit) values,
    AND at the current registry size with pathological 6-digit values.
    """
    import json

    from confluent_data_ingestion_spark.queries import QUERIES

    def line_for(ms_values):
        return json.dumps({
            "metric": "total_query_wallclock",
            "value": 99999.999,
            "unit": "sec",
            "queries": ms_values,
            "sf": 0.1,
            "n_queries": len(ms_values),
            "headline_sec": 999.999,
        }, separators=(",", ":"))

    assert len(line_for([99999] * 280)) < 1950   # 280 rows, <=99.9 s each
    assert len(line_for([999999] * len(QUERIES))) < 1950  # today, any value
