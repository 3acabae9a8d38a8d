"""Sketch-accelerated operators: exactness vs the naive plan, one-sidedness
(no false negatives), scale-shape guards, and degenerate inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from confluent_data_ingestion_spark.operators.sketch import (
    bloom_bitset,
    bloom_prune,
    bloom_semijoin,
    cms_bucket_counts,
    cms_heavy_hitters,
    distinct_exact_two_level,
)


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------
def test_bloom_semijoin_matches_exact_semijoin(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    build = od.filter(F.col("o_orderpriority") == "1-URGENT")
    got = bloom_semijoin(li, build, "l_orderkey", "o_orderkey")
    exact = li.join(
        build.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi"
    )
    assert sorted(r["l_orderkey"] for r in got.select("l_orderkey").collect()) == sorted(
        r["l_orderkey"] for r in exact.select("l_orderkey").collect()
    )


def test_bloom_prune_never_drops_a_member(spark):
    """One-sidedness: every build key must pass the probe predicate, even
    with a deliberately tiny (collision-heavy) bitset."""
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    words = bloom_bitset(keys, "k", num_bits=256, num_hashes=4)  # ~2x overloaded
    survivors = {r["k"] for r in bloom_prune(keys, "k", words).collect()}
    assert survivors == set(range(500))


def test_bloom_prune_filters_most_non_members(spark):
    """With a correctly-sized bitset the false-positive rate must be low —
    the operator is pointless if the prune passes everything."""
    build = spark.range(0, 1000).select(F.col("id").alias("k"))
    words = bloom_bitset(build, "k", num_bits=1 << 15, num_hashes=4)
    probe = spark.range(1000, 21000).select(F.col("id").alias("k"))  # disjoint
    fp = bloom_prune(probe, "k", words).count()
    assert fp / 20000 < 0.05


def test_bloom_prune_is_map_side_only(spark, sf_dir):
    """The pruned big side must not gain an Exchange: the whole point is
    that non-matching rows die before any shuffle."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    words = bloom_bitset(
        spark.range(0, 10).select(F.col("id").alias("k")), "k", num_bits=1024
    )
    plan = (
        bloom_prune(li, "l_orderkey", words)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_bloom_bitset_rejects_bad_width(spark):
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_bitset(spark.range(1).select(F.col("id").alias("k")), "k", num_bits=100)


def test_bloom_semijoin_empty_build_side(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    empty = od.filter(F.lit(False))
    assert bloom_semijoin(li, empty, "l_orderkey", "o_orderkey").count() == 0


# ---------------------------------------------------------------------------
# Count-min heavy hitters
# ---------------------------------------------------------------------------
def test_cms_heavy_hitters_exact_counts(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    frac = 0.0007
    got = sorted(
        (r["l_partkey"], r["cnt"])
        for r in cms_heavy_hitters(li, "l_partkey", threshold_frac=frac).collect()
    )
    total = li.count()
    exact = sorted(
        (r["l_partkey"], r["count"])
        for r in li.groupBy("l_partkey").count().collect()
        if r["count"] >= frac * total
    )
    assert got == exact


def test_cms_heavy_hitters_skewed_key(spark):
    """A planted hot key must always be found with its exact count, and a
    narrow sketch (heavy collisions) must still never produce a wrong
    answer — collisions only add false candidates, which the exact
    HAVING removes."""
    hot = spark.range(0, 5000).select(F.lit("HOT").alias("k"))
    cold = spark.range(0, 5000).select(F.concat(F.lit("c"), F.col("id")).alias("k"))
    df = hot.unionAll(cold)
    got = {(r["k"], r["cnt"]) for r in
           cms_heavy_hitters(df, "k", threshold_frac=0.1, width=64).collect()}
    assert got == {("HOT", 5000)}


def test_cms_bucket_counts_total_is_exact(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    _, total = cms_bucket_counts(ev, "user_id", width=128, depth=2)
    assert total == ev.count()


def test_cms_heavy_hitters_empty_input(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(F.lit(False))
    assert cms_heavy_hitters(ev, "user_id", threshold_frac=0.01).count() == 0


# ---------------------------------------------------------------------------
# Two-level exact distinct
# ---------------------------------------------------------------------------
def test_distinct_two_level_matches_count_distinct(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = sorted(
        (r["event_type"], r["n_distinct"])
        for r in distinct_exact_two_level(ev, ["event_type"], "user_id").collect()
    )
    exact = sorted(
        (r["event_type"], r["n"])
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    )
    assert got == exact


def test_distinct_two_level_counts_null_as_a_value(spark):
    """COUNT(DISTINCT x) ignores NULLs; the two-level form counts group
    rows after pairing, so NULL becomes a countable distinct pair.  Pin
    the (documented) difference so nobody mistakes it for parity."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", None), ("b", None)], "g STRING, v INT"
    )
    got = {
        (r["g"], r["n_distinct"])
        for r in distinct_exact_two_level(df, ["g"], "v").collect()
    }
    assert got == {("a", 2), ("b", 1)}


# ---------------------------------------------------------------------------
# HLL mergeable distinct
# ---------------------------------------------------------------------------
def test_hll_distinct_error_bound(spark, sf_dir):
    from confluent_data_ingestion_spark.operators.sketch import hll_distinct

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    approx = {
        r["event_type"]: r["n_distinct_approx"]
        for r in hll_distinct(ev, ["event_type"], "user_id").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.05 * n), (k, approx[k], n)


def test_hll_shard_merge_equals_direct_sketch(spark, sf_dir):
    """Union of per-shard sketches must give the same estimates as one
    sketch over everything — the property that makes persisted daily
    sketches composable into any later rollup."""
    from confluent_data_ingestion_spark.operators.sketch import (
        hll_distinct,
        hll_merge_estimate,
        hll_shard_sketches,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "shard", F.pmod(F.col("event_id"), F.lit(7))
    )
    direct = {
        r["event_type"]: r["n_distinct_approx"]
        for r in hll_distinct(ev, ["event_type"], "user_id").collect()
    }
    shards = hll_shard_sketches(ev, ["event_type"], "user_id", "shard")
    merged = {
        r["event_type"]: r["n_distinct_approx"]
        for r in hll_merge_estimate(shards, ["event_type"]).collect()
    }
    # a union result reads through the composite estimator (HIP is lost on
    # merge, a DataSketches property), so allow the documented ~1% drift
    assert merged.keys() == direct.keys()
    for k, d in direct.items():
        assert abs(merged[k] - d) <= max(2, 0.02 * d), (k, merged[k], d)


def test_hll_merge_is_duplicate_insensitive(spark):
    """Re-ingesting the same shard twice must not inflate the estimate —
    set-union semantics, the reason sketch rollups tolerate replays.
    (The estimate may wobble ~1% because a union reads through the
    composite estimator rather than HIP; what it must NOT do is double.)
    """
    from confluent_data_ingestion_spark.operators.sketch import (
        hll_merge_estimate,
        hll_shard_sketches,
    )

    df = spark.range(0, 2000).select(
        F.lit("g").alias("g"), F.col("id").alias("v"), F.lit(0).alias("shard")
    )
    once = hll_shard_sketches(df, ["g"], "v", "shard")
    twice = once.unionAll(once)
    a = hll_merge_estimate(once, ["g"]).collect()[0]["n_distinct_approx"]
    b = hll_merge_estimate(twice, ["g"]).collect()[0]["n_distinct_approx"]
    assert abs(b - a) <= max(2, 0.02 * a), (a, b)


# ---------------------------------------------------------------------------
# Property-based: the one-sided contracts must hold for ANY key set
# ---------------------------------------------------------------------------
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@given(
    build=st.lists(st.integers(min_value=-10**9, max_value=10**9),
                   min_size=1, max_size=60, unique=True),
    probe=st.lists(st.integers(min_value=-10**9, max_value=10**9),
                   min_size=1, max_size=120),
    num_bits=st.sampled_from([64, 256, 4096]),
)
@settings(max_examples=6, deadline=None)
def test_bloom_semijoin_exact_for_any_keys(spark, build, probe, num_bits):
    """For arbitrary key sets — including heavy collisions at tiny bitset
    widths — bloom_semijoin must equal the plain semi-join exactly."""
    from confluent_data_ingestion_spark.operators.sketch import bloom_semijoin

    b = spark.createDataFrame([(k,) for k in build], "bk BIGINT")
    p = spark.createDataFrame([(k,) for k in probe], "pk BIGINT")
    got = sorted(
        r["pk"] for r in bloom_semijoin(p, b, "pk", "bk", num_bits=num_bits).collect()
    )
    want = sorted(k for k in probe if k in set(build))
    assert got == want


@given(
    counts=st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=1, max_value=40),
        min_size=1, max_size=12,
    ),
    frac=st.sampled_from([0.05, 0.2, 0.5]),
    width=st.sampled_from([4, 64]),
)
@settings(max_examples=6, deadline=None)
def test_cms_heavy_hitters_exact_for_any_distribution(spark, counts, frac, width):
    """For any key distribution and even a pathologically narrow sketch,
    the heavy-hitter set and counts must be exactly the naive GROUP BY +
    HAVING answer (collisions may only add pruned candidates)."""
    from confluent_data_ingestion_spark.operators.sketch import cms_heavy_hitters

    rows = [(k,) for k, c in counts.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "k INT")
    total = sum(counts.values())
    got = sorted(
        (r["k"], r["cnt"])
        for r in cms_heavy_hitters(df, "k", threshold_frac=frac, width=width).collect()
    )
    want = sorted(
        (k, c) for k, c in counts.items() if c >= frac * total
    )
    assert got == want
