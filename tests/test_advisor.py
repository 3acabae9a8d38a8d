"""Join advisor: the recommendation must match the planted shape of the
inputs - small dim -> broadcast, balanced -> shuffle, hot key -> salted."""

from __future__ import annotations

from pyspark.sql import functions as F

from confluent_data_ingestion_spark.operators.advisor import join_advice, side_stats


def test_small_dimension_gets_broadcast(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    na = spark.read.parquet(f"{sf_dir}/nation.parquet")
    adv = join_advice(li, na, "l_suppkey", "n_nationkey")
    assert adv.strategy == "broadcast_right"
    assert adv.salt == 1
    assert adv.right.rows == 25


def test_balanced_big_sides_get_shuffle(spark):
    a = spark.range(0, 500_000).select(F.col("id").alias("k"))
    b = spark.range(0, 500_000).select(F.col("id").alias("k"))
    adv = join_advice(a, b, "k", "k")
    assert adv.strategy == "shuffle"


def test_hot_key_gets_salted_with_sane_factor(spark):
    hot = spark.range(0, 200_000).select(F.lit(7).alias("k"))
    cold = spark.range(0, 200_000).select((F.col("id") % 50_000).alias("k"))
    skewed = hot.unionAll(cold)
    other = spark.range(0, 500_000).select((F.col("id") % 50_000).alias("k"))
    adv = join_advice(skewed, other, "k", "k")
    assert adv.strategy == "salted"
    assert 2 <= adv.salt <= 32
    assert "salted_join" in adv.reason
    # and the recommended mechanism really produces the exact join result
    from confluent_data_ingestion_spark.operators.skew import salted_join

    got = salted_join(skewed, other.distinct(), ["k"], n_salt=adv.salt).count()
    want = skewed.join(other.distinct(), "k").count()
    assert got == want


def test_side_stats_never_under_report_the_hot_key(spark):
    df = spark.range(0, 10_000).select(F.lit("HOT").alias("k")).unionAll(
        spark.range(0, 1_000).select(F.concat(F.lit("c"), F.col("id")).alias("k"))
    )
    st = side_stats(df, "k")
    assert st.rows == 11_000
    # a genuinely hot key survives the collision correction ~intact
    assert st.hottest_key_rows >= 9_500
    assert st.skew_ratio > 5


def test_multirow_balanced_keys_not_salted(spark):
    """~4 rows per key on every key (lineitem's orderkey shape): balanced,
    but the pre-r11 unit-weight noise floor under-estimated the sketch's
    collision variance and called it skew.  The measured-sigma floor must
    say shuffle."""
    a = spark.range(0, 240_000).select((F.col("id") % 60_000).alias("k"))
    b = spark.range(0, 150_000).select(F.col("id").alias("k"))
    adv = join_advice(a, b, "k", "k")
    assert adv.strategy == "shuffle"


def test_hot_key_on_smaller_side_detected(spark):
    """A hot key strands its reducer regardless of which input carries it;
    the pre-r11 advisor only examined the bigger side."""
    hot = spark.range(0, 150_000).select(F.lit(3).alias("k"))
    cold = spark.range(0, 50_000).select((F.col("id") % 25_000).alias("k"))
    small_skewed = hot.unionAll(cold)          # 200k rows, hot key
    big_balanced = spark.range(0, 500_000).select(
        (F.col("id") % 100_000).alias("k")
    )
    adv = join_advice(big_balanced, small_skewed, "k", "k")
    assert adv.strategy == "salted"
    assert "right side" in adv.reason


def test_side_stats_scans_the_source_exactly_once(spark, sf_dir):
    """The profile's contract is ONE scan of the source per side (module
    docstring; r11 review found the CMS job and the HLL job each reading
    the table).  An Arrow tap between the parquet scan and the profile
    counts how many rows stream OUT of the source: the persisted key
    projection means both aggregation jobs together pull each row
    through exactly once."""
    acc = spark.sparkContext.accumulator(0)

    def tap(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey"
    )
    n = src.count()
    tapped = src.mapInPandas(tap, "o_custkey long")
    acc.value = 0
    stats = side_stats(tapped, "o_custkey")
    assert stats.rows == n
    assert acc.value == n, (
        f"source streamed {acc.value} rows for {n}-row input — "
        f"{acc.value / n:.1f} scans; the profile must scan once"
    )
