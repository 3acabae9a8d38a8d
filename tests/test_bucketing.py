"""Bucketed materialization: co-located joins must plan with zero
Exchange, bucket-key aggregations reuse the layout, and bucket pruning
reaches the scan."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, sf_dir):
    from confluent_data_ingestion_spark.operators.bucketing import (
        write_bucketed,
    )
    from confluent_data_ingestion_spark.session import load_tables

    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    suffix = uuid.uuid4().hex[:8]
    ot, lt = f"b_orders_{suffix}", f"b_lineitem_{suffix}"
    write_bucketed(t["orders"], ot, ["o_orderkey"], 8,
                   sort_cols=["o_orderkey"])
    write_bucketed(t["lineitem"], lt, ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"])
    # the structural assertions are about the BUCKETED layout: disable the
    # small-table broadcast fallback and the planner's option to decline a
    # bucketed scan for parallelism on these tiny test tables
    saved = {
        k: spark.conf.get(k)
        for k in ("spark.sql.autoBroadcastJoinThreshold",
                  "spark.sql.sources.bucketing.autoBucketedScan.enabled")
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    yield ot, lt
    for k, v in saved.items():
        spark.conf.set(k, v)
    spark.sql(f"DROP TABLE IF EXISTS {ot}")
    spark.sql(f"DROP TABLE IF EXISTS {lt}")


def test_colocated_join_has_no_exchange(spark, bucketed_pair):
    from confluent_data_ingestion_spark.operators.bucketing import (
        colocated_join,
    )

    ot, lt = bucketed_pair
    j = colocated_join(spark, lt, ot, on=[("l_orderkey", "o_orderkey")])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # and it still returns the right row count (inner join on FK)
    want = j.count()
    got = (
        spark.table(lt).join(
            spark.table(ot).hint("shuffle_hash"),
            spark.table(lt).l_orderkey == spark.table(ot).o_orderkey,
        ).count()
    )
    assert want == got


def test_bucket_key_aggregation_skips_shuffle(spark, bucketed_pair):
    _, lt = bucketed_pair
    agg = spark.table(lt).groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join over plain parquet has Exchanges — the
    zero-Exchange assertion above is the bucketing, not AQE magic."""
    from confluent_data_ingestion_spark.session import load_tables

    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    li = t["lineitem"].withColumn("__x__", F.lit(1))  # defeat scan reuse
    j = li.join(t["orders"], li.l_orderkey == t["orders"].o_orderkey)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan or "BroadcastHashJoin" in plan


def test_bucket_pruning_reaches_scan(spark, bucketed_pair):
    _, lt = bucketed_pair
    q = spark.table(lt).filter(F.col("l_orderkey") == 42)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # FileSourceScan advertises the selected bucket subset
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan


# ---------------------------------------------------------------------------
# Z-order layout: per-file ranges tight on BOTH columns at once
# ---------------------------------------------------------------------------
def test_zorder_beats_linear_sort_for_multidim_skipping(spark):
    from confluent_data_ingestion_spark.operators.bucketing import zorder_by

    # a 64x64 grid: x and y are independent — a linear sort on x leaves y
    # spanning the whole domain inside every file
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("int").alias("y")
    )
    n_files = 16

    def avg_files_hit(df, order_col, probe_col):
        """Avg number of files whose [min,max] stats admit a point query
        on probe_col — what min/max data skipping actually prunes by."""
        parts = (
            df.repartitionByRange(n_files, F.col(order_col))
            .sortWithinPartitions(order_col)
            .withColumn("__f__", F.spark_partition_id())
            .groupBy("__f__")
            .agg(F.min(probe_col).alias("lo"), F.max(probe_col).alias("hi"))
        )
        probes = df.select(probe_col).distinct()
        hits = probes.crossJoin(parts).filter(
            (F.col(probe_col) >= F.col("lo"))
            & (F.col(probe_col) <= F.col("hi"))
        ).groupBy(probe_col).count()
        return hits.agg(F.avg("count")).collect()[0][0]

    z = zorder_by(grid, ["x", "y"], bits=6)
    zx = avg_files_hit(z, "zorder_key", "x")
    zy = avg_files_hit(z, "zorder_key", "y")
    lin = grid.withColumn("k", F.col("x"))
    lx = avg_files_hit(lin, "k", "x")
    ly = avg_files_hit(lin, "k", "y")
    # linear sort on x: perfect pruning on x (1 file) but NO pruning on y
    # (every file spans the y domain).  Z-order prunes BOTH dimensions:
    # the worst dimension improves ~4x (16 files -> ~4 tile columns).
    assert ly >= n_files * 0.9           # control: linear can't skip on y
    assert max(zx, zy) < max(lx, ly) / 2, (zx, zy, lx, ly)


def test_zorder_key_deterministic_and_complete(spark):
    from confluent_data_ingestion_spark.operators.bucketing import zorder_by

    df = spark.range(100).select(
        F.col("id").alias("x"), (99 - F.col("id")).alias("y")
    )
    out = zorder_by(df, ["x", "y"], bits=4)
    rows = out.collect()
    assert all(r.zorder_key is not None for r in rows)
    # re-derivation matches (pure function of data)
    again = {(r.x, r.y): r.zorder_key for r in
             zorder_by(df, ["x", "y"], bits=4).collect()}
    for r in rows:
        assert again[(r.x, r.y)] == r.zorder_key


def test_zorder_constant_column_is_zero_not_null(spark):
    from confluent_data_ingestion_spark.operators.bucketing import zorder_by

    df = spark.range(10).select(F.col("id").alias("x"), F.lit(7).alias("y"))
    rows = zorder_by(df, ["x", "y"], bits=4).collect()
    assert all(r.zorder_key is not None for r in rows)
