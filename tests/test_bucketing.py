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
