"""Group-privacy gates (operators/privacy.py): hand-checked suppression
and the k+l release verdict on a planted table."""

import pytest
from pyspark.sql import functions as F

from confluent_data_ingestion_spark.operators.privacy import (
    k_anonymize_suppress,
    privacy_group_report,
)


@pytest.fixture(scope="module")
def people(spark):
    # quasi = (zip, age_band); sensitive = condition
    rows = [
        # group A: 3 members, 3 distinct conditions
        (1, "02139", "30s", "flu"),
        (2, "02139", "30s", "cold"),
        (3, "02139", "30s", "ok"),
        # group B: 2 members (below k=3)
        (4, "94103", "40s", "flu"),
        (5, "94103", "40s", "ok"),
        # group C: 4 members but ONE condition (k passes, l fails)
        (6, "10001", "20s", "flu"),
        (7, "10001", "20s", "flu"),
        (8, "10001", "20s", "flu"),
        (9, "10001", "20s", "flu"),
    ]
    return spark.createDataFrame(
        rows, "pid long, zip string, age_band string, condition string"
    )


def test_k_suppress_drops_small_groups(people):
    out = k_anonymize_suppress(people, ["zip", "age_band"], k=3)
    kept = {r["pid"] for r in out.collect()}
    assert kept == {1, 2, 3, 6, 7, 8, 9}  # group B suppressed
    sizes = {r["pid"]: r["group_size"] for r in out.collect()}
    assert sizes[1] == 3 and sizes[6] == 4


def test_k_suppress_boundary_inclusive(people):
    # k equal to the group size keeps the group; k above drops it
    assert k_anonymize_suppress(people, ["zip", "age_band"], k=4).count() == 4
    assert k_anonymize_suppress(people, ["zip", "age_band"], k=5).count() == 0


def test_group_report_k_and_l(people):
    rep = {
        (r["zip"], r["age_band"]): r
        for r in privacy_group_report(
            people, ["zip", "age_band"], "condition", k=3, l_div=3
        ).collect()
    }
    a = rep[("02139", "30s")]
    assert (a["group_size"], a["distinct_sensitive"], a["releasable"]) == (3, 3, True)
    b = rep[("94103", "40s")]
    assert b["releasable"] is False  # too small
    c = rep[("10001", "20s")]
    # k passes but every member shares one condition: l-diversity fails
    assert (c["group_size"], c["distinct_sensitive"], c["releasable"]) == (4, 1, False)


def test_sensitive_accepts_expression(people):
    rep = privacy_group_report(
        people,
        ["zip"],
        F.length("condition"),  # bucketed sensitive expression
        k=2,
        l_div=2,
    )
    assert {r["zip"] for r in rep.collect()} == {"02139", "94103", "10001"}


def test_bucket_rule_lower_bound_and_negatives(spark):
    from confluent_data_ingestion_spark.operators.privacy import (
        bucket_rule, generalize_quasi,
    )

    df = spark.createDataFrame(
        [(1, 2345.67), (2, -999.0), (3, 1000.0), (4, 0.0)],
        "pid long, bal double",
    )
    out = {
        r["pid"]: r["bal"]
        for r in generalize_quasi(df, {"bal": bucket_rule(1000.0)}).collect()
    }
    # lower bound, negatives floor DOWN (the bucket a value is IN)
    assert out == {1: 2000.0, 2: -1000.0, 3: 1000.0, 4: 0.0}


def test_truncate_rule_prefix(spark):
    from confluent_data_ingestion_spark.operators.privacy import (
        generalize_quasi, truncate_rule,
    )

    df = spark.createDataFrame(
        [(1, "02139"), (2, "02144"), (3, "94103")], "pid long, zip string"
    )
    out = {
        r["pid"]: r["zip"]
        for r in generalize_quasi(df, {"zip": truncate_rule(3)}).collect()
    }
    assert out == {1: "021", 2: "021", 3: "941"}


def test_generalize_is_pure_projection(spark):
    """The rewrite must add NO shuffle — the gate that follows pays the
    only one."""
    from confluent_data_ingestion_spark.operators.privacy import (
        bucket_rule, generalize_quasi, truncate_rule,
    )

    df = spark.createDataFrame(
        [(1, "02139", 10.0)], "pid long, zip string, bal double"
    )
    plan = generalize_quasi(
        df, {"zip": truncate_rule(3), "bal": bucket_rule(1000.0)}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_generalize_then_gate_releases_more_than_raw(spark):
    """The suppression-vs-generalization trade on planted data: raw
    near-unique zips release nothing at k=3; 3-digit prefixes release
    every row of the shared prefix group."""
    from confluent_data_ingestion_spark.operators.privacy import (
        generalize_quasi, k_anonymize_suppress, truncate_rule,
    )

    df = spark.createDataFrame(
        [(i, f"0213{i}") for i in range(6)], "pid long, zip string"
    )
    assert k_anonymize_suppress(df, ["zip"], k=3).count() == 0
    gen = generalize_quasi(df, {"zip": truncate_rule(4)})
    out = k_anonymize_suppress(gen, ["zip"], k=3)
    assert out.count() == 6
    assert {r["zip"] for r in out.collect()} == {"0213"}  # released datum


def test_generalize_accepts_ready_column_expression(spark):
    from confluent_data_ingestion_spark.operators.privacy import (
        generalize_quasi,
    )

    df = spark.createDataFrame(
        [(1, 17), (2, 34), (3, 71)], "pid long, age long"
    )
    out = {
        r["pid"]: r["age"]
        for r in generalize_quasi(
            df, {"age": F.expr("cast(age div 20 * 20 as bigint)")}
        ).collect()
    }
    assert out == {1: 0, 2: 20, 3: 60}
