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
