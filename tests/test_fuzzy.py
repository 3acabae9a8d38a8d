"""SymSpell deletion-neighborhood fuzzy join: exactness vs brute force,
false-positive elimination, edge shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from confluent_data_ingestion_spark.operators.fuzzy import (
    deletion_neighborhood,
    fuzzy_pairs_d1,
)


def _brute(rows):
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    return sorted(
        (i, j)
        for ii, (i, ta) in enumerate(rows)
        for (j, tb) in rows[ii + 1:]
        if lev(ta, tb) <= 1
    )


def test_fuzzy_pairs_match_brute_force(spark):
    rows = [
        (1, "supplier"), (2, "suplier"), (3, "suppliers"), (4, "zupplier"),
        (5, "ab"), (6, "ba"), (7, "a"), (8, "b"), (9, ""),
        (10, "supplier"), (11, "totally-different"),
    ]
    df = spark.createDataFrame(rows, "id INT, name STRING")
    got = sorted(
        (r["id_a"], r["id_b"]) for r in fuzzy_pairs_d1(df, "id", "name").collect()
    )
    assert got == _brute(rows)
    # the ab/ba false-positive pair (shared deletions, distance 2) is gone
    assert (5, 6) not in got
    # and genuine distance-1 pairs of every edit kind are present
    for pair in [(1, 2), (1, 3), (1, 4), (1, 10), (7, 9)]:
        assert pair in got


def test_fuzzy_pairs_on_supplier_names(spark, sf_dir):
    su = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    got = fuzzy_pairs_d1(su, "s_suppkey", "s_name")
    rows = [(r["s_suppkey"], r["s_name"]) for r in su.collect()]
    assert sorted(
        (r["id_a"], r["id_b"]) for r in got.collect()
    ) == _brute(sorted(rows))
    assert got.filter(F.col("dist") > 1).count() == 0


def test_neighborhood_size_is_length_plus_one(spark):
    df = spark.createDataFrame([(1, "abcd")], "id INT, name STRING")
    nb = deletion_neighborhood(df, "id", "name")
    variants = {r["__variant"] for r in nb.collect()}
    assert variants == {"abcd", "bcd", "acd", "abd", "abc"}


def test_hot_variant_cap_bounds_groups(spark):
    # 50 strings all sharing the hot variant "x" (they are "x" + one char)
    rows = [(i, "x" + chr(97 + i % 26)) for i in range(50)]
    df = spark.createDataFrame(rows, "id INT, name STRING")
    capped = fuzzy_pairs_d1(df, "id", "name", max_group=10)
    uncapped = fuzzy_pairs_d1(df, "id", "name")
    # cap drops pairs, never fabricates them; every surviving pair is real
    assert capped.count() <= uncapped.count()
    assert capped.filter(F.col("dist") > 1).count() == 0


def test_fuzzy_pairs_d2_match_brute_force(spark):
    from confluent_data_ingestion_spark.operators.fuzzy import fuzzy_pairs

    rows = [
        (1, "supplier"), (2, "suplier"), (3, "spplier"), (4, "splier"),
        (5, "ab"), (6, "ba"), (7, "abcd"), (8, "badc"), (9, "xx"),
        (10, "supplier!!"), (11, "totally-different"),
    ]
    df = spark.createDataFrame(rows, "id INT, name STRING")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_pairs(df, "id", "name", d=2).collect()
    )

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = sorted(
        (i, j, lev(ta, tb))
        for ii, (i, ta) in enumerate(rows)
        for (j, tb) in rows[ii + 1:]
        if lev(ta, tb) <= 2
    )
    assert got == want
    # transposition pairs (distance 2 under plain Levenshtein) now appear
    assert (5, 6, 2) in got
    # and the double-insertion pair
    assert (1, 10, 2) in got


def test_fuzzy_pairs_rejects_unsupported_distance(spark):
    import pytest as _pytest

    from confluent_data_ingestion_spark.operators.fuzzy import fuzzy_pairs

    df = spark.createDataFrame([(1, "a")], "id INT, name STRING")
    with _pytest.raises(ValueError, match="d must be"):
        fuzzy_pairs(df, "id", "name", d=3).collect()
