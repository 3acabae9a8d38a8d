"""Sketch-accelerated operators: Bloom-filter join pruning, count-min
heavy-hitter candidate pruning, and shuffle-bounded exact distinct counts.

At 100 TB the dominant cost of a selective join or a heavy-key scan is the
shuffle of the BIG side, most of whose rows are ultimately discarded.  The
operators here spend one cheap aggregation over the small/size-bounded side
to build a tiny probabilistic summary, push that summary into a map-side
filter on the big side (no shuffle, no Python), and only then run the exact
operator over the survivors.  The sketches are one-sided (no false
negatives), so the exact post-step makes every result EXACTLY equal to the
naive plan — the sketch changes the physics, never the answer.

All hashing is ``xxhash64`` (deterministic, JVM-side); all probe-side
predicates are pure column expressions inside whole-stage codegen.  The
only driver materialization is the sketch itself (a few KB), mirroring the
broadcast-centroid pattern used by the IVF operators.

Spark itself applies the same idea internally (runtime bloom-filter join
pruning, ``spark.sql.optimizer.runtime.bloomFilter.enabled``), but only
for joins it can rewrite; these operators make the pattern explicit and
composable with arbitrary downstream logic (aggregates, anti-joins,
dedup pipelines).
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit_positions(key: Column, seed: int, num_bits: int) -> Column:
    """Bloom bit position for (key, seed): pmod(xxhash64(key, seed), m)."""
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(num_bits))


def bloom_bitset(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 4,
) -> list[int]:
    """Build a Bloom bitset over ``df[key_col]`` distributively.

    Each row contributes ``num_hashes`` bit positions; positions are
    bucketed into 64-bit words and OR-combined by a single hash
    aggregation, so the shuffle carries at most ``num_bits/64`` rows no
    matter how large ``df`` is.  Returns the bitset as a Python list of
    ``num_bits // 64`` signed 64-bit words (a few KB — broadcast as a
    literal array by :func:`bloom_filter_pred`).
    """
    if num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    n_words = num_bits // 64
    key = F.col("__k")
    pos = (
        df.select(F.col(key_col).alias("__k"))
        .select(
            F.explode(
                F.array(*[_bit_positions(key, s, num_bits) for s in range(num_hashes)])
            ).alias("p")
        )
    )
    rows = (
        pos.select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    words = [0] * n_words
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def bloom_prune(
    df: DataFrame,
    key_col: str,
    words: list[int],
    num_hashes: int = 4,
) -> DataFrame:
    """Filter ``df`` to rows whose ``key_col`` MAY be in the Bloom set.

    Pure column expressions (one array literal + per-seed bit tests),
    evaluated map-side inside whole-stage codegen: the big table never
    shuffles to be pruned.  May pass false positives (removed by the exact
    join in :func:`bloom_semijoin`); never drops a true member.
    """
    num_bits = len(words) * 64
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    out = df.withColumn("__bloom_words", arr)
    pcols = []
    for s in range(num_hashes):
        out = out.withColumn(
            f"__bloom_p{s}", _bit_positions(F.col(key_col), s, num_bits)
        )
        pcols.append(f"__bloom_p{s}")
    tests = [
        F.expr(
            f"(element_at(__bloom_words, CAST(__bloom_p{s} / 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(__bloom_p{s} % 64 AS INT))) != 0"
        )
        for s in range(num_hashes)
    ]
    return out.filter(reduce(lambda a, b: a & b, tests)).drop(
        "__bloom_words", *pcols
    )


def bloom_semijoin(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 4,
) -> DataFrame:
    """Exact LEFT SEMI join of ``probe`` against ``build``, Bloom-pruned.

    Phase 1 builds a bitset over ``build[build_key]`` (one bounded
    aggregation).  Phase 2 filters ``probe`` map-side with the bitset —
    at 100 TB this is where the win lives: rows that cannot match never
    enter the join's shuffle or broadcast probe.  Phase 3 removes Bloom
    false positives with a real semi-join against the (small) build side,
    so the result is bit-identical to ``probe SEMI JOIN build``.
    """
    words = bloom_bitset(build, build_key, num_bits=num_bits, num_hashes=num_hashes)
    pruned = bloom_prune(probe, probe_key, words, num_hashes=num_hashes)
    keys = build.select(F.col(build_key).alias("__bk")).dropDuplicates()
    return pruned.join(
        F.broadcast(keys), pruned[probe_key] == F.col("__bk"), "left_semi"
    )


def cms_bucket_counts(
    df: DataFrame,
    key_col: str,
    width: int = 8192,
    depth: int = 3,
) -> tuple[DataFrame, int]:
    """Count-min sketch table over ``df[key_col]`` plus the exact row total.

    One pass: each row lands in one bucket per hash row (``depth`` buckets
    total), and a single hash aggregation produces the ``depth x width``
    (seed, bucket, cnt) table — at most ``depth * width`` rows regardless
    of input size.  The table is returned as a DataFrame so callers can
    broadcast-join it rather than inline tens of thousands of literals
    into the plan.  The exact total falls out of any single seed's counts.
    """
    rows, total = cms_bucket_rows(df, key_col, width, depth)
    sketch = df.sparkSession.createDataFrame(
        [(s, b, cnt) for (s, b, cnt) in rows],
        "s INT, b INT, cnt BIGINT",
    )
    return sketch, total


def cms_bucket_rows(
    df: DataFrame,
    key_col: str,
    width: int = 8192,
    depth: int = 3,
) -> tuple[list[tuple[int, int, int]], int]:
    """The collected ``(seed, bucket, cnt)`` rows of ``cms_bucket_counts``
    plus the exact total — for callers that consume the sketch
    driver-side (e.g. the join advisor's per-seed statistics, a loop
    over <= depth*width integers): returning the rows directly skips the
    createDataFrame round-trip and the extra Spark job a re-aggregation
    of driver-built rows would cost."""
    key = F.col("__k")
    exploded = df.select(F.col(key_col).alias("__k")).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.pmod(F.xxhash64(key, F.lit(s)), F.lit(width)).alias("b"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("sb")
    )
    counts = (
        exploded.groupBy(F.col("sb.s").alias("s"), F.col("sb.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rows = [
        (int(r["s"]), int(r["b"]), int(r["cnt"])) for r in counts.collect()
    ]
    total = sum(cnt for (s, _b, cnt) in rows if s == 0)
    return rows, int(total)


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold_frac: float,
    width: int = 8192,
    depth: int = 3,
    out_count_col: str = "cnt",
) -> DataFrame:
    """Exact keys whose row count is >= ``threshold_frac`` of the total,
    found via count-min candidate pruning.

    The naive plan shuffles EVERY row on ``key_col`` to count it.  Here
    the sketch's bucket counts — an upper bound on any key's true count,
    so no heavy key can be missed — are broadcast-joined onto the big
    side (``depth`` map-side BroadcastHashJoins, zero big-side shuffle),
    rows whose minimum bucket estimate is below threshold are dropped
    in place, and only the surviving candidate rows shuffle into the
    exact count + HAVING.  With a skewed key distribution the exact
    shuffle carries a tiny fraction of the input.  Output: one row per
    truly-heavy key with its EXACT count.
    """
    sketch, total = cms_bucket_counts(df, key_col, width=width, depth=depth)
    threshold = float(total) * float(threshold_frac)
    probe = df.select(F.col(key_col))
    for s in range(depth):
        side = (
            sketch.filter(F.col("s") == s)
            .select(F.col("b").alias(f"__b{s}"), F.col("cnt").alias(f"__c{s}"))
        )
        probe = probe.withColumn(
            f"__h{s}", F.pmod(F.xxhash64(F.col(key_col), F.lit(s)), F.lit(width))
        ).join(
            F.broadcast(side), F.col(f"__h{s}") == F.col(f"__b{s}"), "left"
        )
    est = F.least(*[F.col(f"__c{s}") for s in range(depth)])
    candidates = probe.filter(est >= F.lit(threshold)).select(key_col)
    return (
        candidates.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias(out_count_col))
        .filter(F.col(out_count_col) >= F.lit(threshold))
    )


def hll_shard_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    shard_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-(shard, group) HLL sketches — the persistable partial state of
    a distinct-count rollup.

    This is the piece a 100 TB incremental pipeline actually stores:
    compute one sketch per (day, group) as data lands, persist the
    (shard, group, sketch-binary) frame, and answer any coarser rollup
    later by UNIONING sketches (:func:`hll_merge_estimate`) without ever
    rescanning the raw rows.  ``lgk`` is the DataSketches log2(k)
    accuracy knob (12 → ~1.6% RSE, 2.5 KB per sketch).  Built on
    Spark 4's Apache DataSketches-compatible ``hll_sketch_agg`` — the
    binary column is interoperable with any DataSketches reader.
    """
    return df.groupBy(shard_col, *group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("hll_sketch")
    )


def hll_merge_estimate(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll_sketch",
    out_col: str = "n_distinct_approx",
) -> DataFrame:
    """Collapse persisted shard sketches to per-group distinct estimates.

    The shuffle carries one ~KB sketch per (shard, group) — metadata
    scale — and the merge has set-union semantics: re-ingesting a shard
    (replay, backfill) cannot inflate the count.  One honest caveat,
    pinned in the tests: a union reads through the composite estimator
    (the per-sketch HIP estimator does not survive merging — a
    DataSketches property), so a merged estimate may differ from the
    single-pass sketch by ~1 % while remaining duplicate-insensitive.
    """
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(True))
        ).alias(out_col)
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
    out_col: str = "n_distinct_approx",
) -> DataFrame:
    """One-shot per-group approximate COUNT DISTINCT (~1.6% RSE at the
    default ``lgk``).  Use :func:`distinct_exact_two_level` when the
    answer must be exact; use the shard/merge pair above when the same
    counts will be rolled up repeatedly or incrementally."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(value_col), F.lit(lgk))
        ).alias(out_col)
    )


def distinct_exact_two_level(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact per-group COUNT(DISTINCT value) as two hash aggregations.

    A single ``countDistinct`` shuffles on the group key and must hold
    every distinct value of a group in one reducer's hash set — the
    classic OOM on a skewed group at 100 TB.  Re-aggregation shuffles on
    (group, value) first (map-side combine collapses duplicates early,
    and the wider key spreads a hot group across reducers), then counts
    rows per group; the second shuffle carries exactly one row per
    distinct pair.  Same answer, bounded reducers — with one documented
    divergence: ``COUNT(DISTINCT x)`` ignores NULL values, while this
    form counts NULL as one distinct value per group (pinned in
    ``test_distinct_two_level_counts_null_as_a_value``).  Pre-filter
    ``value_col IS NOT NULL`` when SQL parity on nullable columns
    matters.
    """
    pairs = df.select(*group_cols, value_col).groupBy(*group_cols, value_col).agg(
        F.lit(1).alias("__one")
    )
    return pairs.groupBy(*group_cols).agg(F.count(F.lit(1)).alias(out_col))
