"""File-level data skipping: exactness vs the full scan, one-sidedness
(NULL stats / no provable exclusion keep the file), real pruning on a
Z-ordered layout, and the empty-survivor edge."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from confluent_data_ingestion_spark.operators.bucketing import zorder_by
from confluent_data_ingestion_spark.operators.skipping import (
    collect_file_stats,
    prune_files,
    skip_scan,
)


@pytest.fixture(scope="module")
def zordered_events(spark, sf_dir, tmp_path_factory):
    """Events written Z-ordered on (user_id, value) into many small files
    so per-file envelopes are tight on both columns."""
    out = str(tmp_path_factory.mktemp("skip") / "events_z")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    z = zorder_by(ev, ["user_id", "value"], bits=12)
    (
        z.repartitionByRange(16, F.col("zorder_key"))
        .sortWithinPartitions("zorder_key")
        .drop("zorder_key")
        .write.mode("overwrite")
        .parquet(out)
    )
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_skip_scan_matches_full_scan(spark, zordered_events):
    ranges = {"user_id": (3.0, 6.0), "value": (0.0, 60.0)}
    got = skip_scan(spark, zordered_events, ranges)
    full = (
        spark.read.parquet(zordered_events)
        .filter(F.col("user_id").between(3.0, 6.0))
        .filter(F.col("value").between(0.0, 60.0))
    )
    key = lambda df: sorted(  # noqa: E731
        (r["event_id"], r["user_id"]) for r in df.select("event_id", "user_id").collect()
    )
    assert key(got) == key(full)
    assert got.count() > 0  # non-degenerate fixture


def test_skip_scan_actually_prunes_zordered_layout(spark, zordered_events):
    """On a Z-ordered layout a small hyper-rectangle must hit a strict
    subset of files — otherwise the index is dead weight."""
    stats = collect_file_stats(spark, zordered_events, ["user_id", "value"])
    kept, total = prune_files(stats, {"user_id": (3.0, 6.0), "value": (0.0, 60.0)})
    assert total >= 8  # the fixture really produced many files
    assert 0 < len(kept) < total


def test_prune_keeps_file_with_null_stats(spark, tmp_path):
    """A file whose stats column is all NULL cannot be ruled out: min/max
    are NULL, and the one-sided contract says keep it."""
    out = str(tmp_path / "nulls")
    spark.createDataFrame([(None,), (None,)], "v DOUBLE").coalesce(1).write.mode(
        "overwrite"
    ).parquet(out)
    stats = collect_file_stats(spark, out, ["v"])
    kept, total = prune_files(stats, {"v": (10.0, 20.0)})
    assert total == 1 and len(kept) == 1


def test_skip_scan_no_surviving_files(spark, zordered_events):
    got = skip_scan(spark, zordered_events, {"user_id": (-50.0, -10.0)})
    assert got.count() == 0
    assert "event_id" in got.columns  # schema preserved


def test_open_ended_ranges(spark, zordered_events):
    hi = skip_scan(spark, zordered_events, {"value": (None, 10.0)})
    full = spark.read.parquet(zordered_events).filter(F.col("value") <= 10.0)
    assert hi.count() == full.count()


def test_stats_index_is_metadata_sized(spark, zordered_events):
    stats = collect_file_stats(spark, zordered_events, ["user_id"])
    n_files = len(
        [f for f in os.listdir(zordered_events) if f.endswith(".parquet")]
    )
    assert stats.count() == n_files


def test_zorder_append_incremental_maintenance(spark, zordered_events, tmp_path):
    """Appending a Z-ordered batch: base files byte-untouched, stats index
    gains exactly the new files' rows, the merged index serves an exact
    range query across BOTH generations, and pruning still skips files."""
    from confluent_data_ingestion_spark.operators.skipping import zorder_append

    cols = ["user_id", "value"]
    base_stats = collect_file_stats(spark, zordered_events, cols)
    before = {
        f: os.path.getmtime(os.path.join(zordered_events, f))
        for f in os.listdir(zordered_events) if f.endswith(".parquet")
    }

    batch = (
        spark.read.parquet(zordered_events)
        .filter(F.col("event_id") % 5 == 0)
        .withColumn("event_id", F.col("event_id") + F.lit(10_000_000))
    )
    gen1 = str(tmp_path / "gen1")
    merged = zorder_append(spark, batch, cols, gen1, base_stats, n_files=4)

    # base generation untouched: same files, same mtimes
    after = {
        f: os.path.getmtime(os.path.join(zordered_events, f))
        for f in os.listdir(zordered_events) if f.endswith(".parquet")
    }
    assert after == before
    # batch lands in a unique batch-* subdirectory (never an overwrite of
    # out_dir — an overwrite could delete files an older index references)
    new_files = [
        os.path.join(d, f)
        for d, _, fs in os.walk(gen1) for f in fs if f.endswith(".parquet")
    ]
    assert new_files and all(
        os.path.basename(os.path.dirname(p)).startswith("batch-")
        for p in new_files
    )
    assert merged.count() == base_stats.count() + len(new_files)

    # exact across generations: skip-scan == full filtered union
    ranges = {"user_id": (3.0, 6.0), "value": (0.0, 60.0)}
    got = skip_scan(spark, zordered_events, ranges, stats=merged)
    full = (
        spark.read.parquet(zordered_events)
        .unionByName(
            spark.read.option("recursiveFileLookup", "true").parquet(gen1)
        )
        .filter(F.col("user_id").between(3.0, 6.0))
        .filter(F.col("value").between(0.0, 60.0))
    )
    key = lambda df: sorted(  # noqa: E731
        (r["event_id"], r["user_id"])
        for r in df.select("event_id", "user_id").collect()
    )
    assert key(got) == key(full)
    # and the merged index still prunes (batch files are clustered too)
    kept, total = prune_files(merged, ranges)
    assert 0 < len(kept) < total


def test_zorder_append_same_dir_twice_keeps_first_batch(
    spark, zordered_events, tmp_path
):
    """Reusing one out_dir across appends (the natural misuse of an
    append API) must never delete files an earlier merged index still
    references — before the unique-subdirectory fix the second call's
    overwrite broke every skip_scan through the first index."""
    from confluent_data_ingestion_spark.operators.skipping import zorder_append

    cols = ["user_id", "value"]
    base_stats = collect_file_stats(spark, zordered_events, cols)
    base = spark.read.parquet(zordered_events)
    gen = str(tmp_path / "gen")
    b1 = base.filter(F.col("event_id") % 5 == 0).withColumn(
        "event_id", F.col("event_id") + F.lit(10_000_000)
    )
    merged1 = zorder_append(spark, b1, cols, gen, base_stats, n_files=2)
    b2 = base.filter(F.col("event_id") % 7 == 0).withColumn(
        "event_id", F.col("event_id") + F.lit(20_000_000)
    )
    merged2 = zorder_append(spark, b2, cols, gen, base_stats, n_files=2)
    ranges = {"user_id": (3.0, 6.0), "value": (0.0, 60.0)}
    # the FIRST index still resolves every file it references
    n1 = skip_scan(spark, zordered_events, ranges, stats=merged1).count()
    n2 = skip_scan(spark, zordered_events, ranges, stats=merged2).count()
    expect1 = (
        base.unionByName(b1)
        .filter(F.col("user_id").between(3.0, 6.0))
        .filter(F.col("value").between(0.0, 60.0))
        .count()
    )
    assert n1 == expect1 and n2 > 0


# ---------------------------------------------------------------------------
# Compaction planner
# ---------------------------------------------------------------------------
def test_compaction_plan_and_apply(spark, tmp_path):
    from confluent_data_ingestion_spark.operators.skipping import (
        apply_compaction,
        compaction_plan,
        list_files,
    )

    src = str(tmp_path / "frag")
    # 20 tiny files (streaming-ingest shape)
    spark.range(0, 2000).repartition(20).write.mode("overwrite").parquet(src)
    files = list_files(spark, src)
    assert len(files) == 20 and all(b > 0 for _, b in files)

    plan = compaction_plan(spark, src, target_bytes=1 << 20)
    planned = [f for b in plan for f in b]
    # every bin merges at least 2 files; no file planned twice
    assert plan and all(len(b) >= 2 for b in plan)
    assert len(planned) == len(set(planned))
    # bins respect the target unless singleton (none here)
    sizes = dict(files)
    assert all(sum(sizes[f] for f in b) <= (1 << 20) for b in plan)

    out = str(tmp_path / "compact")
    apply_compaction(spark, src, plan, out)
    # out_dir is a COMPLETE replacement layout: planned bins rewritten as
    # one file each, right-sized/unplanned files copied over verbatim
    got = spark.read.parquet(out)
    full = spark.read.parquet(src)
    assert sorted(r["id"] for r in got.collect()) == sorted(
        r["id"] for r in full.collect()
    )
    n_unplanned = len(files) - len(planned)
    assert len(list_files(spark, out)) == len(plan) + n_unplanned

    # refuses to clobber an existing output layout
    import pytest

    with pytest.raises(FileExistsError):
        apply_compaction(spark, src, plan, out)

    # a crash mid-plan leaves NO partial out_dir (staging is swept)
    import os

    bad = str(tmp_path / "never")
    broken_plan = [[files[0][0], str(tmp_path / "missing.parquet")]]
    with pytest.raises(Exception):
        apply_compaction(spark, src, broken_plan, bad)
    assert not os.path.exists(bad)
    assert not [
        d for d in os.listdir(tmp_path) if d.startswith("never.staging-")
    ]


def test_compaction_preserves_partitioned_layout(spark, tmp_path):
    """A Hive-partitioned source must compact per partition directory:
    bins never span partitions, rewritten files land inside their
    partition dir, carried-over files keep their relative subpath — so
    the directory-derived partition column survives the rewrite."""
    import os

    from pyspark.sql import functions as F

    from confluent_data_ingestion_spark.operators.skipping import (
        apply_compaction,
        compaction_plan,
    )

    src = str(tmp_path / "part_src")
    (
        spark.range(0, 3000)
        .withColumn("pt", F.col("id") % 3)
        .repartition(8)
        .write.partitionBy("pt")
        .mode("overwrite")
        .parquet(src)
    )
    plan = compaction_plan(spark, src, target_bytes=1 << 20)
    assert plan  # tiny files exist in every partition
    # every bin stays inside ONE partition directory
    for members in plan:
        assert len({m.rsplit("/", 2)[-2] for m in members}) == 1

    out = str(tmp_path / "part_out")
    apply_compaction(spark, src, plan, out)
    assert sorted(
        d for d in os.listdir(out) if d.startswith("pt=")
    ) == ["pt=0", "pt=1", "pt=2"]
    got = spark.read.parquet(out)
    assert "pt" in got.columns  # partition column survived
    want = {(r["id"], r["pt"]) for r in spark.read.parquet(src).collect()}
    assert {(r["id"], r["pt"]) for r in got.collect()} == want


def test_compaction_plan_leaves_right_sized_files_alone(spark, tmp_path):
    from confluent_data_ingestion_spark.operators.skipping import compaction_plan

    src = str(tmp_path / "big")
    spark.range(0, 1000).coalesce(1).write.mode("overwrite").parquet(src)
    # the single file is >= small_factor * tiny target -> not a candidate
    assert compaction_plan(spark, src, target_bytes=1024, small_factor=0.5) == []


def test_refresh_file_stats_scans_only_new_files(spark, tmp_path):
    from confluent_data_ingestion_spark.operators.skipping import (
        collect_file_stats,
        refresh_file_stats,
    )

    path = str(tmp_path / "inc")
    spark.range(0, 100).coalesce(2).write.mode("overwrite").parquet(path)
    base = collect_file_stats(spark, path, ["id"])
    base_rows = sorted(map(tuple, base.collect()))

    # append new data -> refresh must equal a from-scratch rebuild
    spark.range(100, 200).coalesce(1).write.mode("append").parquet(path)
    refreshed = refresh_file_stats(spark, path, base, ["id"])
    assert sorted(map(tuple, refreshed.collect())) == sorted(
        map(tuple, collect_file_stats(spark, path, ["id"]).collect())
    )
    # the pre-existing files' rows came through unchanged (not rescanned)
    kept = [t for t in sorted(map(tuple, refreshed.collect())) if t in base_rows]
    assert len(kept) == 2

    # no new files -> pure metadata no-op, result unchanged
    again = refresh_file_stats(spark, path, refreshed, ["id"])
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, refreshed.collect())
    )


def test_bloom_skipscan_point_lookup_exact_and_skipping(spark, tmp_path):
    """Per-file Bloom pruning: equality lookups on a non-clustered column
    must read a strict subset of files yet return exactly the full
    scan's rows; an absent value prunes every file."""
    from pyspark.sql import functions as F

    from confluent_data_ingestion_spark.operators.skipping import (
        bloom_skip_scan,
        collect_file_blooms,
        prune_files_bloom,
    )

    d = str(tmp_path / "layout")
    ev = spark.range(40_000).selectExpr(
        "id as event_id", "pmod(hash(id), 499) as user_id"
    )
    # laid out by user_id -> event_id scattered across all files
    ev.repartitionByRange(8, "user_id").write.parquet(d)
    blooms = collect_file_blooms(spark, d, "event_id")
    vals = [7, 12_345, 39_999]
    kept, total = prune_files_bloom(
        spark, blooms, vals, value_type="bigint"
    )
    assert total == 8
    assert 1 <= len(kept) < total  # real skipping on a scattered column
    got = sorted(
        r["event_id"]
        for r in bloom_skip_scan(
            spark, d, "event_id", vals, blooms=blooms
        ).collect()
    )
    want = sorted(
        r["event_id"]
        for r in spark.read.parquet(d)
        .filter(F.col("event_id").isin(vals)).collect()
    )
    assert got == want == vals
    # absent value: every file provably excluded
    kept_none, _ = prune_files_bloom(
        spark, blooms, [10**15], value_type="bigint"
    )
    assert kept_none == []


def test_bloom_skipscan_undersized_never_wrong(spark, tmp_path):
    """A saturated (undersized) Bloom degrades to keeping files — the
    answer must stay bit-identical to the full scan, never lose rows."""
    from pyspark.sql import functions as F

    from confluent_data_ingestion_spark.operators.skipping import (
        bloom_skip_scan,
    )

    d = str(tmp_path / "layout")
    spark.range(10_000).selectExpr(
        "id as event_id", "pmod(hash(id), 97) as user_id"
    ).repartitionByRange(4, "user_id").write.parquet(d)
    vals = [5, 9_876]
    got = sorted(
        r["event_id"]
        for r in bloom_skip_scan(
            spark, d, "event_id", vals, num_bits=64, num_hashes=2
        ).collect()
    )
    assert got == vals


def test_bloom_probe_casts_to_indexed_type(spark, tmp_path):
    """xxhash64 is type-sensitive: bloom_skip_scan must cast probe values
    to the indexed column's type (an int probe against an INT column
    hashed as int would otherwise never match a python-long literal)."""
    from confluent_data_ingestion_spark.operators.skipping import (
        bloom_skip_scan,
    )

    d = str(tmp_path / "layout")
    spark.range(1_000).selectExpr(
        "cast(id as int) as event_id", "pmod(hash(id), 7) as user_id"
    ).repartitionByRange(2, "user_id").write.parquet(d)
    got = sorted(
        r["event_id"]
        for r in bloom_skip_scan(spark, d, "event_id", [3, 999]).collect()
    )
    assert got == [3, 999]


def test_refresh_file_blooms_incremental_equals_rebuild(spark, tmp_path):
    """Appending files must cost only the new files' scan and produce
    the same index (and the same pruning decisions) as a full rebuild."""
    from confluent_data_ingestion_spark.operators.skipping import (
        collect_file_blooms,
        prune_files_bloom,
        refresh_file_blooms,
    )

    d = str(tmp_path / "layout")
    spark.range(10_000).selectExpr(
        "id as event_id", "pmod(hash(id), 97) as user_id"
    ).repartitionByRange(4, "user_id").write.parquet(d)
    old = collect_file_blooms(spark, d, "event_id").localCheckpoint()
    # append a new generation of ids
    spark.range(10_000, 12_000).selectExpr(
        "id as event_id", "pmod(hash(id), 97) as user_id"
    ).coalesce(2).write.mode("append").parquet(d)
    refreshed = refresh_file_blooms(spark, d, old, "event_id")
    rebuilt = collect_file_blooms(spark, d, "event_id")
    key = lambda df: sorted(  # noqa: E731
        (r["file"], tuple(sorted(r["bloom"].items()))) for r in df.collect()
    )
    assert key(refreshed) == key(rebuilt)
    # a new-generation id prunes to the appended files only
    kept, total = prune_files_bloom(
        spark, refreshed, [11_500], value_type="bigint"
    )
    assert total == 6
    assert 1 <= len(kept) <= 2


def test_bloom_index_records_build_params_and_rejects_drift(spark, tmp_path):
    """The index frame carries (key_type, num_bits, num_hashes) in its
    bloom column's schema metadata; probing or refreshing with a
    CONTRADICTING parameter raises — never a silent prune-everything."""
    import pytest

    from confluent_data_ingestion_spark.operators.skipping import (
        collect_file_blooms,
        prune_files_bloom,
        refresh_file_blooms,
    )

    d = str(tmp_path / "layout")
    spark.range(2_000).selectExpr(
        "id as event_id", "pmod(hash(id), 7) as user_id"
    ).repartitionByRange(2, "user_id").write.parquet(d)
    blooms = collect_file_blooms(spark, d, "event_id", num_bits=1 << 12)

    # parameterless probe derives everything from the frame
    kept, total = prune_files_bloom(spark, blooms, [42])
    assert total == 2 and len(kept) >= 1

    # metadata survives the refresh path (localCheckpoint + union)
    refreshed = refresh_file_blooms(
        spark, d, blooms.localCheckpoint(), "event_id", num_bits=1 << 12
    )
    kept2, _ = prune_files_bloom(spark, refreshed, [42])
    assert kept2 == kept

    with pytest.raises(ValueError, match="num_bits"):
        prune_files_bloom(spark, blooms, [42], num_bits=1 << 16)
    with pytest.raises(ValueError, match="value_type"):
        prune_files_bloom(spark, blooms, [42], value_type="int")
    with pytest.raises(ValueError, match="num_bits"):
        refresh_file_blooms(spark, d, blooms, "event_id", num_bits=1 << 16)
    with pytest.raises(ValueError, match="type-sensitive"):
        # user_id reads as INT but the index was built over BIGINT event_id
        refresh_file_blooms(spark, d, blooms, "user_id", num_bits=1 << 12)


def test_bloom_prune_without_metadata_requires_all_params(spark, tmp_path):
    """A hand-built blooms frame (no schema metadata) must be probed with
    ALL parameters explicit — guessing any one risks false negatives."""
    import pytest
    from pyspark.sql import functions as F

    from confluent_data_ingestion_spark.operators.skipping import (
        collect_file_blooms,
        prune_files_bloom,
    )

    d = str(tmp_path / "layout")
    spark.range(500).selectExpr(
        "id as event_id", "pmod(hash(id), 3) as user_id"
    ).repartitionByRange(2, "user_id").write.parquet(d)
    built = collect_file_blooms(spark, d, "event_id")
    # strip the metadata by rebuilding the column without it
    bare = built.withColumn("bloom", F.map_from_entries(F.map_entries("bloom")))
    with pytest.raises(ValueError, match="metadata"):
        prune_files_bloom(spark, bare, [7])
    kept, _ = prune_files_bloom(
        spark, bare, [7],
        num_bits=1 << 16, num_hashes=4, value_type="bigint",
    )
    assert kept  # explicit matching params still prune correctly


def test_merge_bloom_indexes_validates_generations(spark, tmp_path):
    """Merging index generations must prove they share build parameters
    — a plain union silently carries the first frame's metadata and
    would misprune the other generation's files."""
    import pytest
    from pyspark.sql import functions as F

    from confluent_data_ingestion_spark.operators.skipping import (
        collect_file_blooms,
        merge_bloom_indexes,
        prune_files_bloom,
    )

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    spark.range(1_000).selectExpr(
        "id as event_id", "pmod(hash(id), 3) as user_id"
    ).repartitionByRange(2, "user_id").write.parquet(d1)
    spark.range(1_000, 2_000).selectExpr(
        "id as event_id", "pmod(hash(id), 3) as user_id"
    ).repartitionByRange(2, "user_id").write.parquet(d2)

    a = collect_file_blooms(spark, d1, "event_id")
    b = collect_file_blooms(spark, d2, "event_id")
    merged = merge_bloom_indexes(a, b)
    kept, total = prune_files_bloom(spark, merged, [42, 1_500])
    assert total == 4 and len(kept) >= 2  # hits prune into BOTH generations

    with pytest.raises(ValueError, match="mismatched"):
        merge_bloom_indexes(
            a, collect_file_blooms(spark, d2, "event_id", num_bits=1 << 12)
        )
    bare = a.withColumn("bloom", F.map_from_entries(F.map_entries("bloom")))
    with pytest.raises(ValueError, match="metadata"):
        merge_bloom_indexes(a, bare)
