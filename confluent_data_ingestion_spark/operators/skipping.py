"""File-level min/max data-skipping: a stats index over a parquet layout
plus a scan planner that prunes files a range predicate cannot touch.

This is the READ path that the Z-order layout (`bucketing.zorder_by`)
exists to serve, and the same mechanism Delta/Iceberg ship as per-file
column statistics: at 100 TB a table is tens of thousands of files, and
a selective range query should open only the files whose [min, max]
envelope intersects the predicate — everything else is skipped at
PLANNING time, before any row is read.  Spark's parquet reader already
skips row groups via footer stats, but it still lists, opens, and
footer-reads every file; the file-level index removes even that, and is
the piece that makes Z-order clustering pay off (after `zorder_by`,
every file covers a small hyper-rectangle, so the envelopes are tight
on all clustered columns at once).

The index is one row per file (metadata-scale: thousands of rows for a
100 TB table) built with a single aggregation over `_metadata.file_path`
— persist it next to the table and rebuild incrementally on append.
Pruning is ONE-SIDED, like the sketches in `operators/sketch.py`: a file
is dropped only when its stats PROVE no row can match (NULL stats keep
the file), and the exact predicate still runs over the survivors, so the
result is bit-identical to the full scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# predicate: col -> (lo, hi), either bound None for open-ended; both
# bounds inclusive, mirroring SQL BETWEEN.
Ranges = dict[str, tuple[float | None, float | None]]


def collect_file_stats(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """One row per parquet file under ``path``: row count plus min/max of
    each stats column.  A single hash aggregation keyed on the hidden
    ``_metadata.file_path`` column — output cardinality is the file
    count, so the shuffle is metadata-sized no matter how big the table.
    """
    df = spark.read.parquet(path).select(
        F.col("_metadata.file_path").alias("file"), *cols
    )
    aggs: list = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy("file").agg(*aggs)


def refresh_file_stats(
    spark: SparkSession, path: str, old_stats: DataFrame, cols: list[str]
) -> DataFrame:
    """Incrementally maintain a persisted stats index after appends: only
    files NOT already present in ``old_stats`` are scanned (steady-state
    cost proportional to the new data, the same contract as the rollup
    store), removed files' rows are dropped, and the result is the same
    frame :func:`collect_file_stats` would build from scratch."""
    current = {p for p, _ in list_files(spark, path)}
    known = {r["file"] for r in old_stats.select("file").collect()}
    fresh = sorted(current - known)
    # semi-join against a tiny file-list frame, not a 100k-literal IN list
    cur_df = spark.createDataFrame([(p,) for p in sorted(current)] or [("",)], "file STRING")
    kept = old_stats.join(F.broadcast(cur_df), "file", "left_semi")
    if not fresh:
        return kept
    df = spark.read.parquet(*fresh).select(
        F.col("_metadata.file_path").alias("file"), *cols
    )
    aggs: list = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return kept.unionByName(df.groupBy("file").agg(*aggs))


def prune_files(stats: DataFrame, ranges: Ranges) -> tuple[list[str], int]:
    """Files whose stats envelopes intersect every range in ``ranges``,
    plus the total file count (for skip-ratio reporting).

    A file is eliminated only when provably disjoint: ``max < lo`` or
    ``min > hi`` with non-NULL stats.  NULL stats (all-NULL column in
    that file, or a column the index was not built over) keep the file —
    pruning must never manufacture a false negative.  The collect is
    metadata-sized (one row per file).
    """
    keep = F.lit(True)
    for c, (lo, hi) in ranges.items():
        mn, mx = F.col(f"min_{c}"), F.col(f"max_{c}")
        if lo is not None:
            keep = keep & (mx.isNull() | (mx >= F.lit(lo)))
        if hi is not None:
            keep = keep & (mn.isNull() | (mn <= F.lit(hi)))
    total = stats.count()
    kept = [r["file"] for r in stats.filter(keep).select("file").collect()]
    return kept, total


def skip_scan(
    spark: SparkSession,
    path: str,
    ranges: Ranges,
    stats: DataFrame | None = None,
    stats_cols: list[str] | None = None,
) -> DataFrame:
    """Exact range scan over a parquet layout, reading only files the
    stats index cannot rule out.  ``stats`` is a previously persisted
    :func:`collect_file_stats` frame; omit it to build one on the fly
    (one extra metadata-sized aggregation — fine interactively, but a
    steady-state pipeline should persist the index).  The exact
    predicate is re-applied over the surviving files, so the result is
    bit-identical to ``spark.read.parquet(path).filter(...)``.
    """
    if stats is None:
        stats = collect_file_stats(
            spark, path, stats_cols or list(ranges.keys())
        )
    kept, _total = prune_files(stats, ranges)

    def exact(df: DataFrame) -> DataFrame:
        out = df
        for c, (lo, hi) in ranges.items():
            if lo is not None:
                out = out.filter(F.col(c) >= F.lit(lo))
            if hi is not None:
                out = out.filter(F.col(c) <= F.lit(hi))
        return out

    if not kept:
        schema = spark.read.parquet(path).schema
        return spark.createDataFrame([], schema)
    return exact(spark.read.parquet(*kept))


def _bloom_meta(blooms: DataFrame) -> dict | None:
    """The build parameters a :func:`collect_file_blooms` frame carries in
    its ``bloom`` column's schema metadata (driver-side, no action), or
    ``None`` for a hand-built frame that predates/omits them."""
    meta = blooms.schema["bloom"].metadata or {}
    if "key_type" not in meta:
        return None
    return {
        "key_type": meta["key_type"],
        "num_bits": int(meta["num_bits"]),
        "num_hashes": int(meta["num_hashes"]),
    }


def _stamp_bloom_meta(
    blooms: DataFrame, key_type: str, num_bits: int, num_hashes: int
) -> DataFrame:
    """Record the build parameters in the ``bloom`` column's metadata.

    xxhash64 is TYPE-sensitive and probe positions depend on
    (num_bits, num_hashes), so an index probed with drifted parameters
    silently rules out every file — false negatives that lose rows.
    Embedding the parameters in the frame itself (schema metadata:
    zero rows, zero actions, survives localCheckpoint/union/join) lets
    :func:`prune_files_bloom` and :func:`refresh_file_blooms` derive
    them and RAISE on an explicit mismatch instead of mispruning."""
    return blooms.withColumn(
        "bloom",
        F.col("bloom").alias("bloom", metadata={
            "key_type": key_type,
            "num_bits": num_bits,
            "num_hashes": num_hashes,
        }),
    )


def _file_blooms_from(
    df: DataFrame, num_bits: int, num_hashes: int
) -> DataFrame:
    """(file, bloom) sparse word-map bitsets from a (file, __k) frame —
    the shared aggregation behind build and incremental refresh.  The
    indexed column's type and the (num_bits, num_hashes) build
    parameters ride along as ``bloom``-column schema metadata."""
    from .sketch import _bit_positions

    key_type = df.schema["__k"].dataType.simpleString()
    key = F.col("__k")
    pos = df.filter(key.isNotNull()).select(
        "file",
        F.explode(F.array(*[
            _bit_positions(key, s, num_bits) for s in range(num_hashes)
        ])).alias("p"),
    )
    words = (
        pos.select(
            "file",
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))"
            ).alias("m"),
        )
        .groupBy("file", "w")
        .agg(F.bit_or("m").alias("bits"))
    )
    return _stamp_bloom_meta(
        words.groupBy("file").agg(
            F.map_from_entries(
                F.collect_list(F.struct("w", "bits"))
            ).alias("bloom")
        ),
        key_type, num_bits, num_hashes,
    )


def collect_file_blooms(
    spark: SparkSession,
    path: str,
    col: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 4,
) -> DataFrame:
    """One Bloom bitset PER FILE over ``col`` — the point-lookup
    complement of :func:`collect_file_stats`.

    Min/max envelopes prune RANGE predicates on the layout's clustered
    columns, but an equality lookup on a column the sort order does not
    cluster (a scattered id, a hash key) sees every file's envelope span
    the whole domain — zero skips.  A per-file Bloom answers "could this
    file contain value v" regardless of clustering: Delta calls these
    bloom filter indexes, Iceberg/Parquet carry them as optional column
    bloom metadata; here the index is an ordinary DataFrame persisted
    next to the table, like the stats index.

    Build cost: ONE aggregation over ``_metadata.file_path`` — each row
    contributes ``num_hashes`` (word, bit) pairs, partial-aggregated
    map-side, so the shuffle carries at most files x ``num_bits/64``
    rows.  Output: (file, bloom) with ``bloom`` a SPARSE map<word_idx,
    or-of-bits> — unset words are absent, so tiny files cost bytes, not
    ``num_bits``.  Hashing is ``xxhash64(col, seed)`` (JVM-side,
    deterministic); :func:`prune_files_bloom` re-derives probe positions
    with the SAME expression, so index and probe can never drift.

    Sizing: false-positive rate ~ (1 - e^(-k*n/m))^k with n = distinct
    values per file — keep ``num_bits`` >= ~10x n for ~1% (the classic
    10-bits-per-key rule; parquet's own optional column blooms budget
    the same way).  At 100 TB that makes the index ~1-2% of the indexed
    column's footprint — far below re-reading skipped files, and an
    undersized bloom degrades to "keep everything", never to a wrong
    answer.
    """
    return _file_blooms_from(
        spark.read.parquet(path).select(
            F.col("_metadata.file_path").alias("file"),
            F.col(col).alias("__k"),
        ),
        num_bits, num_hashes,
    )


def refresh_file_blooms(
    spark: SparkSession,
    path: str,
    old_blooms: DataFrame,
    col: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 4,
) -> DataFrame:
    """Incrementally maintain a persisted Bloom index after appends —
    the same contract as :func:`refresh_file_stats`: only files absent
    from ``old_blooms`` are scanned (steady-state cost proportional to
    the new data; a file's bitset never changes because files are
    immutable), removed files drop, and the result equals
    :func:`collect_file_blooms` from scratch.  ``num_bits``/
    ``num_hashes`` must match the original build — probe positions are
    parameter-dependent, so a mixed-parameter index would corrupt
    pruning; the original build's parameters ride in ``old_blooms``'s
    schema metadata and a mismatch (parameters OR the indexed column's
    type) raises instead of silently mixing generations."""
    meta = _bloom_meta(old_blooms)
    if meta is not None:
        if (num_bits, num_hashes) != (meta["num_bits"], meta["num_hashes"]):
            raise ValueError(
                "refresh_file_blooms: index was built with "
                f"num_bits={meta['num_bits']}, num_hashes={meta['num_hashes']}"
                f" but refresh was asked for num_bits={num_bits}, "
                f"num_hashes={num_hashes} — a mixed-parameter index would "
                "misprune; rebuild with collect_file_blooms instead"
            )
        cur_type = (
            spark.read.parquet(path).schema[col].dataType.simpleString()
        )
        if cur_type != meta["key_type"]:
            raise ValueError(
                f"refresh_file_blooms: index was built over a "
                f"{meta['key_type']} column but {col!r} now reads as "
                f"{cur_type} — xxhash64 is type-sensitive, the bitsets "
                "are incompatible; rebuild with collect_file_blooms"
            )
    current = {p for p, _ in list_files(spark, path)}
    known = {r["file"] for r in old_blooms.select("file").collect()}
    fresh = sorted(current - known)
    cur_df = spark.createDataFrame(
        [(p,) for p in sorted(current)] or [("",)], "file STRING"
    )
    kept = old_blooms.join(F.broadcast(cur_df), "file", "left_semi")
    if not fresh:
        return kept
    fresh_blooms = _file_blooms_from(
        spark.read.parquet(*fresh).select(
            F.col("_metadata.file_path").alias("file"),
            F.col(col).alias("__k"),
        ),
        num_bits, num_hashes,
    )
    return kept.unionByName(fresh_blooms)


def prune_files_bloom(
    spark: SparkSession,
    blooms: DataFrame,
    values: list,
    num_bits: int | None = None,
    num_hashes: int | None = None,
    value_type: str | None = None,
) -> tuple[list[str], int]:
    """Files that MAY contain at least one of ``values``, plus the total
    file count.  One-sided like every pruner here: a file survives when
    every probe bit of SOME value is set (false positives keep a file —
    the exact predicate still runs; false negatives are impossible).

    Probe positions come from a values-sized Spark expression using the
    same ``xxhash64`` as the build (never re-implemented driver-side);
    ``value_type`` casts the probe values to the indexed column's type
    first — xxhash64 is TYPE-sensitive, so probing a bigint index with
    an int would silently miss everything.  All three parameters
    therefore default to the values recorded in ``blooms``'s schema
    metadata at build time (see :func:`_stamp_bloom_meta`); passing a
    value that CONTRADICTS the recorded one raises — parameter drift
    must be an error, never a silent prune-everything.  A hand-built
    frame with no metadata requires all three explicitly.  The pruning
    join is values x files on the metadata-sized index — both frames
    are tiny, the work is planning-time.
    """
    meta = _bloom_meta(blooms)
    if meta is not None:
        for name, given, built in (
            ("num_bits", num_bits, meta["num_bits"]),
            ("num_hashes", num_hashes, meta["num_hashes"]),
            ("value_type", value_type, meta["key_type"]),
        ):
            if given is not None and given != built:
                raise ValueError(
                    f"prune_files_bloom: index was built with {name}="
                    f"{built!r} but probe was asked for {given!r} — "
                    "mismatched probes would silently rule out every "
                    "file (false negatives); drop the argument to use "
                    "the recorded value or rebuild the index"
                )
        num_bits = meta["num_bits"]
        num_hashes = meta["num_hashes"]
        value_type = meta["key_type"]
    elif num_bits is None or num_hashes is None or value_type is None:
        raise ValueError(
            "prune_files_bloom: blooms frame carries no build metadata "
            "(not built by collect_file_blooms?) — num_bits, num_hashes "
            "AND value_type must all be passed explicitly; guessing any "
            "of them risks silent false negatives"
        )
    if not values:
        return [], blooms.count()
    positions = ",".join(
        f"pmod(xxhash64(__v, {s}), {num_bits})" for s in range(num_hashes)
    )
    probe = (
        spark.createDataFrame([(v,) for v in values], ["__v0"])
        .selectExpr(
            f"cast(__v0 as {value_type}) as __v" if value_type else
            "__v0 as __v"
        )
        .selectExpr(
            f"""transform(array({positions}),
                p -> struct(cast(p div 64 as int) as w,
                            shiftleft(cast(1 as bigint),
                                      cast(p % 64 as int)) as m)) as pm"""
        )
    )
    hit = (
        blooms.crossJoin(F.broadcast(probe))  # files x values: metadata-sized
        .selectExpr(
            "file",
            # absent word => no bits ever set there => definitely-absent
            "aggregate(pm, true, (acc, x) -> "
            "acc AND (coalesce(bloom[x.w], 0L) & x.m) = x.m) as maybe",
        )
    )
    # ONE action: kept and total both fall out of the per-(file, value)
    # verdict rows (files x values — metadata-sized).  A second action
    # would recompute an unpersisted index's whole build aggregation.
    rows = hit.collect()
    total = len({r["file"] for r in rows})
    kept = sorted({r["file"] for r in rows if r["maybe"]})
    return kept, total


def merge_bloom_indexes(*indexes: DataFrame) -> DataFrame:
    """Union per-file Bloom index frames (e.g. the base table's
    maintained index + a freshly-indexed append/compacted generation)
    into one probe-able index, validating that EVERY frame was built
    with the same parameters first.  A plain union silently carries the
    FIRST frame's schema metadata, so a mixed-parameter merge would
    evaluate every probe with one generation's (key_type, num_bits,
    num_hashes) and misprune the other's files — the false-negative
    drift class this module turns into errors.  Frames without build
    metadata are rejected outright (rebuild via collect_file_blooms)."""
    if not indexes:
        raise ValueError("merge_bloom_indexes: no frames given")
    metas = [_bloom_meta(f) for f in indexes]
    if any(m is None for m in metas):
        raise ValueError(
            "merge_bloom_indexes: a frame carries no build metadata "
            "(not built by collect_file_blooms?) — cannot prove the "
            "generations share parameters; rebuild it"
        )
    if len({tuple(sorted(m.items())) for m in metas}) > 1:
        raise ValueError(
            f"merge_bloom_indexes: mismatched build parameters {metas} — "
            "a merged index must share (key_type, num_bits, num_hashes); "
            "rebuild the divergent generation"
        )
    out = indexes[0]
    for f in indexes[1:]:
        out = out.unionByName(f)
    return out


def bloom_skip_scan(
    spark: SparkSession,
    path: str,
    col: str,
    values: list,
    blooms: DataFrame | None = None,
    num_bits: int = 1 << 16,
    num_hashes: int = 4,
) -> DataFrame:
    """Exact point-lookup scan: read only files whose Bloom cannot rule
    out every lookup value, then apply the exact IN predicate — result
    bit-identical to ``spark.read.parquet(path).filter(col IN values)``.
    ``blooms`` is a persisted :func:`collect_file_blooms` frame; omit to
    build one on the fly (a steady-state pipeline persists the index and
    refreshes it per append, exactly like the stats index)."""
    if blooms is None:
        blooms = collect_file_blooms(
            spark, path, col, num_bits=num_bits, num_hashes=num_hashes
        )
    # parameters + indexed type come from the index frame's own build
    # metadata — passing them again here could only drift from the build
    kept, _total = prune_files_bloom(spark, blooms, values)
    if not kept:
        schema = spark.read.parquet(path).schema
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*kept).filter(F.col(col).isin(values))


def zorder_append(
    spark: SparkSession,
    batch: DataFrame,
    cols: list[str],
    out_dir: str,
    old_stats: DataFrame,
    *,
    bits: int = 12,
    n_files: int = 4,
) -> DataFrame:
    """Partition-incremental Z-order maintenance: cluster ONLY the new
    batch and extend the stats index — the steady-state companion to the
    full-table clustering rewrite.  At 100 TB nobody re-runs OPTIMIZE
    over the whole table per append; they Z-order the arriving slice,
    land it as new files, and merge its file stats into the index (the
    Delta/Iceberg shape: the log references files wherever they live, so
    base files are NEVER copied or rewritten).

    The batch is quantized against ITS OWN min/max bounds — per-file
    envelopes only need to be tight within the new files, and skipping
    stays exactly as correct because pruning consults each file's real
    [min, max], not the quantization grid.  Batch files cluster slightly
    wider than a global re-sort would make them; a periodic full
    ``zorder_by`` rewrite (the OPTIMIZE row) re-tightens.

    Cost: one range shuffle of the BATCH plus a metadata-sized stats
    aggregation over the new files — independent of base-table size.

    Returns the merged stats index (old rows verbatim + one row per new
    file), usable directly by :func:`prune_files` / :func:`skip_scan`
    across both generations' files.  The merged frame is checkpointed —
    it is file-count-sized, and a lazy union would re-aggregate the new
    files' stats on every planning action that consults the index.

    Each call lands its files in a UNIQUE ``batch-*`` subdirectory of
    ``out_dir`` — never an overwrite of ``out_dir`` itself.  An overwrite
    would delete files a previously merged index still references (the
    natural misuse of an append API: reusing one out_dir per table), and
    a later :func:`skip_scan` through that index would fail on missing
    paths.  The index addresses files by absolute path wherever they
    live (the Delta/Iceberg log shape), so the subdirectory is invisible
    to readers; superseded batch directories are the caller's to sweep,
    exactly like unreferenced files under a table log.
    """
    import os
    import uuid

    from .bucketing import zorder_by

    batch_dir = os.path.join(out_dir, f"batch-{uuid.uuid4().hex[:8]}")
    (
        zorder_by(batch, cols, bits=bits)
        .repartitionByRange(n_files, F.col("zorder_key"))
        .sortWithinPartitions("zorder_key")
        .drop("zorder_key")
        .write.mode("error")
        .parquet(batch_dir)
    )
    return old_stats.unionByName(
        collect_file_stats(spark, batch_dir, cols)
    ).localCheckpoint()


def list_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every parquet file under ``path`` — a pure
    filesystem-metadata listing through the Hadoop FS API (no file is
    opened, no Spark job runs), so it works identically on local disk,
    HDFS, or an object store."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.endswith(".parquet"):
            out.append((f.getPath().toString(), int(f.getLen())))
    return sorted(out)


def compaction_plan(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
    small_factor: float = 0.5,
) -> list[list[str]]:
    """Group undersized parquet files into ~``target_bytes`` rewrite bins
    (first-fit-decreasing).  Small files are the silent tax of streaming
    ingest at 100 TB: every append becomes a file, and a year later the
    scan pays per-file open/footer costs millions of times.  The planner
    is metadata-only; only files smaller than ``small_factor *
    target_bytes`` are candidates (right-sized files are never
    rewritten), and no bin exceeds the target unless it is a single
    file.  Bins never span directories: files in different partition
    directories (e.g. Hive-style ``__seq=N/``) compact separately, so a
    rewritten file stays inside its partition and keeps the
    directory-derived partition value — the same per-partition shape as
    Delta OPTIMIZE.  Execute with :func:`apply_compaction`.
    """
    by_dir: dict[str, list[tuple[str, int]]] = {}
    for p, b in list_files(spark, path):
        if b < small_factor * target_bytes:
            by_dir.setdefault(p.rsplit("/", 1)[0], []).append((p, b))
    out: list[list[str]] = []
    for _, files in sorted(by_dir.items()):
        bins: list[tuple[int, list[str]]] = []
        for p, b in sorted(files, key=lambda x: -x[1]):
            for i, (used, members) in enumerate(bins):
                if used + b <= target_bytes:
                    bins[i] = (used + b, members + [p])
                    break
            else:
                bins.append((b, [p]))
        # singleton bins are no-ops: rewriting one small file buys nothing
        out.extend(members for _, members in bins if len(members) > 1)
    return out


def apply_compaction(
    spark: SparkSession, path: str, plan: list[list[str]], out_dir: str
) -> None:
    """Materialize the compacted layout of ``path`` under ``out_dir``:
    each planned bin rewritten as one file, PLUS a copy of every
    right-sized file the plan left alone — ``out_dir`` is a complete,
    substitutable replacement for the source directory, never a partial
    one.  One job per planned bin — a trivial narrow read→write of a
    few small files — and the bins run CONCURRENTLY from a thread pool
    (exactly Delta OPTIMIZE's shape): each bin writes into its own
    scratch directory and its single output file renames into place, so
    concurrent bins never share a Spark commit protocol directory.

    The relative subpath of every file under ``path`` is preserved, so a
    Hive-partitioned source (``__seq=N/part.parquet``) keeps its layout
    and directory-derived partition values (:func:`compaction_plan`
    guarantees each bin stays within one directory).  The SOURCE may be
    any Hadoop filesystem scheme (carry-over copies go through the
    Hadoop FS API); ``out_dir`` must be on the LOCAL filesystem — the
    final commit is one atomic ``os.rename``.

    Crash safety: everything stages into a temp sibling of ``out_dir``
    and lands with ONE ``os.replace``-style rename at the end — a crash
    mid-plan leaves only a ``<out_dir>.staging-*`` directory to sweep,
    never a half-written ``out_dir``.  Refuses to clobber an existing
    ``out_dir`` (the caller decides when to swap the live table, as in
    ``UpsertSnapshot.compact``)."""
    import os
    import shutil
    import uuid
    from urllib.parse import urlparse

    if os.path.exists(out_dir):
        raise FileExistsError(
            f"{out_dir} already exists; apply_compaction writes a complete "
            "new layout and will not merge into or overwrite a live one"
        )

    root = urlparse(path).path or path

    def _rel_dir(file_uri: str) -> str:
        p = urlparse(file_uri).path or file_uri
        rel = os.path.relpath(os.path.dirname(p), root)
        if rel.startswith(".."):
            raise ValueError(f"{file_uri} is not under {path}")
        return "" if rel == "." else rel

    staging = f"{out_dir.rstrip('/')}.staging-{uuid.uuid4().hex[:8]}"
    os.makedirs(staging, exist_ok=True)  # plan may be empty
    try:
        planned = {p for members in plan for p in members}

        def _rewrite_bin(i: int, members: list[str]) -> None:
            rels = {_rel_dir(m) for m in members}
            if len(rels) > 1:  # bins must not cross partition directories
                raise ValueError(
                    f"compaction bin spans directories {sorted(rels)}; "
                    "plan bins within one directory (compaction_plan does)"
                )
            # private scratch dir per bin: concurrent Spark writes must
            # never share one output path's _temporary commit directory
            tmp = os.path.join(staging, f"__bin-{i}")
            spark.read.parquet(*members).coalesce(1).write.mode(
                "error"
            ).parquet(tmp)
            part = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
            if len(part) != 1:
                # coalesce(1) must emit exactly one data file; zero (a
                # writer-naming change, or a bin of all-empty files) or
                # several would silently drop or duplicate the bin's rows
                # during the rename — fail naming the bin's members
                raise RuntimeError(
                    f"compaction bin {i} produced {len(part)} part files "
                    f"(expected 1) rewriting {sorted(members)}; refusing "
                    "to rename an ambiguous output"
                )
            dst_dir = os.path.join(staging, rels.pop())
            os.makedirs(dst_dir, exist_ok=True)
            os.rename(
                os.path.join(tmp, part[0]),
                os.path.join(dst_dir, f"bin-{i:05d}.parquet"),
            )
            shutil.rmtree(tmp)

        if plan:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(16, len(plan))
            ) as ex:
                futs = [
                    ex.submit(_rewrite_bin, i, members)
                    for i, members in enumerate(plan)
                ]
                for f in futs:
                    f.result()  # re-raise the first bin failure
        # right-sized files carry over verbatim — byte copies through the
        # Hadoop FS API (any source scheme), no decode/encode, relative
        # subpath preserved, so out_dir holds the WHOLE table
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        hpath = jvm.org.apache.hadoop.fs.Path
        for src, _ in list_files(spark, path):
            if src in planned:
                continue
            dst_dir = os.path.join(staging, _rel_dir(src))
            os.makedirs(dst_dir, exist_ok=True)
            sp = hpath(src)
            dp = hpath(os.path.join(dst_dir, sp.getName()))
            jvm.org.apache.hadoop.fs.FileUtil.copy(
                sp.getFileSystem(conf), sp, dp.getFileSystem(conf), dp,
                False, conf,
            )
        os.rename(staging, out_dir)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
