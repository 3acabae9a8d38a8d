"""Bucketed-table materialization: pre-shuffle a fact table ONCE so every
downstream equi-join / aggregation on the bucket key is shuffle-free.

This is the Spark-native answer to the reference's keyed-materialization
pattern (XREF tables keyed by PK, ``resources/sql/xref-queries.sql:13``):
a table that will be joined on its key every day should be LAID OUT on
that key.  ``spark.table`` scans of two tables bucketed into the same
bucket count on the same key sort-merge-join with ZERO Exchange — at
100 TB that deletes the dominant cost of every downstream pipeline run,
paid once at write time.

Notes:
 - bucket pruning: equality filters on the bucket column scan 1/N of the
   files (Spark's FileSourceStrategy prunes buckets).
 - ``sort_cols`` pre-sorts within buckets, upgrading the join's sort to
   a no-op and making min/max row-group stats tight for range filters.
 - bucketed writes must go through the session catalog (``saveAsTable``)
   — plain ``.parquet(path)`` writes carry no bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    *,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed (optionally bucket-sorted) parquet
    table in the session catalog.  ``num_buckets`` should divide evenly
    into the cluster's parallelism and keep each bucket's per-task data
    within executor memory at the target scale (buckets = files per
    partition directory, NOT partitions: high-cardinality keys stay in
    bounded file counts, unlike ``partitionBy``)."""
    w = df.write.format("parquet").mode(mode).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str | tuple[str, str]],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key(s) —
    ``on`` entries are shared column names or (left_col, right_col)
    pairs.  The plan this produces over correctly co-bucketed inputs
    contains NO Exchange (asserted structurally in
    tests/test_bucketing.py) — the join runs entirely within co-located
    bucket pairs."""
    lt, rt = spark.table(left_table), spark.table(right_table)
    cond = None
    for entry in on:
        lc, rc = (entry, entry) if isinstance(entry, str) else entry
        piece = lt[lc] == rt[rc]
        cond = piece if cond is None else (cond & piece)
    return lt.join(rt, cond, how)


def morton_code(
    cols: list[str],
    mins: list[str],
    maxs: list[str],
    bits: int = 16,
) -> str:
    """SQL expression interleaving ``bits`` quantized bits of each column
    into one Z-order (Morton) key.  ``mins``/``maxs`` name broadcast
    min/max columns used to scale each value into [0, 2^bits).  Pure
    integer bit ops — bit-identical in any engine with shifts."""
    n = len(cols)
    quant = [
        # constant columns (hi == lo) quantize to 0, not NULL
        f"CAST(least({(1 << bits) - 1}, floor(coalesce("
        f"(CAST({c} AS DOUBLE) - {lo}) / nullif({hi} - {lo}, 0), 0)"
        f" * {1 << bits})) AS BIGINT)"
        for c, lo, hi in zip(cols, mins, maxs)
    ]
    parts = []
    for b in range(bits):
        for i, q in enumerate(quant):
            # bit b of column i lands at interleaved position b*n + i
            parts.append(
                f"(shiftleft((shiftright({q}, {b}) & 1), {b * n + i}))"
            )
    return "(" + " + ".join(parts) + ")"


def zorder_by(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 16,
    out_col: str = "zorder_key",
) -> DataFrame:
    """Attach a Z-order key over ``cols``: each column min-max-quantized
    to ``bits`` bits (bounds from ONE broadcast aggregate row), bits
    interleaved.  Sorting/range-partitioning files by this key makes the
    per-file min/max statistics tight on EVERY participating column at
    once — the multi-dimensional data-skipping layout (Delta/Iceberg's
    OPTIMIZE ZORDER) a single-column sort cannot give: linear sort makes
    one column's ranges tight and leaves the others spanning the domain.

    Write path: ``df.repartitionByRange(n, F.col(out_col))
    .sortWithinPartitions(out_col).write...`` — the range exchange is the
    one shuffle, and every parquet file then covers a small hyper-rectangle
    of the key space (quantified by tests/test_bucketing.py's range-
    product comparison vs a linear sort).
    """
    from pyspark.sql import functions as F

    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"__lo{i}__"),
            F.max(F.col(c).cast("double")).alias(f"__hi{i}__"),
        ]
    bounds = df.agg(*aggs)
    expr = morton_code(
        cols,
        [f"__lo{i}__" for i in range(len(cols))],
        [f"__hi{i}__" for i in range(len(cols))],
        bits,
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out_col, F.expr(expr))
        .drop(*[f"__lo{i}__" for i in range(len(cols))],
              *[f"__hi{i}__" for i in range(len(cols))])
    )
