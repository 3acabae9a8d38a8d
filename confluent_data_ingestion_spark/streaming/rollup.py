"""Incrementally-maintained aggregate materialization (a rollup /
materialized-view store for foreachBatch).

The 100 TB failure mode this removes: a dashboard aggregate recomputed
from raw data scans the whole table every refresh.  Every aggregate this
store supports decomposes into MERGEABLE per-group partials —

 - count            -> summable
 - sum              -> summable (accumulated in DECIMAL for exactness)
 - min / max        -> idempotent re-min / re-max
 - distinct         -> DataSketches HLL sketch, unioned
                       (``operators/sketch.hll_merge_estimate`` contract)
 - quantiles        -> fixed-boundary histogram (bin-count array),
                       merged by elementwise sum; finalized by linear
                       interpolation inside the target bin — the
                       equi-width cousin of a t-digest/KLL rollup, with
                       DETERMINISTIC bin math any SQL engine reproduces
 - value sample     -> KMV bottom-k: the k distinct values with the
                       smallest salted md5, merged by union+sort+trim —
                       a deterministic uniform sample of each group's
                       distinct values (the "show me examples" panel),
                       reproducible by any engine with md5

so ``apply(batch)`` aggregates ONLY the new batch (cost O(batch)), merges
the batch partials with the stored per-group state (cost O(state groups +
batch groups), no raw-history rescan ever), writes the merged state to a
new versioned directory and commits with ONE atomic pointer write.

Crash protocol — stricter than ``UpsertSnapshot``/``Scd2Store``'s
marker-after-write, because additive count/sum partials are NOT
replay-idempotent (a latest-by-key store tolerates double-apply; a sum
does not).  The committing batch_id is recorded INSIDE the pointer file,
in the same single ``os.replace`` that flips the state pointer, so "new
state live" and "batch committed" become one indivisible fact:

 - crash before the flip  -> old pointer live, batch not committed,
   replay redoes the fold against the OLD state (new dir is an orphan,
   swept on the next apply);
 - crash after the flip   -> new state live AND ``committed(batch_id)``
   is already True via the pointer record, so the foreachBatch replay is
   a no-op — the batch can never be double-counted;
 - the old state directory is only removed after the commit record is
   durable (fsync + rename).

``snapshot()`` finalizes: counts/sums/mins/maxs read straight from
state, HLL sketches collapse through ``hll_sketch_estimate``.
Differential tests pin ``snapshot()`` == one-shot aggregation of the
full concatenated input at every quiescence point.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class RollupStore:
    def __init__(
        self,
        path: str,
        group_cols: list[str],
        *,
        sum_cols: list[str] | None = None,
        min_cols: list[str] | None = None,
        max_cols: list[str] | None = None,
        distinct_cols: list[str] | None = None,
        hist_cols: dict[str, tuple[float, float, int]] | None = None,
        quantiles: list[float] | None = None,
        sample_cols: dict[str, int] | None = None,
        lgk: int = 12,
    ) -> None:
        """``hist_cols`` maps a numeric column to its fixed histogram
        bounds ``(lo, hi, nbins)``; state per group is an
        ``nbins + 2``-slot count array (slot 0 = underflow ``v < lo``,
        slot ``nbins+1`` = overflow ``v >= hi``), merged by elementwise
        sum.  ``quantiles`` lists the fractions ``snapshot()`` finalizes
        for every hist col (default ``[0.5]``): rank ``q*n`` located by
        a cumulative fold, value interpolated linearly inside the bin
        (underflow answers ``lo``, overflow ``hi`` — the bounds are the
        histogram's representable range).  Keep ``nbins`` modest
        (<= 128): state per group is ``nbins + 2`` longs and the partial
        aggregation plans one conditional-sum per slot.

        ``sample_cols`` maps a column to ``k``: the store maintains the
        group's k DISTINCT values with the smallest salted md5 (a KMV
        bottom-k sketch — a deterministic uniform sample of distinct
        values), merged by union+sort+trim.  The per-batch partial
        window-ranks the group's distinct values and keeps only the k
        survivors before any aggregation buffer is built, so a hot group
        costs a spill-safe sort, never an unbounded in-memory list."""
        self.path = path
        self.group_cols = group_cols
        self.sum_cols = sum_cols or []
        self.min_cols = min_cols or []
        self.max_cols = max_cols or []
        self.distinct_cols = distinct_cols or []
        self.hist_cols = dict(hist_cols or {})
        self.quantiles = list(quantiles or [0.5])
        self.sample_cols = dict(sample_cols or {})
        for c, (lo, hi, nb) in self.hist_cols.items():
            if not (hi > lo and 1 <= nb <= 1024):
                raise ValueError(
                    f"hist_cols[{c!r}]: need hi > lo and 1 <= nbins <= 1024"
                )
        if not all(0.0 < q <= 1.0 for q in self.quantiles):
            raise ValueError("quantiles must be in (0, 1]")
        for c, k in self.sample_cols.items():
            if not 1 <= int(k) <= 4096:
                raise ValueError(f"sample_cols[{c!r}]: k must be in [1, 4096]")
        self.lgk = lgk
        os.makedirs(os.path.join(path, "_markers"), exist_ok=True)

    # -- transaction markers ------------------------------------------------
    # The marker dir keeps the full history of committed batch ids; the
    # LATEST commit is additionally recorded inside the pointer file itself,
    # atomically with the state flip (see module docstring for why the
    # UpsertSnapshot marker-after-write protocol is not sound here).
    def _marker(self, batch_id) -> str:
        return os.path.join(self.path, "_markers", f"batch-{batch_id}")

    def committed(self, batch_id) -> bool:
        if os.path.exists(self._marker(batch_id)):
            return True
        _, last = self._read_pointer()
        return last is not None and last == str(batch_id)

    # -- partial-aggregate schema -------------------------------------------
    def _bin_expr(self, c: str) -> str:
        """Slot index of one row's value: 0 = underflow, nbins+1 = overflow,
        1..nbins = equi-width interior (clamped so float round-off at the
        upper boundary can't spill past the last interior slot).  Pure
        double arithmetic — any engine reproduces the slots bit-for-bit."""
        lo, hi, nb = self.hist_cols[c]
        w = (hi - lo) / nb
        return (
            f"CASE WHEN {c} IS NULL THEN NULL "
            f"WHEN CAST({c} AS DOUBLE) < {lo!r} THEN 0 "
            f"WHEN CAST({c} AS DOUBLE) >= {hi!r} THEN {nb + 1} "
            f"ELSE LEAST(1 + CAST(floor((CAST({c} AS DOUBLE) - {lo!r}) "
            f"/ {w!r}) AS INT), {nb}) END"
        )

    def _partials(self, df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("__cnt")]
        for c in self.sum_cols:
            aggs.append(
                F.sum(F.col(c).cast("decimal(28,6)")).alias(f"sum_{c}")
            )
        for c in self.min_cols:
            aggs.append(F.min(c).alias(f"min_{c}"))
        for c in self.max_cols:
            aggs.append(F.max(c).alias(f"max_{c}"))
        for c in self.distinct_cols:
            aggs.append(
                F.hll_sketch_agg(F.col(c), F.lit(self.lgk)).alias(f"hll_{c}")
            )
        # slot index materialized ONCE per row/column — downstream reads
        # the precomputed int, never re-evaluates the binning CASE
        for c in self.hist_cols:
            df = df.withColumn(f"__bin_{c}", F.expr(self._bin_expr(c)))
        if len(self.hist_cols) == 1 and not self.distinct_cols:
            # (exactly one hist col: with several, level-1 rows keyed by
            # the OTHER columns' slots would duplicate this column's
            # slot keys in the map pivot)
            # Histogram partials as a TWO-LEVEL aggregation instead of
            # nbins+2 conditional sums in the main agg: level 1 folds
            # count/sum/min/max per (group, slot...) — every one of
            # those is mergeable by this store's own premise, so
            # re-aggregating per group is the exact same integers/
            # decimals — and level 2 pivots the slot counts to the
            # array with one map lookup per slot.  Same single pass
            # over the batch, same shuffled bytes (<= groups x slots
            # map-side-combined rows), but the plan is a handful of
            # small generic operators: the wide form paid ~0.5 s/fold
            # of analysis + whole-stage codegen for the 66-expression
            # aggregate, tripled per maintenance cycle.  (HLL partials
            # can't ride level 1 — a union of per-slot sketches is not
            # guaranteed byte-identical to the one-pass sketch — so
            # distinct_cols stores keep the one-level wide shape.)
            bins = [f"__bin_{c}" for c in self.hist_cols]
            lvl1 = df.groupBy(*self.group_cols, *bins).agg(*aggs)
            aggs2 = [F.sum("__cnt").alias("__cnt")]
            for c in self.sum_cols:
                aggs2.append(F.sum(f"sum_{c}").alias(f"sum_{c}"))
            for c in self.min_cols:
                aggs2.append(F.min(f"min_{c}").alias(f"min_{c}"))
            for c in self.max_cols:
                aggs2.append(F.max(f"max_{c}").alias(f"max_{c}"))
            for c, (_lo, _hi, nb) in self.hist_cols.items():
                # rows whose value was NULL carry a NULL slot: they count
                # toward __cnt but never toward a histogram slot
                aggs2.append(
                    F.expr(
                        f"transform(sequence(0, {nb + 1}), i -> coalesce("
                        f"element_at(map_from_entries(collect_list("
                        f"CASE WHEN __bin_{c} IS NOT NULL THEN "
                        f"struct(__bin_{c} AS b, __cnt AS c) END)), i), 0L))"
                    ).alias(f"hist_{c}")
                )
            main = lvl1.groupBy(*self.group_cols).agg(*aggs2)
        else:
            for c, (_lo, _hi, nb) in self.hist_cols.items():
                aggs.append(
                    F.array(*[
                        F.sum(
                            F.when(F.col(f"__bin_{c}") == i, F.lit(1))
                            .otherwise(F.lit(0))
                        ).cast("long")
                        for i in range(nb + 2)
                    ]).alias(f"hist_{c}")
                )
            main = df.groupBy(*self.group_cols).agg(*aggs)
        # Sample partials come from a window-pre-trimmed side frame, NOT a
        # collect_list over the raw group: ranking is a spill-safe sort and
        # only the k surviving rows per group ever enter an aggregation
        # buffer (a raw collect_list buffers the whole batch-group's values
        # before trimming — measured pathological at 10x batch sizes).  The
        # side frame shuffles on the same group key as the main partials,
        # and the join is group-count-sized.
        for c, k in self.sample_cols.items():
            from pyspark.sql import Window

            w = Window.partitionBy(*self.group_cols).orderBy("__h__", "__v__")
            s = (
                df.filter(F.col(c).isNotNull())
                .select(
                    *self.group_cols,
                    F.md5(
                        F.concat(F.lit("s|"), F.col(c).cast("string"))
                    ).alias("__h__"),
                    F.col(c).cast("string").alias("__v__"),
                )
                .distinct()
                .withColumn("__rn__", F.row_number().over(w))
                .filter(F.col("__rn__") <= int(k))
                .groupBy(*self.group_cols)
                .agg(
                    F.expr(
                        "array_sort(collect_list("
                        "named_struct('h', __h__, 'v', __v__)))"
                    ).alias(f"sample_{c}")
                )
            )
            # null-safe equality on every group column: a name-based join
            # would drop NULL-keyed groups' samples (NULL = NULL never
            # matches) while their count/sum/histogram partials survive
            # the groupBy — the aggregates must not diverge by key shape
            s = s.select(
                *[
                    F.col(g).alias(f"__sg_{g}__")
                    for g in self.group_cols
                ],
                f"sample_{c}",
            )
            cond = None
            for g in self.group_cols:
                eq = main[g].eqNullSafe(s[f"__sg_{g}__"])
                cond = eq if cond is None else cond & eq
            main = (
                main.join(s, cond, "left")
                .drop(*[f"__sg_{g}__" for g in self.group_cols])
                .withColumn(
                    f"sample_{c}",
                    F.coalesce(
                        F.col(f"sample_{c}"),
                        F.expr(
                            "CAST(array() AS array<struct<h:string,v:string>>)"
                        ),
                    ),
                )
            )
        return main

    def _merge(self, state: DataFrame, batch: DataFrame) -> DataFrame:
        both = state.unionByName(batch)
        aggs = [F.sum("__cnt").alias("__cnt")]
        for c in self.sum_cols:
            aggs.append(F.sum(f"sum_{c}").alias(f"sum_{c}"))
        for c in self.min_cols:
            aggs.append(F.min(f"min_{c}").alias(f"min_{c}"))
        for c in self.max_cols:
            aggs.append(F.max(f"max_{c}").alias(f"max_{c}"))
        for c in self.distinct_cols:
            aggs.append(
                F.hll_union_agg(F.col(f"hll_{c}"), F.lit(True)).alias(f"hll_{c}")
            )
        for c, (_lo, _hi, nb) in self.hist_cols.items():
            # elementwise-sum the (<= 2 per group) state arrays with one
            # fold expression — exact long adds, order-free — instead of
            # nbins+2 per-slot sum aggregates (same wide-codegen cost the
            # partials side sheds above)
            aggs.append(
                F.expr(
                    f"aggregate(collect_list(hist_{c}), "
                    f"array_repeat(0L, {nb + 2}), "
                    "(acc, h) -> zip_with(acc, h, (a, b) -> a + b))"
                ).alias(f"hist_{c}")
            )
        for c, k in self.sample_cols.items():
            # union the (<= 2 per group) trimmed state arrays, re-sort,
            # re-trim: bottom-k is mergeable with bounded state
            aggs.append(
                F.expr(
                    f"slice(array_distinct(array_sort(flatten("
                    f"collect_list(sample_{c})))), 1, {int(k)})"
                ).alias(f"sample_{c}")
            )
        return both.groupBy(*self.group_cols).agg(*aggs)

    # -- write path -----------------------------------------------------------
    def apply(self, batch_df: DataFrame, batch_id=None) -> bool:
        """Fold one microbatch into the state; False if ``batch_id`` was
        already committed (replay -> no-op)."""
        if batch_id is not None and self.committed(batch_id):
            # Backfill the durable marker if the commit is only recorded in
            # the pointer (crash landed between the flip and the marker
            # write): the next commit overwrites the pointer's batch_id
            # slot, and without a marker the earlier batch would lose its
            # only commit record — a later replay could double-count it.
            if not os.path.exists(self._marker(batch_id)):
                with open(self._marker(batch_id), "w") as f:
                    f.write(str(batch_id))
            return False
        cur = self._current_dir()
        self._sweep_orphans(keep=cur)
        partials = self._partials(batch_df)
        if cur:
            state = batch_df.sparkSession.read.parquet(cur)
            partials = self._merge(state, partials)
        new_dir = os.path.join(self.path, f"v-{uuid.uuid4().hex[:12]}")
        partials.write.mode("overwrite").parquet(new_dir)
        # ATOMIC COMMIT: the new-state pointer and the committing batch_id
        # land in one os.replace.  A crash before this rename leaves the old
        # state live and the batch uncommitted (clean redo); a crash after it
        # leaves the new state live and the batch already committed (replay
        # no-op).  There is no window where the new partials are live but the
        # batch looks uncommitted — that window double-counts additive sums.
        ptr = os.path.join(self.path, "_current")
        tmp = ptr + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(new_dir + "\n" + ("" if batch_id is None else str(batch_id)))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, ptr)
        # past the commit point: the marker (commit history) and old-state
        # cleanup may crash without harm — committed() already answers True
        # via the pointer record, and orphan dirs are swept next apply.
        if batch_id is not None:
            with open(self._marker(batch_id), "w") as f:
                f.write(str(batch_id))
        if cur:
            shutil.rmtree(cur, ignore_errors=True)
        return True

    def _sweep_orphans(self, keep: str | None) -> None:
        """Remove v-* state dirs that lost the pointer race: a crash between
        state write and pointer flip leaves the new dir orphaned, and a
        crash after the flip may leave the OLD dir undeleted."""
        keep_name = os.path.basename(keep) if keep else None
        for name in os.listdir(self.path):
            if name.startswith("v-") and name != keep_name:
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)

    def _read_pointer(self) -> tuple[str | None, str | None]:
        """(current state dir, batch_id recorded at the commit) — the second
        slot is None for pre-upgrade single-line pointer files."""
        ptr = os.path.join(self.path, "_current")
        if not os.path.exists(ptr):
            return None, None
        with open(ptr) as f:
            lines = f.read().splitlines()
        cur = lines[0].strip() if lines else ""
        last = lines[1].strip() if len(lines) > 1 else ""
        return (cur or None, last or None)

    def _current_dir(self) -> str | None:
        return self._read_pointer()[0]

    # -- read path ------------------------------------------------------------
    def snapshot(self, spark: SparkSession) -> DataFrame:
        """Finalized per-group aggregates from the materialized state —
        no raw history is read.  Sums surface as DOUBLE (from the exact
        DECIMAL partials), distincts as HLL estimates."""
        cur = self._current_dir()
        if not cur:
            raise FileNotFoundError("no committed rollup state yet")
        state = spark.read.parquet(cur)
        cols = [*self.group_cols, F.col("__cnt").alias("n_rows")]
        for c in self.sum_cols:
            cols.append(F.col(f"sum_{c}").cast("double").alias(f"sum_{c}"))
        for c in self.min_cols:
            cols.append(F.col(f"min_{c}"))
        for c in self.max_cols:
            cols.append(F.col(f"max_{c}"))
        for c in self.distinct_cols:
            cols.append(
                F.hll_sketch_estimate(F.col(f"hll_{c}")).alias(
                    f"n_distinct_{c}"
                )
            )
        for c in self.hist_cols:
            for q in self.quantiles:
                cols.append(
                    F.expr(self._quantile_expr(c, q)).alias(
                        f"p{int(round(q * 100))}_{c}"
                    )
                )
        for c, k in self.sample_cols.items():
            cols.append(
                F.expr(f"transform(sample_{c}, x -> x.v)").alias(
                    f"sample_{c}"
                )
            )
            # classic KMV estimator: with the sketch full, the k-th
            # smallest hash (as a [0,1) fraction of its first 8 hex
            # digits) estimates distinct count as (k-1)/h_k; below k the
            # sketch IS the distinct set, so the count is exact
            frac = (
                f"(CAST(conv(substr(element_at(sample_{c}, {int(k)}).h, "
                f"1, 8), 16, 10) AS DOUBLE) / 4294967296.0)"
            )
            cols.append(
                F.expr(
                    f"CASE WHEN size(sample_{c}) < {int(k)} "
                    f"THEN CAST(size(sample_{c}) AS DOUBLE) "
                    f"ELSE round(({int(k)} - 1) / {frac}, 2) END"
                ).alias(f"kmv_distinct_est_{c}")
            )
        return state.select(*cols)

    def _quantile_expr(self, c: str, q: float) -> str:
        """Finalize one quantile from the stored bin counts: a cumulative
        fold locates the bin containing rank ``q * n`` and interpolates
        linearly inside it; the underflow/overflow slots answer the
        histogram bounds.  NULL when the group saw no non-NULL values.
        The identical arithmetic (same double ops, same order) is
        SQL-expressible, which is what pins it against an oracle."""
        lo, hi, nb = self.hist_cols[c]
        w = (hi - lo) / nb
        h = f"hist_{c}"
        tot = f"CAST(aggregate({h}, 0L, (a, x) -> a + x) AS DOUBLE)"
        t = f"({q!r} * {tot})"
        return f"""
        CASE WHEN {tot} = 0 THEN CAST(NULL AS DOUBLE) ELSE
        aggregate(
          transform({h}, (x, i) -> struct(x AS cnt, i AS idx)),
          struct(CAST(0 AS DOUBLE) AS cum, CAST(NULL AS DOUBLE) AS ans),
          (acc, e) -> CASE
            WHEN acc.ans IS NOT NULL OR e.cnt = 0
              THEN struct(acc.cum + e.cnt AS cum, acc.ans AS ans)
            WHEN acc.cum + e.cnt >= {t} THEN struct(
              acc.cum + e.cnt AS cum,
              CASE WHEN e.idx = 0 THEN CAST({lo!r} AS DOUBLE)
                   WHEN e.idx = {nb + 1} THEN CAST({hi!r} AS DOUBLE)
                   ELSE {lo!r} + {w!r} * (CAST(e.idx AS DOUBLE) - 1.0
                        + ({t} - acc.cum) / CAST(e.cnt AS DOUBLE)) END AS ans)
            ELSE struct(acc.cum + e.cnt AS cum, acc.ans AS ans) END,
          acc -> acc.ans) END
        """
