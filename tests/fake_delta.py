"""DataFrame-backed emulator of the Delta Lake MERGE surface.

Contract-tests ``UpsertSnapshot``'s delta backend in environments without
the delta-spark package: ``FakeDeltaStore`` routes the two test seams
(``_delta_table_api`` / ``_delta_io_format``) to this emulator, so the REAL
``_upsert_delta`` body — clause construction, strictly-newer conditions,
tombstone handling, marker-based replay skip — executes end-to-end.  Only
the storage engine is substituted (plain parquet instead of the Delta log).

MERGE semantics follow the Delta spec for the clause shapes
``_upsert_delta`` emits: clauses evaluate in declaration order, the first
applicable clause wins per matched row, unmatched-source rows insert only
when an insert clause's condition holds, and unmatched-target rows pass
through.  The emulator assumes the caller aliases target as ``t`` (via
``.alias``) and source as ``s`` — the convention ``_upsert_delta`` uses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from confluent_data_ingestion_spark.streaming.upsert import UpsertSnapshot


class FakeDeltaTable:
    def __init__(self, spark, path: str):
        self._spark = spark
        self._path = path
        self._alias = "t"
        self._source: DataFrame | None = None
        self._cond: str | None = None
        self._clauses: list[tuple[str, str | None]] = []

    # -- surface mirrored from delta.tables.DeltaTable -----------------------

    @staticmethod
    def isDeltaTable(spark, path: str) -> bool:
        return os.path.isdir(path)

    @classmethod
    def forPath(cls, spark, path: str) -> "FakeDeltaTable":
        return cls(spark, path)

    def alias(self, name: str) -> "FakeDeltaTable":
        self._alias = name
        return self

    def merge(self, source: DataFrame, condition: str) -> "FakeDeltaTable":
        self._source = source
        self._cond = condition
        return self

    def whenMatchedDelete(self, condition: str | None = None):
        self._clauses.append(("matched_delete", condition))
        return self

    def whenMatchedUpdateAll(self, condition: str | None = None):
        self._clauses.append(("matched_update", condition))
        return self

    def whenNotMatchedInsertAll(self, condition: str | None = None):
        self._clauses.append(("not_matched_insert", condition))
        return self

    # -- execution -----------------------------------------------------------

    def execute(self) -> None:
        ta = self._alias
        tgt = self._spark.read.parquet(self._path)
        cols = tgt.columns
        t = tgt.withColumn("__t__", F.lit(True)).alias(ta)
        s = self._source.withColumn("__s__", F.lit(True)).alias("s")
        j = t.join(s, F.expr(self._cond), "full_outer")

        matched = F.col(f"{ta}.__t__").isNotNull() & F.col("s.__s__").isNotNull()
        t_only = F.col("s.__s__").isNull()
        s_only = F.col(f"{ta}.__t__").isNull()

        def _c(cond: str | None):
            base = F.lit(True) if cond is None else F.expr(cond)
            return F.coalesce(base, F.lit(False))  # NULL condition = no hit

        take_source = F.lit(False)
        deleted = F.lit(False)
        decided = F.lit(False)  # first applicable matched clause wins
        inserted = F.lit(False)
        for kind, cond in self._clauses:
            hit = _c(cond)
            if kind == "matched_delete":
                eff = matched & ~decided & hit
                deleted = deleted | eff
                decided = decided | eff
            elif kind == "matched_update":
                eff = matched & ~decided & hit
                take_source = take_source | eff
                decided = decided | eff
            else:  # not_matched_insert
                inserted = inserted | (s_only & hit)

        keep = t_only | (matched & ~deleted) | inserted
        out = j.filter(keep).select(*[
            F.when(take_source | s_only, F.col(f"s.{c}"))
            .otherwise(F.col(f"{ta}.{c}"))
            .alias(c)
            for c in cols
        ])
        # materialize before overwriting the directory we just read from
        rows = out.collect()
        self._spark.createDataFrame(rows, out.schema).write.mode(
            "overwrite"
        ).parquet(self._path)


class FakeDeltaStore(UpsertSnapshot):
    """UpsertSnapshot whose delta backend runs on the emulator: the real
    ``_upsert_delta`` logic executes, storage is parquet."""

    def _delta_table_api(self):
        return FakeDeltaTable

    def _delta_io_format(self) -> str:
        return "parquet"

    def _resolve_backend(self, spark) -> str:  # no delta-spark probe
        if self.backend == "auto":
            self.backend = "delta"
        return self.backend
