"""Declarative data-quality contracts checked in one scan — the
ingestion gate a 100 TB pipeline puts between raw landings and
training-data consumers (the public pattern behind AWS Deequ /
Great Expectations: a contract is DATA, the verification is one job,
the output is a machine-readable report that CI can fail on).

The reference repo validates its STTM workbooks structurally before
generating SQL (``scripts/sttm_validations_v22.py`` — required
columns, unknown targets, duplicate keys); this module is the same
idea aimed at the DATA the generated pipelines move: declare what a
table must look like, verify cheaply, ship the verdict.

Design for scale:

* every row-scan constraint (completeness, uniqueness, bounds, set
  membership, regex match-rate) compiles into ONE aggregation over the
  table — a single pass, all metrics partial-aggregated map-side, no
  matter how many constraints the contract carries.  The aggregate row
  is then UNPIVOTED to report rows by exploding an array of
  Column-literal structs (metadata-sized; no string-assembled SQL);
  nothing table-sized shuffles.
* referential-integrity constraints each add one left-anti join
  against the parent key set (broadcast when the parent is dim-sized,
  shuffle otherwise — Catalyst's choice), aggregated straight to one
  orphan count.  Cost: one extra scan per FK, never a row-level
  report.
* the report is constraint-count-sized: safe to collect, publish, or
  gate on.

Every observed metric is a ratio (or extremum) of exact counts,
floor-quantized at 6 dp (``floor(x * 1e6 + 0.5) / 1e6`` — the
engine-portable idiom used across this repo; ``round(double, 6)``
diverges between Spark's shortest-string and DuckDB's exact-binary
rounding), so the report is bit-identical across engines and
partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _q6(col: Column) -> Column:
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


#: check kinds whose metric comes from the single-scan aggregation
_SCAN_KINDS = {"not_null", "unique", "min", "max", "in_set", "matches"}


def _scan_metric(check: dict) -> Column:
    """The aggregate expression producing one check's observed metric."""
    kind = check["check"]
    c = F.col(check["column"])
    if kind == "not_null":
        # completeness: fraction of rows with a value
        return _q6(
            F.sum(c.isNotNull().cast("bigint")).cast("double")
            / F.greatest(F.count(F.lit(1)), F.lit(1))
        )
    if kind == "unique":
        # distinct ratio over NON-NULL values: 1.0 means no duplicates
        return _q6(
            F.count_distinct(c).cast("double")
            / F.greatest(F.sum(c.isNotNull().cast("bigint")), F.lit(1))
        )
    if kind == "min":
        return F.min(c).cast("double")
    if kind == "max":
        return F.max(c).cast("double")
    if kind == "in_set":
        vals = check["values"]
        return _q6(
            F.sum(c.isin(*vals).cast("bigint")).cast("double")
            / F.greatest(F.sum(c.isNotNull().cast("bigint")), F.lit(1))
        )
    if kind == "matches":
        return _q6(
            F.sum(c.rlike(check["pattern"]).cast("bigint")).cast("double")
            / F.greatest(F.sum(c.isNotNull().cast("bigint")), F.lit(1))
        )
    raise ValueError(f"unknown scan check kind: {kind}")


def _threshold(check: dict) -> float:
    kind = check["check"]
    if kind in ("not_null", "unique", "in_set", "matches"):
        return float(check.get("min_rate", 1.0))
    if kind in ("min", "max"):
        return float(check["value"])
    if kind == "foreign_key":
        return float(check.get("max_orphan_rate", 0.0))
    raise ValueError(f"unknown check kind: {kind}")


def _passes(kind: str, observed: Column, threshold: float) -> Column:
    """pass-direction per kind: rates are >=, max-bound is <=, orphan
    rate is <=.  NULL observed (empty table extremum) fails closed."""
    if kind in ("not_null", "unique", "in_set", "matches", "min"):
        return F.coalesce(observed >= F.lit(threshold), F.lit(False))
    if kind in ("max", "foreign_key"):
        return F.coalesce(observed <= F.lit(threshold), F.lit(False))
    raise ValueError(f"unknown check kind: {kind}")


def validate_contract(
    df: DataFrame,
    checks: list[dict],
    refs: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Verify a declarative contract against ``df`` and return the
    report: one row per check —
    ``(check, column, observed, threshold, status)``.

    Check dicts (all thresholds optional where a default exists):

    * ``{"check": "not_null", "column": c, "min_rate": 1.0}`` —
      non-null fraction of all rows >= min_rate.
    * ``{"check": "unique", "column": c, "min_rate": 1.0}`` —
      distinct / non-null >= min_rate (1.0 = a real key).
    * ``{"check": "min"|"max", "column": c, "value": v}`` — the
      column extremum respects the bound (min >= v / max <= v).
    * ``{"check": "in_set", "column": c, "values": [...],
      "min_rate": 1.0}`` — fraction of non-null values inside the
      allowed set.
    * ``{"check": "matches", "column": c, "pattern": regex,
      "min_rate": 1.0}`` — fraction of non-null values matching the
      (Java/RE2-compatible) regex.
    * ``{"check": "foreign_key", "column": c, "ref": name,
      "ref_column": rc, "max_orphan_rate": 0.0}`` — fraction of
      non-null child values with no parent in ``refs[name]`` is at
      most the allowed orphan rate.

    All scan-kind checks share ONE aggregation pass; each foreign_key
    adds one anti-join + count.  See the module docstring for the
    scale argument.
    """
    if not checks:
        raise ValueError("validate_contract: empty check list")
    scan = [c for c in checks if c["check"] in _SCAN_KINDS]
    fks = [c for c in checks if c["check"] == "foreign_key"]
    unknown = [
        c for c in checks if c["check"] not in _SCAN_KINDS | {"foreign_key"}
    ]
    if unknown:
        raise ValueError(f"unknown check kinds: {sorted({c['check'] for c in unknown})}")

    reports: list[DataFrame] = []
    if scan:
        agg_row = df.agg(
            *[
                _scan_metric(c).alias(f"__m{i}__")
                for i, c in enumerate(scan)
            ]
        )
        # unpivot the 1-row aggregate to report rows via an exploded
        # array of Column-literal structs (metadata-sized work on a
        # 1-row frame).  Each struct carries its OWN verdict, computed
        # against its OWN threshold at build time — two checks of the
        # same (kind, column) with different thresholds each judge
        # against their own bound (a name-keyed CASE matched the first
        # clause for both), and check kinds / column names never pass
        # through string-assembled SQL, so quotes in a column name
        # can't break or inject into the expression.
        rows = []
        for i, c in enumerate(scan):
            verdict = _passes(
                c["check"], F.col(f"__m{i}__"), _threshold(c)
            )
            rows.append(
                F.struct(
                    F.lit(c["check"]).alias("check"),
                    F.lit(c["column"]).alias("column"),
                    F.col(f"__m{i}__").cast("double").alias("observed"),
                    F.lit(_threshold(c)).cast("double").alias("threshold"),
                    F.when(verdict, F.lit("pass"))
                    .otherwise(F.lit("fail"))
                    .alias("status"),
                )
            )
        reports.append(
            agg_row.select(F.explode(F.array(*rows)).alias("__r__"))
            .select("__r__.*")
        )
    for c in fks:
        if refs is None or c["ref"] not in refs:
            raise ValueError(
                f"foreign_key check needs refs[{c['ref']!r}]"
            )
        child = df.select(F.col(c["column"]).alias("__k__")).filter(
            F.col("__k__").isNotNull()
        )
        parent = refs[c["ref"]].select(
            F.col(c["ref_column"]).alias("__k__")
        ).distinct()
        thr = _threshold(c)
        # 1x1 combine of two single-row aggregates (allowlisted shape)
        rep = (
            child.join(parent, "__k__", "left_anti")
            .agg(F.count(F.lit(1)).alias("__orph__"))
            .crossJoin(child.agg(F.count(F.lit(1)).alias("__tot__")))
            .select(
                F.lit("foreign_key").alias("check"),
                F.lit(c["column"]).alias("column"),
                _q6(
                    F.col("__orph__").cast("double")
                    / F.greatest(F.col("__tot__"), F.lit(1))
                ).alias("observed"),
                F.lit(thr).cast("double").alias("threshold"),
            )
            .withColumn(
                "status",
                F.when(
                    _passes("foreign_key", F.col("observed"), thr),
                    F.lit("pass"),
                ).otherwise(F.lit("fail")),
            )
        )
        reports.append(rep)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# Incremental verification: counter partials that merge across batches.
# A recurring ingest doesn't want to re-scan the corpus per delivery to
# re-verify the contract — every scan metric here decomposes into
# mergeable counters (sums, mins, maxes), so each batch contributes one
# 1-row partial and the CUMULATIVE report over all deliveries equals
# validate_contract over the union, exactly (the rollup-store property:
# snapshot == one-shot aggregation at quiescence).  `unique` is the one
# non-decomposable check (cross-batch distinctness needs a key index,
# not a counter) — contract_counters rejects it with the pointer to
# dedup.build_dedup_index, which is that index.
# ---------------------------------------------------------------------------


def contract_counters(
    df: DataFrame,
    checks: list[dict],
    refs: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """ONE-row frame of mergeable raw counters for ``checks`` over this
    batch: summable columns are prefixed ``s_``, min-merged ``mn_``,
    max-merged ``mx_`` (``merge_contract_counters`` folds by prefix).
    Scan checks share one aggregation; each foreign_key adds one
    anti-join count against the (static) parent key set."""
    if not checks:
        raise ValueError("contract_counters: empty check list")
    bad = [c for c in checks if c["check"] == "unique"]
    if bad:
        raise ValueError(
            "contract_counters: 'unique' does not decompose into "
            "mergeable counters — cross-batch distinctness needs a key "
            "index, not a counter; use "
            "streaming.contracts.UniqueKeyMonitor (the "
            "dedup.build_dedup_index digest set as the per-batch "
            "upserted index) or a one-shot validate_contract"
        )
    aggs: list[Column] = []
    for i, c in enumerate(checks):
        kind = c["check"]
        col = F.col(c["column"])
        if kind == "not_null":
            aggs += [
                F.sum(col.isNotNull().cast("bigint")).alias(f"s_nn{i}"),
                F.count(F.lit(1)).alias(f"s_n{i}"),
            ]
        elif kind == "in_set":
            aggs += [
                F.sum(col.isin(*c["values"]).cast("bigint"))
                .alias(f"s_hit{i}"),
                F.sum(col.isNotNull().cast("bigint")).alias(f"s_nn{i}"),
            ]
        elif kind == "matches":
            aggs += [
                F.sum(col.rlike(c["pattern"]).cast("bigint"))
                .alias(f"s_hit{i}"),
                F.sum(col.isNotNull().cast("bigint")).alias(f"s_nn{i}"),
            ]
        elif kind == "min":
            aggs.append(F.min(col).cast("double").alias(f"mn_v{i}"))
        elif kind == "max":
            aggs.append(F.max(col).cast("double").alias(f"mx_v{i}"))
        elif kind == "foreign_key":
            continue  # handled below (separate joins)
        else:
            raise ValueError(f"unknown check kind: {kind}")
    out = df.agg(*aggs) if aggs else None
    for i, c in enumerate(checks):
        if c["check"] != "foreign_key":
            continue
        if refs is None or c["ref"] not in refs:
            raise ValueError(f"foreign_key check needs refs[{c['ref']!r}]")
        child = df.select(F.col(c["column"]).alias("__k__")).filter(
            F.col("__k__").isNotNull()
        )
        parent = refs[c["ref"]].select(
            F.col(c["ref_column"]).alias("__k__")
        ).distinct()
        fk = (
            child.join(parent, "__k__", "left_anti")
            .agg(F.count(F.lit(1)).alias(f"s_orph{i}"))
            .crossJoin(child.agg(F.count(F.lit(1)).alias(f"s_nn{i}")))
        )
        out = fk if out is None else out.crossJoin(fk)
    return out


def merge_all_counters(parts: DataFrame) -> DataFrame:
    """Fold ANY number of counter-partial rows into one: ``s_`` columns
    add, ``mn_`` min-merge, ``mx_`` max-merge (NULL-tolerant — an empty
    batch's NULL extremum never poisons the cumulative one)."""
    aggs = []
    for col in parts.columns:
        if col.startswith("s_"):
            aggs.append(F.sum(col).alias(col))
        elif col.startswith("mn_"):
            aggs.append(F.min(col).alias(col))
        elif col.startswith("mx_"):
            aggs.append(F.max(col).alias(col))
        else:
            raise ValueError(f"unmergeable counter column: {col}")
    return parts.agg(*aggs)


def merge_contract_counters(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two counter partials (see :func:`merge_all_counters`)."""
    if set(a.columns) != set(b.columns):
        raise ValueError(
            f"counter schemas differ: {sorted(a.columns)} vs "
            f"{sorted(b.columns)}"
        )
    return merge_all_counters(a.unionByName(b))


def report_from_counters(
    counters: DataFrame, checks: list[dict]
) -> DataFrame:
    """The validate_contract report, computed from accumulated counters
    — same columns, same floor-quantized arithmetic, so at quiescence
    (all batches folded) it equals the one-shot report row-for-row."""
    rows = []
    for i, c in enumerate(checks):
        kind = c["check"]
        thr = _threshold(c)
        if kind == "not_null":
            obs = _q6(
                F.col(f"s_nn{i}").cast("double")
                / F.greatest(F.col(f"s_n{i}"), F.lit(1))
            )
        elif kind in ("in_set", "matches"):
            obs = _q6(
                F.col(f"s_hit{i}").cast("double")
                / F.greatest(F.col(f"s_nn{i}"), F.lit(1))
            )
        elif kind == "min":
            obs = F.col(f"mn_v{i}")
        elif kind == "max":
            obs = F.col(f"mx_v{i}")
        elif kind == "foreign_key":
            obs = _q6(
                F.col(f"s_orph{i}").cast("double")
                / F.greatest(F.col(f"s_nn{i}"), F.lit(1))
            )
        else:
            raise ValueError(f"unknown check kind: {kind}")
        rows.append(
            F.struct(
                F.lit(kind).alias("check"),
                F.lit(c["column"]).alias("column"),
                obs.cast("double").alias("observed"),
                F.lit(thr).cast("double").alias("threshold"),
                F.when(_passes(kind, obs, thr), F.lit("pass"))
                .otherwise(F.lit("fail")).alias("status"),
            )
        )
    return counters.select(
        F.explode(F.array(*rows)).alias("__r__")
    ).select("__r__.*")
