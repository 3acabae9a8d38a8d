"""Join-strategy advisor: one cheap metadata pass over both join inputs,
one recommendation — broadcast, plain shuffle, or salted join.

At 100 TB the wrong join strategy is the difference between minutes and
a dead cluster: broadcasting a 2 GB "dimension" OOMs every executor,
shuffling a fact against a 10-row lookup wastes the whole exchange, and
a hash join with one hot key strands the job at 99 % on a single
reducer.  Spark's AQE fixes some of this at runtime, but only after the
shuffle files exist; a pipeline author choosing between
``F.broadcast``, a plain join, and ``skew.salted_join`` wants the
answer BEFORE running the job.

The advisor spends one aggregation per side — row count, HLL distinct
keys (``lgk`` accuracy knob), and the hottest key's frequency via the
count-min sketch from :mod:`operators.sketch` (collision-corrected
count-mean-min estimate — tight for a genuinely hot key, near zero for
balanced keys even when distinct keys far exceed the sketch width) — all sketch-sized state, never a
key-space materialization.  Thresholds are explicit arguments, not
magic: the defaults mirror Spark's own
(``spark.sql.autoBroadcastJoinThreshold`` 10 MB ~ ``broadcast_rows``
at ~100 B/row, AQE's ``skewedPartitionFactor`` 5 ~ ``skew_factor``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# count-min width used for both the hottest-key pass and the noise floor
CMS_WIDTH = 8192


@dataclass
class SideStats:
    rows: int
    distinct_keys: float
    hottest_key_rows: int  # collision-corrected count-min estimate
    # expected corrected-max under PERFECTLY BALANCED keys: the extreme-
    # value bound sigma_bucket * sqrt(2 ln W) with sigma measured from the
    # sketch's own bucket counts (zeros included).  A "hottest key" below
    # ~2x this is sketch collision noise, not skew — the old closed-form
    # floor 8*sqrt(rows/W) assumed unit key weights and under-estimated
    # whenever keys carry multiple rows (lineitem's ~4 rows/orderkey made
    # a perfectly balanced join look salted at every scale).
    null_max_rows: float = 0.0

    @property
    def avg_rows_per_key(self) -> float:
        return self.rows / max(self.distinct_keys, 1.0)

    @property
    def skew_ratio(self) -> float:
        """Hottest key's rows vs the average key's."""
        return self.hottest_key_rows / max(self.avg_rows_per_key, 1.0)


@dataclass
class JoinAdvice:
    strategy: str  # "broadcast_left" | "broadcast_right" | "shuffle" | "salted"
    salt: int  # replication factor when strategy == "salted", else 1
    left: SideStats
    right: SideStats
    reason: str


def side_stats(df: DataFrame, key_col: str, lgk: int = 12) -> SideStats:
    """Profile one join side with ONE scan of the source: rows,
    approximate distinct keys (HLL), and the hottest key's
    collision-corrected count-min frequency.

    Two aggregations run (the CMS bucket table groups by (seed, bucket);
    the HLL estimate is a global agg — different groupings, so they
    cannot share one job), but the SOURCE is read once: the one-column
    key projection persists for the duration of the profile, the first
    job populates it while computing the sketch, and the HLL job reads
    the cached column, not the table.  At 100 TB that is the difference
    between one fact scan and two per what-if profile (the r11 review
    finding); the cached state is a single key column, the cheapest
    projection the table admits.  Pinned by a scan-count test
    (tests/test_advisor.py).
    """
    from .sketch import cms_bucket_counts

    width = CMS_WIDTH
    proj = df.select(F.col(key_col).alias("__cdis_key")).persist()
    try:
        return _side_stats_from(proj, "__cdis_key", width, lgk)
    finally:
        proj.unpersist()


def _side_stats_from(
    df: DataFrame, key_col: str, width: int, lgk: int
) -> SideStats:
    from .sketch import cms_bucket_rows

    rows, total = cms_bucket_rows(df, key_col, width=width)
    # raw bucket maxima upper-bound the hottest key but saturate with
    # collision mass when distinct keys >> width; subtracting the expected
    # colliding mass (count-mean-min correction) recovers the hot key's
    # own weight, then the min over hash rows tightens it.  The same
    # bounded collect also yields each seed's bucket-count variance
    # (zeros for the unoccupied buckets folded in via sum/sum-of-squares),
    # from which the balanced-keys extreme-value scale falls out.  The
    # per-seed max/sum-of-squares fold runs driver-side over the already
    # collected <= depth*width rows (exact integer sums, the same numbers
    # the old re-aggregation job computed) — one Spark job per profile,
    # not two plus a driver-rows round-trip.
    by_seed: dict[int, tuple[int, int]] = {}
    for s, _b, cnt in rows:
        m, sq = by_seed.get(s, (0, 0))
        by_seed[s] = (max(m, cnt), sq + cnt * cnt)
    per_seed = []
    sigmas = []
    for m, sq in by_seed.values():
        per_seed.append(m - (total - m) / max(width - 1, 1))
        mean = total / width
        var = max(float(sq) / width - mean * mean, 0.0)
        sigmas.append(var**0.5)
    hottest = max(0, round(min(per_seed))) if per_seed else 0
    null_max = (
        max(sigmas) * (2.0 * math.log(width)) ** 0.5 if sigmas else 0.0
    )
    ndv_row = df.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(key_col), F.lit(lgk))
        ).alias("ndv")
    ).collect()[0]
    return SideStats(
        rows=int(total),
        distinct_keys=float(ndv_row["ndv"] or 0),
        hottest_key_rows=int(hottest),
        null_max_rows=null_max,
    )


def join_advice(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    *,
    broadcast_rows: int = 100_000,
    skew_factor: float = 5.0,
    max_salt: int = 32,
    left_stats: SideStats | None = None,
    right_stats: SideStats | None = None,
) -> JoinAdvice:
    """Recommend a strategy for ``left JOIN right`` on the given keys.

    Order of precedence mirrors what actually wins at scale: broadcast
    beats everything when a side fits (no shuffle at all); otherwise a
    salted join when the bigger side's hottest key exceeds
    ``skew_factor`` x the average key (one reducer would own that key's
    whole partition); otherwise the plain shuffle join.  The salt factor
    is the smallest replication that levels the hot key to ~average,
    capped at ``max_salt`` (replication multiplies the other side).
    """
    # precomputed stats let a caller profiling several candidate joins
    # over the same inputs scan each side ONCE and reuse the profile —
    # never re-aggregate a 100 TB fact per what-if
    ls = left_stats if left_stats is not None else side_stats(left, left_key)
    rs = right_stats if right_stats is not None else side_stats(right, right_key)
    if rs.rows <= broadcast_rows and rs.rows <= ls.rows:
        return JoinAdvice(
            "broadcast_right", 1, ls, rs,
            f"right side {rs.rows} rows fits the broadcast budget",
        )
    if ls.rows <= broadcast_rows:
        return JoinAdvice(
            "broadcast_left", 1, ls, rs,
            f"left side {ls.rows} rows fits the broadcast budget",
        )
    # skew check runs on BOTH sides — a hot key strands its reducer no
    # matter which input carries it, since both shuffle on the join key
    # (the round-11 rework: the old bigger-side-only check missed a hot
    # key on the smaller fact and, worse, could fire on the balanced side
    # via sketch collision noise).  Extreme-value noise floor: across W
    # buckets the max overshoots the mean by ~sigma*sqrt(2 ln W) even
    # with perfectly balanced keys, so a corrected "hot key" below ~2x
    # that scale is collision noise, not skew.  sigma is MEASURED from
    # the sketch's bucket counts (SideStats.null_max_rows); the
    # closed-form 8*sqrt(rows/W) unit-weight bound stays as a lower
    # fallback (pinned by the balanced-keys / multi-row-per-key tests).
    skew_side = None
    for side, label in ((ls, "left"), (rs, "right")):
        noise_floor = max(
            2.0 * side.null_max_rows, 8.0 * (side.rows / CMS_WIDTH) ** 0.5
        )
        if side.skew_ratio > skew_factor and side.hottest_key_rows > noise_floor:
            if skew_side is None or side.hottest_key_rows > skew_side[0].hottest_key_rows:
                skew_side = (side, label)
    if skew_side is not None:
        side, label = skew_side
        salt = min(max_salt, max(2, round(side.skew_ratio)))
        return JoinAdvice(
            "salted", salt, ls, rs,
            f"{label} side hottest key ~{side.hottest_key_rows} rows vs "
            f"~{side.avg_rows_per_key:.0f} average (x{side.skew_ratio:.1f}) — "
            f"salt {salt} ways (operators.skew.salted_join)",
        )
    return JoinAdvice(
        "shuffle", 1, ls, rs,
        "both sides exceed the broadcast budget and keys are balanced",
    )
