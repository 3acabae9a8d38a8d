"""Exact fuzzy matching (edit distance <= 2) without a cross join: the
SymSpell deletion-neighborhood join, distributed.

Entity resolution over ingested reference data ("is this supplier name a
typo of that one?") is a self-join under an edit-distance predicate.  The
naive plan is a cartesian product — dead at any scale.  The SymSpell
observation (public method, Garbe 2012) makes it an EQUI-join: two strings
within Levenshtein distance d always share a member of their <= d-
deletion neighborhoods (the string itself plus every variant reachable
by up to d character deletions); for d = 1:

 - substitution at position i  -> both delete position i, same variant
 - insertion/deletion          -> the shorter string IS a deletion of the
                                  longer one, and every string is in its
                                  own neighborhood
 - equality                    -> share the string itself

so candidates = rows sharing a neighborhood key (one shuffle on the key,
~len(s)+1 keys per row), and an exact ``levenshtein() <= 1`` post-filter
removes the false positives (different strings can share a deletion, e.g.
"ab"/"ba" share "a" and "b" but are distance 2).  One-sided pruning + an
exact verify — the same contract as ``operators/sketch.py``.

Scale shape: the explode multiplies rows by ~name length (bounded for
real-world keys); the candidate join is an equi-join on short string
keys.  Hot variants (a deletion shared by MANY strings) are frequency-
capped like every pairing join in ``operators/dedup.py`` — a capped
variant can only lose candidate pairs whose strings ALSO share another,
colder variant only if that variant survives, so the cap is recorded in
the audit column rather than applied silently by default (cap=None).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletions_of(expr: str) -> str:
    """SQL array of every single-character deletion of string ``expr``."""
    return (
        f"transform(sequence(1, greatest(length({expr}), 1)), "
        f"i -> concat(substr({expr}, 1, i - 1), "
        f"substr({expr}, i + 1, length({expr}))))"
    )


def deletion_neighborhood(
    df: DataFrame, key_col: str, text_col: str, d: int = 1
) -> DataFrame:
    """One row per (key, text, variant): the string itself plus every
    distinct variant reachable by up to ``d`` character deletions
    (SymSpell's candidate key set — ~len+1 variants at d=1, ~len²/2 at
    d=2).  Pure JVM expressions, no UDF."""
    if d not in (1, 2):
        raise ValueError(f"d must be 1 or 2, got {d}")
    d1 = _deletions_of(text_col)
    variants = f"array_union(array({text_col}), {d1})"
    if d == 2:
        d2 = f"flatten(transform({d1}, v -> {_deletions_of('v')}))"
        variants = f"array_union({variants}, array_distinct({d2}))"
    return df.select(
        F.col(key_col), F.col(text_col), F.explode(F.expr(variants)).alias("__variant")
    )


def fuzzy_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str,
    d: int = 1,
    max_group: int | None = None,
    out_dist_col: str = "dist",
) -> DataFrame:
    """All unordered pairs of rows whose ``text_col`` values are within
    Levenshtein distance ``d`` (1 or 2) — EXACTLY the
    cross-join-with-levenshtein answer, via the deletion-neighborhood
    equi-join: if lev(a, b) <= d then some member of a's <= d-deletion
    neighborhood equals one of b's (the SymSpell completeness property),
    and the exact ``levenshtein() <= d`` post-filter removes every false
    candidate.  ``max_group`` (optional) drops neighborhood keys shared
    by more than that many rows before pairing — bounded reducers under
    pathological key collisions, at the cost of possibly missing pairs
    that only share the dropped variant; leave None for the exact
    default."""
    nb = deletion_neighborhood(df, key_col, text_col, d=d)
    if max_group is not None:
        hot = (
            nb.groupBy("__variant")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_group)
            .select("__variant")
        )
        nb = nb.join(F.broadcast(hot), "__variant", "left_anti")
    a = nb.select(
        F.col("__variant"),
        F.col(key_col).alias("id_a"),
        F.col(text_col).alias("__ta"),
    )
    b = nb.select(
        F.col("__variant"),
        F.col(key_col).alias("id_b"),
        F.col(text_col).alias("__tb"),
    )
    return (
        a.join(b, "__variant")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__ta", "__tb")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(out_dist_col, F.levenshtein("__ta", "__tb"))
        .filter(F.col(out_dist_col) <= d)
        .drop("__ta", "__tb")
    )


def fuzzy_pairs_d1(
    df: DataFrame,
    key_col: str,
    text_col: str,
    max_group: int | None = None,
    out_dist_col: str = "dist",
) -> DataFrame:
    """Distance-1 convenience wrapper over :func:`fuzzy_pairs`."""
    return fuzzy_pairs(
        df, key_col, text_col, d=1, max_group=max_group,
        out_dist_col=out_dist_col,
    )
