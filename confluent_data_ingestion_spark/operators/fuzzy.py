"""Exact fuzzy matching (edit distance 1) without a cross join: the
SymSpell deletion-neighborhood join, distributed.

Entity resolution over ingested reference data ("is this supplier name a
typo of that one?") is a self-join under an edit-distance predicate.  The
naive plan is a cartesian product — dead at any scale.  The SymSpell
observation (public method, Garbe 2012) makes it an EQUI-join: two strings
within Levenshtein distance 1 always share a member of their deletion
neighborhoods (the string itself plus every single-character deletion):

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


def deletion_neighborhood(df: DataFrame, key_col: str, text_col: str) -> DataFrame:
    """One row per (key, text, variant): the string itself plus every
    single-character deletion, deduplicated.  Pure JVM expressions."""
    variants = (
        f"array_union(array({text_col}), "
        f"transform(sequence(1, greatest(length({text_col}), 1)), "
        f"i -> concat(substr({text_col}, 1, i - 1), "
        f"substr({text_col}, i + 1, length({text_col})))))"
    )
    return df.select(
        F.col(key_col), F.col(text_col), F.explode(F.expr(variants)).alias("__variant")
    )


def fuzzy_pairs_d1(
    df: DataFrame,
    key_col: str,
    text_col: str,
    max_group: int | None = None,
    out_dist_col: str = "dist",
) -> DataFrame:
    """All unordered pairs of rows whose ``text_col`` values are within
    Levenshtein distance 1 — EXACTLY the cross-join-with-levenshtein
    answer, via the deletion-neighborhood equi-join.  ``max_group``
    (optional) drops neighborhood keys shared by more than that many
    rows before pairing — bounded reducers under pathological key
    collisions, at the cost of possibly missing pairs that only share
    the dropped variant; leave None for the exact default."""
    nb = deletion_neighborhood(df, key_col, text_col)
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
        .filter(F.col(out_dist_col) <= 1)
        .drop("__ta", "__tb")
    )
