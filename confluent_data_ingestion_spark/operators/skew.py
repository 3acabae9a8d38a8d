"""Skew-mitigation join: salt the hot side, replicate the other.

AQE's skew-join splitting handles sort-merge skew automatically, but it
only kicks in on shuffle joins it can observe and split.  This operator is
the explicit form for the canonical hot-key case: a fact table where a few
keys carry a disproportionate share of rows, joined to a side that is too
big to broadcast but small enough to replicate ``n_salt`` times.

Mechanics: every fact row gets a deterministic pseudo-salt in
``[0, n_salt)`` hashed from its full column tuple (NOT from the join key —
the whole point is spreading one key's rows), and the other side is
exploded once per salt value.  The join key becomes (key, salt): one hot
key's rows now land on ``n_salt`` different reducers.  Results are
identical to the plain join; only the partition histogram changes.

Supported joins: ``inner`` and ``left`` (an unmatched left row appears
exactly once — its single salted row simply finds no match).  ``right`` /
``full`` are rejected: unmatched RIGHT rows exist once per replica and
would surface ``n_salt`` times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salt: int = 8,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Join ``left`` (the skewed side) to ``right`` on equality of ``on``
    columns, spreading each hot key across ``n_salt`` partitions.

    ``salt_cols`` selects which left columns feed the salt hash (default:
    all) — pass a high-cardinality subset if the full row is wide.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r} "
            "(right/full would duplicate unmatched right rows)"
        )
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    cols = salt_cols or left.columns
    l = left.withColumn(
        "__salt__", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salt))
    )
    r = right.withColumn(
        "__salt__", F.explode(F.expr(f"sequence(0, {n_salt - 1})"))
    )
    cond = [l[c] == r[c] for c in on] + [l["__salt__"] == r["__salt__"]]
    joined = l.join(r, cond, how)
    # drop the salt and the right side's duplicate key columns
    out = joined.drop(l["__salt__"]).drop(r["__salt__"])
    for c in on:
        out = out.drop(r[c])
    return out
