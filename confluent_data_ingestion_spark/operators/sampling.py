"""Deterministic sampling / train-test splitting for training-data
pipelines.

Splits must be (a) stable under reruns and repartitioning, (b) independent
of row order, and (c) reproducible by any engine auditing the dataset — so
the assignment is a pure function of the KEY, not of Spark's RNG:
``md5(seed | key)`` interpreted through its first 8 hex chars partitions
the key space uniformly into 16^8 buckets, and split thresholds are
cumulative-fraction cutoffs rendered as 8-char hex strings (lexicographic
compare on lowercase hex == numeric compare, identical in any SQL engine).

Per-row expressions only: zero shuffle, scan speed, no sampling skew from
partition boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SPACE = 16 ** 8


def _hex_cut(fraction: float) -> str:
    return format(min(int(fraction * _SPACE), _SPACE - 1), "08x")


def _bucket_expr(key_col: str, seed: str) -> str:
    return f"substr(md5(concat('{seed}', '|', CAST({key_col} AS STRING))), 1, 8)"


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a split label by hashed key.

    ``fractions`` maps label -> fraction in assignment order (insertion
    order of the dict); they must sum to 1.  The same (key, seed) always
    lands in the same split — duplicate keys travel together, which is
    what you want so a document never leaks across train/test.
    """
    fractions = fractions or {"train": 0.9, "test": 0.1}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = _bucket_expr(key_col, seed)
    labels = list(fractions)
    cum = 0.0
    cases = []
    for label in labels[:-1]:
        cum += fractions[label]
        cases.append(f"WHEN {bucket} < '{_hex_cut(cum)}' THEN '{label}'")
    expr = "CASE " + " ".join(cases) + f" ELSE '{labels[-1]}' END"
    return df.withColumn(out_col, F.expr(expr))


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen purely by hashed key — stable
    under reruns, repartitioning, and engine choice (unlike
    ``DataFrame.sample``, whose output depends on partitioning)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return df
    bucket = _bucket_expr(key_col, seed)
    return df.filter(F.expr(f"{bucket} < '{_hex_cut(fraction)}'"))
