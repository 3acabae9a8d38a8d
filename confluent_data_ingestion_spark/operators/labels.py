"""Multi-annotator label aggregation and agreement — the supervision
side of a training-data pipeline: several labelers (human raters, LLM
judges, weak heuristics) tag the same items, and the pipeline must (a)
resolve one training label per item and (b) measure whether the
annotators agree enough for the labels to mean anything.

Both operators are pure DataFrame aggregations over the wide
(item, annotator_1 .. annotator_k) frame — one shuffle each, label-set
sized state, no UDFs.  Agreement statistics are ratios of exact counts
rounded to 6 dp, so results are bit-identical across engines and
partitionings (the repo's standard float-parity contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def majority_label(
    df: DataFrame,
    id_col: str,
    annotator_cols: list[str],
    tie_break: str = "lexical",
) -> DataFrame:
    """One resolved label per item: the label most annotators chose.

    Ties break deterministically — ``lexical`` picks the smallest label
    string among the tied leaders (stable across partitionings and
    engines; a random or first-seen tie-break would make the training
    set nondeterministic).  NULL votes (annotator skipped the item)
    simply don't count.  Output:
    ``(id, label, votes, n_votes, unanimous)``; items EVERY annotator
    skipped are absent (no votes exist to resolve — a NULL-label row
    would put an unlabeled item into a training set).

    Scale: explode k annotator columns (k map-side rows per item),
    count per (item, label), one max_by per item — state is
    items x distinct-labels-voted, never the corpus text.
    """
    votes = (
        df.select(
            F.col(id_col),
            F.explode(F.array(*[F.col(c) for c in annotator_cols]))
            .alias("__lab__"),
        )
        .filter(F.col("__lab__").isNotNull())
        .groupBy(id_col, "__lab__")
        .agg(F.count(F.lit(1)).alias("__v__"))
    )
    if tie_break != "lexical":
        raise ValueError(f"unknown tie_break {tie_break!r}")
    # max_by with a composite (votes, reversed-label) key would need an
    # orderable struct; a window keeps it engine-portable and explicit
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("__v__").desc(), F.col("__lab__").asc()
    )
    return (
        votes.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .join(
            votes.groupBy(id_col).agg(F.sum("__v__").alias("n_votes")),
            id_col,
        )
        .select(
            F.col(id_col),
            F.col("__lab__").alias("label"),
            F.col("__v__").alias("votes"),
            "n_votes",
            (F.col("__v__") == F.col("n_votes")).alias("unanimous"),
        )
    )


def pairwise_kappa(
    df: DataFrame,
    annotator_cols: list[str],
) -> DataFrame:
    """Cohen's kappa for every annotator pair — chance-corrected
    agreement: ``kappa = (po - pe) / (1 - pe)`` with ``po`` the observed
    agreement rate and ``pe`` the agreement expected from each rater's
    marginal label distribution.  Items where either rater skipped
    (NULL) are excluded from that pair, the standard pairwise-deletion
    convention.  Output per pair:
    ``(rater_a, rater_b, n_items, observed_agreement,
    expected_agreement, kappa)`` — all three statistics rounded to 6 dp
    (ratios of exact counts: engine-portable).  ``kappa`` is NULL for a
    degenerate pair (``pe == 1``: both raters constant on one label —
    chance correction is undefined there, and reporting 0 would hide
    the degeneracy).

    Scale: ONE pipeline for all k*(k-1)/2 pairs — the wide frame melts
    into (rater_a, rater_b, label_a, label_b) rows (k*(k-1)/2 map-side
    rows per item, no extra scans), then every aggregation and join is
    keyed on the pair: the shuffled state is pairs x label-set^2, never
    the items, and adding annotators adds map-side rows rather than
    whole jobs.
    """
    if len(annotator_cols) < 2:
        raise ValueError("pairwise_kappa needs at least two annotators")
    melted = []
    for i, a in enumerate(annotator_cols):
        for b in annotator_cols[i + 1:]:
            melted.append(
                F.struct(
                    F.lit(a).alias("ra"), F.lit(b).alias("rb"),
                    F.col(a).alias("la"), F.col(b).alias("lb"),
                )
            )
    pairs = (
        df.select(F.explode(F.array(*melted)).alias("p"))
        .select("p.ra", "p.rb", "p.la", "p.lb")
        .filter(F.col("la").isNotNull() & F.col("lb").isNotNull())
    )
    joint = pairs.groupBy("ra", "rb", "la", "lb").agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = joint.groupBy("ra", "rb").agg(
        F.sum("n").alias("n_items"),
        F.sum(F.when(F.col("la") == F.col("lb"), F.col("n"))
              .otherwise(F.lit(0))).alias("agree"),
    )
    ma = joint.groupBy("ra", "rb", "la").agg(F.sum("n").alias("na"))
    mb = joint.groupBy("ra", "rb", "lb").agg(F.sum("n").alias("nb"))
    exp = (
        ma.join(
            mb,
            (ma["ra"] == mb["ra"]) & (ma["rb"] == mb["rb"])
            & (ma["la"] == mb["lb"]),
        )
        .groupBy(ma["ra"].alias("ra"), ma["rb"].alias("rb"))
        .agg(F.sum(F.col("na") * F.col("nb")).alias("prod_sum"))
    )
    return (
        stats.join(exp, ["ra", "rb"])
        .select(
            F.col("ra").alias("rater_a"),
            F.col("rb").alias("rater_b"),
            "n_items",
            F.round(F.col("agree") / F.col("n_items"), 6)
            .alias("observed_agreement"),
            F.round(
                F.col("prod_sum") / (F.col("n_items") * F.col("n_items")),
                6,
            ).alias("expected_agreement"),
        )
        .select(
            "rater_a", "rater_b", "n_items",
            "observed_agreement", "expected_agreement",
            F.when(
                F.col("expected_agreement") < 1.0,
                F.round(
                    (F.col("observed_agreement")
                     - F.col("expected_agreement"))
                    / (F.lit(1.0) - F.col("expected_agreement")),
                    6,
                ),
            ).alias("kappa"),
        )
    )
