"""Cluster resolution over near-duplicate pair lists (connected components).

The pair producers (``minhash_lsh_pairs``, ``simhash_pairs``,
``embedding_near_dup``, ``ngram_jaccard_pairs``) emit EDGES.  Deduplication
needs the transitive closure of those edges: if A~B and B~C, then A, B, C
are one duplicate cluster even though (A, C) never surfaced as a pair, and
exactly one representative should survive.  ``connected_components`` labels
every node with its cluster's minimum id — the same canonical-id convention
``exact_dedup`` and ``embedding_near_dup`` use.

Scale design: iterative min-label propagation, pure DataFrame ops.
 - Each round is ONE equi-join of the edge list with the current labels
   (shuffle on 8-byte node ids) followed by a min() aggregation that
   partially aggregates map-side.  Nothing wider than (long, long) ever
   shuffles.
 - Convergence in O(component diameter) rounds.  Near-dup graphs are
   near-cliques by construction (banded LSH emits most pairs of a duplicate
   group directly), so diameters are tiny; ``max_iter`` is a guard, not the
   expected round count.
 - Labels only ever decrease, so convergence is detectable from the exact
   label SUM (strictly decreasing until fixed point): one aggregate job
   per round that doubles as the action materializing the round's lazily
   checkpointed label set.  Superseded rounds' checkpoint blocks are
   released by the context cleaner as their DataFrames go out of scope —
   live footprint is a couple of label sets (2 longs per node), never the
   corpus.

The reference's dedup surface stops at A1-style latest-by-key
(sttm_to_flink_v21.py window dedup); component resolution is the
generalization a training-data pipeline needs downstream of pairing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    out_id: str = "doc_id",
    out_cluster: str = "cluster_id",
    max_iter: int = 25,
    pairs_distinct: bool = False,
) -> DataFrame:
    """Label every node of the pair graph with its component's min id.

    Output: one row per distinct node, (``out_id``, ``out_cluster``).
    Raises if propagation hasn't converged within ``max_iter`` rounds —
    an unconverged labeling silently under-merges clusters.

    Pass ``pairs_distinct=True`` when the producer already emits each
    (a, b) pair once (every pairing operator in this package does — they
    all end in DISTINCT): it skips a full shuffle-dedup of the edge list,
    the widest intermediate this operator touches.
    """
    half = pairs.select(
        F.col(a_col).cast("long").alias("src"),
        F.col(b_col).cast("long").alias("dst"),
    )
    # localCheckpoint (not persist): iterative plans grow a level of
    # union+join nesting per round, and Catalyst re-analyzes the FULL
    # lineage each round — exponential planning cost long before any
    # executor breaks a sweat.  Checkpointing materializes the rows AND
    # truncates the plan, keeping every round's analysis O(1).  On a real
    # cluster swap for reliable checkpoint(dir) if executor loss matters
    # mid-algorithm; results are identical.
    edges = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if not pairs_distinct:
        # multi-band producers COULD emit the same pair once per colliding
        # band; shrink the edge list once instead of re-joining duplicates
        # each round (the edge list is re-read every round).  The doubled
        # union itself never collides (src<dst vs src>dst), so distinct
        # pairs need no re-dedup here.
        edges = edges.distinct()
    # Lazy checkpoints throughout: each round's single convergence-probe
    # job materializes them — no extra blocking jobs.
    edges = edges.localCheckpoint(eager=False)
    # Seed labels with min(self, neighbors) — the first propagation round
    # fused into label construction: the groupBy that would otherwise just
    # collect the distinct node set computes the round-1 min at the same
    # shuffle cost, saving one full join round.  For the near-clique
    # components dedup pairing produces (every node adjacent to the min),
    # this seed IS the fixed point and the loop only runs the convergence
    # probe.
    labels = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.min(F.least("src", "dst")).alias("lbl"))
        .localCheckpoint(eager=False)
    )
    # Labels only ever DECREASE (new = min over self + neighbors), so the
    # label sum strictly decreases until convergence and the probe is one
    # exact aggregate — ONE job per round that doubles as the action
    # materializing the round's checkpoint, instead of a join + count.
    # DECIMAL(38) keeps the sum exact at any node count / id magnitude.
    prev_sum = labels.agg(
        F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]
    for _ in range(max_iter):
        prop = edges.join(labels, F.col("src") == F.col("node")).select(
            F.col("dst").alias("node"), F.col("lbl")
        )
        new = (
            prop.unionByName(labels)  # keep own label in the min
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
        new_sum = new.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        labels = new
        if new_sum == prev_sum:
            return labels.select(
                F.col("node").alias(out_id), F.col("lbl").alias(out_cluster)
            )
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "raise max_iter (component diameter exceeds it)"
    )


def select_cluster_representatives(
    labels: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "q",
) -> DataFrame:
    """One representative per near-dup cluster: the member with the MAX
    score (ties -> lowest id) — the quality-aware alternative to min-id
    when applying dedup (keep the longest / highest-quality copy, drop
    the rest).

    Scale: join labels to scores on id, then a ``max_by`` partial
    aggregation on (score, -id) — map-side combined, no window, no sort
    of cluster members.  Output: (``cluster_col``, rep_id).
    """
    j = labels.select(id_col, cluster_col).join(
        scores.select(id_col, score_col), id_col
    )
    return j.groupBy(cluster_col).agg(
        F.expr(
            f"max_by({id_col}, struct({score_col}, -{id_col}))"
        ).alias("rep_id")
    )


def cluster_size_stats(
    labels: DataFrame,
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Duplicate-cluster size histogram: (cluster_size, n_clusters) from a
    ``connected_components`` label frame — the dedup AUDIT view (how much
    of the corpus is 2-copies vs 1000-copy boilerplate) that decides cap
    and representative policy before anything is dropped.

    Two partial aggregations on narrow keys (cluster id, then size);
    output is histogram-sized.
    """
    sizes = labels.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
    )
