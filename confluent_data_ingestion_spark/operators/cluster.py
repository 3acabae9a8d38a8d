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
    algorithm: str = "label",
    stats: dict | None = None,
    collect_bound: int = 0,
) -> DataFrame:
    """Label every node of the pair graph with its component's min id.

    Output: one row per distinct node, (``out_id``, ``out_cluster``).
    Raises if propagation hasn't converged within ``max_iter`` rounds —
    an unconverged labeling silently under-merges clusters.

    Pass ``pairs_distinct=True`` when the producer already emits each
    (a, b) pair once (every pairing operator in this package does — they
    all end in DISTINCT): it skips a full shuffle-dedup of the edge list,
    the widest intermediate this operator touches.

    ``algorithm`` picks the round structure (identical results):

    - ``"label"`` (default): min-label propagation — ONE join + ONE min
      agg per round, converging in O(component diameter) rounds.  Right
      for the near-clique components dedup pairing produces (banded LSH
      emits most pairs of a duplicate group directly, diameter ~1-2).
    - ``"star"``: alternating large-star/small-star contraction (Kiveris
      et al., "Connected Components in MapReduce and Beyond", public
      method) — TWO join+agg phases per round but O(log n) rounds
      regardless of diameter.  Right for chain-shaped graphs (e.g.
      incremental near-dup drift A~B~C~...) where label propagation
      needs O(n) rounds.

    ``stats``, when a dict, receives ``{"rounds": <rounds run>}`` —
    observability for tuning the algorithm choice.
    """
    if algorithm not in ("label", "star"):
        raise ValueError(f"algorithm must be 'label' or 'star', got {algorithm!r}")
    if collect_bound:
        # Opt-in bounded driver path for callers whose pair list is
        # already known to be tiny (e.g. the checkpointed dedup family
        # artifacts): probe up to collect_bound + 1 edges; under the
        # bound, a driver union-find labels each node with its
        # component's exact min id — the identical output, with zero
        # iterative rounds/checkpoint jobs.  Over the bound the
        # distributed rounds below run unchanged.
        head = pairs.select(
            F.col(a_col).cast("long").alias("a"),
            F.col(b_col).cast("long").alias("b"),
        ).take(collect_bound + 1)
        if len(head) <= collect_bound:
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                r = x
                while parent[r] != r:
                    r = parent[r]
                while parent[x] != r:
                    parent[x], x = r, parent[x]
                return r

            for row in head:
                a, b = row["a"], row["b"]
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    # union by min id so the root IS the component min
                    if ra < rb:
                        parent[rb] = ra
                    else:
                        parent[ra] = rb
            if stats is not None:
                stats["rounds"] = 0
            return pairs.sparkSession.createDataFrame(
                [(n, find(n)) for n in parent],
                f"{out_id} long, {out_cluster} long",
            )
    if algorithm == "star":
        return _cc_two_phase_star(
            pairs, a_col, b_col, out_id, out_cluster, max_iter,
            pairs_distinct, stats,
        )
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
    for _round in range(max_iter):
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
            if stats is not None:
                stats["rounds"] = _round + 1
            return labels.select(
                F.col("node").alias(out_id), F.col("lbl").alias(out_cluster)
            )
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "raise max_iter (component diameter exceeds it) or use "
        "algorithm='star' (O(log n) rounds at any diameter)"
    )


def _cc_two_phase_star(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    out_id: str,
    out_cluster: str,
    max_iter: int,
    pairs_distinct: bool,
    stats: dict | None,
) -> DataFrame:
    """Alternating large-star / small-star contraction (Kiveris et al.).

    Each round rewires the edge list toward per-component stars:

    - Large-star: per node u with undirected neighborhood Γ(u) and
      m = min(Γ(u) ∪ {u}), emit edge (v, m) for every v ∈ Γ(u), v > u —
      strictly-larger neighbors re-attach to the local minimum.
    - Small-star: orient every edge big→small; per center u with (all
      smaller) neighbors Γ(u) and m = min(Γ(u)), emit (v, m) for every
      v ∈ Γ(u) plus (u, m) — the center and its smaller neighbors all
      attach to the minimum.

    At the fixed point every component is a star rooted at its min id,
    reached in O(log n) rounds regardless of diameter.  Each phase is
    one min-aggregation plus one equi-join on 8-byte node ids — nothing
    wider than (long, long) shuffles, same as label propagation; the
    premium is 2 joins + 2 aggs per round instead of 1 + 1, bought back
    exponentially on high-diameter graphs.

    Convergence probe: the edge set is literally unchanged at the fixed
    point, so (count, xxhash64-sum) detects it in one scalar aggregate
    job — the same one that materializes the rounds' lazy checkpoints.
    A false match would need a 128-bit checksum collision between
    probed rounds (negligible; and the probe never affects emitted
    labels, only when iteration stops — the fixed point itself is
    stable under extra rounds).  The probe fires every SECOND round,
    switching to EVERY round in the last three before the iteration
    cap: locally each probe is a driver round-trip and on a cluster it
    is a full job barrier, so halving the probe count halves the
    scheduling floor of a deep contraction; the price is at most one
    redundant round of (long, long) rewiring after the fixed point,
    which the checkpoint cadence (lineage never deeper than two rounds)
    keeps cheap.  The per-round cap region exists because skip-then-
    probe detection trails convergence by up to two rounds: a graph
    that converges using its full ``max_iter`` budget must not raise
    just because its no-change round landed on a skipped probe —
    size ``max_iter`` for the contraction depth alone, not for probe
    cadence.
    """
    from pyspark.sql import Window

    half = pairs.select(
        F.col(a_col).cast("long").alias("src"),
        F.col(b_col).cast("long").alias("dst"),
    )
    if not pairs_distinct:
        half = half.distinct()
    # node inventory up front (BEFORE dropping self-pairs, which still name
    # a node): star rounds drop already-settled roots from the edge list's
    # left column, so the final label frame is rebuilt against the ORIGINAL
    # node set
    nodes = (
        half.select(F.col("src").alias("node"))
        .unionByName(half.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    edges = half.filter(F.col("src") != F.col("dst")).localCheckpoint(eager=False)

    def _checksum(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    # Each phase is ONE window pass (exchange + sort on the 8-byte center
    # key) with a per-row emission rule — no join, no aggregation exchange,
    # no per-phase distinct (r17 rewrite; the groupBy+join formulation this
    # replaces spent 3 exchanges and a join per phase for the identical
    # edge SET).  Row-count invariant: large-star emits exactly one row per
    # undirected edge instance (of (u,v),(v,u) exactly the dst>src one
    # fires, and dst > src >= m rules out self-loops), small-star maps each
    # input row to exactly one output row — so the per-round shuffle is
    # bounded by the ORIGINAL edge count forever and skipping the
    # duplicate-collapse cannot compound.  Duplicate instances ride along
    # without affecting any window min (min is multiplicity-blind), reach
    # the same fixed point in the same rounds, and evolve deterministically
    # per-instance, so the multiset checksum probe still detects the fixed
    # point exactly.
    per_src = Window.partitionBy("src")
    prev = _checksum(edges)
    cur = prev
    for _round in range(max_iter):
        # -- large-star: m = min(Γ(u) ∪ {u}) via least(src,dst); every
        # strictly-larger neighbor re-attaches to m.  Output rows (v, m)
        # always satisfy v > m, so the small-star phase's big→small
        # orientation is already established and its projection vanishes.
        und = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        ls = (
            und.withColumn("m", F.min(F.least("src", "dst")).over(per_src))
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        # -- small-star: center u with (all smaller) neighbors Γ(u),
        # m = min(Γ(u)): each neighbor row (u, v) emits (v, m), except the
        # row(s) attaining the minimum, which emit the center's own
        # attachment (u, m) — same set as "rewire all + union centers"
        # with the self-loop filter, in one projection.
        sm = F.min("dst").over(per_src)
        edges = (
            ls.select(
                F.when(F.col("dst") == sm, F.col("src"))
                .otherwise(F.col("dst"))
                .alias("new_src"),
                sm.alias("new_dst"),
            )
            .select(
                F.col("new_src").alias("src"), F.col("new_dst").alias("dst")
            )
            .localCheckpoint(eager=False)
        )
        if _round % 2 == 0 and _round < max_iter - 3:
            continue  # probe every second round; every round near the cap
        cur = _checksum(edges)
        if cur == prev:
            if stats is not None:
                stats["rounds"] = _round + 1
            final = edges.groupBy(F.col("src").alias("node")).agg(
                F.min("dst").alias("lbl")
            )
            return (
                nodes.join(final, "node", "left")
                .select(
                    F.col("node").alias(out_id),
                    F.coalesce(F.col("lbl"), F.col("node")).alias(out_cluster),
                )
            )
        prev = cur
    raise RuntimeError(
        f"connected_components(star) did not converge in {max_iter} rounds"
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
