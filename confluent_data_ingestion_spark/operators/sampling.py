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


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    seed: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep a per-stratum fraction of rows, chosen purely by hashed key.

    ``fractions`` maps stratum value (compared as STRING) -> keep rate;
    strata not listed keep ``default_fraction``.  The hash covers
    (seed, stratum, key) so each stratum draws an INDEPENDENT uniform
    sample — hashing the key alone would reuse one permutation across
    strata, correlating which keys survive everywhere.

    The canonical rebalancing move for training mixes (downsample the
    dominant language/source, keep the rare ones whole): a single CASE
    per-row predicate — zero shuffle, scan speed, reproducible by any
    engine from the same md5 math.
    """
    for v, f in {**fractions, "__default__": default_fraction}.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {v!r} must be in [0, 1], got {f}")
    bucket = (
        f"substr(md5(concat('{seed}', '|', CAST({strata_col} AS STRING), "
        f"'|', CAST({key_col} AS STRING))), 1, 8)"
    )

    def keep(f: float) -> str:
        if f >= 1.0:
            return "TRUE"
        if f <= 0.0:
            return "FALSE"
        return f"{bucket} < '{_hex_cut(f)}'"

    cases = " ".join(
        f"WHEN CAST({strata_col} AS STRING) = '{v}' THEN {keep(f)}"
        for v, f in fractions.items()
    )
    expr = f"CASE {cases} ELSE {keep(default_fraction)} END"
    return df.filter(F.expr(expr))


def temperature_resample(
    df: DataFrame,
    strata_col: str = "source",
    key_col: str = "doc_id",
    alpha: float = 0.5,
    target_fraction: float = 0.5,
    seed: str = "",
) -> DataFrame:
    """Temperature-based corpus rebalancing: keep each stratum at a rate
    proportional to ``count^alpha`` (alpha<1 flattens the mix toward
    uniform — the multilingual-sampling temperature trick), scaled so the
    expected kept total is ``target_fraction`` of the corpus.

    rate(s) = min(1, target_total * w(s) / count(s)),
    w(s) = count(s)^alpha / sum_t count(t)^alpha — rounded to 6 decimals
    before the cutoff so IEEE accumulation-order differences between
    engines can't flip a row at the boundary.

    Row selection is the same engine-reproducible md5 cutoff as
    ``stratified_sample``, but compared NUMERICALLY (first 8 hex chars as
    an integer against floor(rate * 2^32)) because here the rates are
    data-derived in SQL, not Python-side literals.

    Scale shape: one tiny per-stratum count aggregation (map-side
    combined), broadcast of the stratum->rate table back onto the corpus,
    then a pure per-row hash predicate — the corpus itself never
    shuffles.
    """
    if not 0.0 < target_fraction <= 1.0:
        raise ValueError("target_fraction must be in (0, 1]")
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    counts = df.groupBy(F.col(strata_col).alias("__s__")).agg(
        F.count("*").alias("__n__")
    )
    tot = counts.agg(
        F.sum("__n__").alias("__tot__"),
        F.sum(F.pow(F.col("__n__").cast("double"), F.lit(alpha))).alias("__wsum__"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "__s__",
        F.expr(
            f"round(least(1.0d, ({target_fraction}d * __tot__) * "
            f"(pow(CAST(__n__ AS DOUBLE), {alpha}d) / __wsum__) / __n__), 6)"
        ).alias("__rate__"),
    )
    # coalesce: concat() NULLs out on a NULL stratum, which would silently
    # drop those rows at the cutoff compare — a NULL stratum is a stratum
    bucket = (
        f"CAST(conv(substr(md5(concat('{seed}', '|', "
        f"coalesce(CAST({strata_col} AS STRING), '<NULL>'), "
        f"'|', CAST({key_col} AS STRING))), 1, 8), 16, 10) AS BIGINT)"
    )
    return (
        # eqNullSafe: a NULL stratum is itself a stratum (the groupBy above
        # counts it) — a plain equality join would silently drop those rows
        df.join(F.broadcast(rates), F.col(strata_col).eqNullSafe(F.col("__s__")))
        .filter(F.expr(f"{bucket} < CAST(floor(__rate__ * 4294967296.0d) AS BIGINT)"))
        .drop("__s__", "__rate__")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str = "source",
    key_col: str = "doc_id",
    cap: int = 1000,
    mode: str = "exact",
    seed: str = "",
) -> DataFrame:
    """Bound each group's contribution to the corpus — the per-domain cap
    every web-scale training mix applies so a single crawl host cannot
    dominate.  Selection order within a group is the md5 hash of the key
    (a seeded uniform shuffle), never file order, so the kept subset is a
    fair sample of the group and reruns/repartitions keep the same rows.

     - ``mode="exact"``: keep EXACTLY min(cap, n) rows per group via
       ROW_NUMBER over (group, hash order).  One shuffle on the group
       key; a mega-group sorts in one task — fine for bounded group
       counts, wrong shape for web-host skew.
     - ``mode="rate"``: keep ~cap rows per group IN EXPECTATION via a
       per-group hash-cutoff rate = min(1, cap/n).  Same shape as
       ``temperature_resample``: a tiny per-group count agg (map-side
       combined) broadcast back, then a pure per-row predicate — the
       corpus NEVER shuffles and no group ever sorts in one task.  The
       scale path; cap deviation is O(sqrt(cap)).

    A NULL group is a group (null-safe join, '<NULL>' hash tag), matching
    ``stratified_sample`` / ``temperature_resample`` semantics.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    order_hash = (
        f"md5(concat('{seed}', '|', "
        f"coalesce(CAST({group_col} AS STRING), '<NULL>'), "
        f"'|', CAST({key_col} AS STRING)))"
    )
    if mode == "exact":
        from pyspark.sql import Window

        w = Window.partitionBy(group_col).orderBy(
            F.expr(order_hash).asc(), F.col(key_col).asc()
        )
        return (
            df.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") <= cap)
            .drop("__rn__")
        )
    if mode != "rate":
        raise ValueError(f"mode must be 'exact' or 'rate', got {mode!r}")
    counts = df.groupBy(F.col(group_col).alias("__g__")).agg(
        F.count("*").alias("__n__")
    )
    rates = counts.select(
        "__g__",
        F.expr(f"round(least(1.0d, {cap}d / __n__), 6)").alias("__rate__"),
    )
    bucket = (
        f"CAST(conv(substr({order_hash}, 1, 8), 16, 10) AS BIGINT)"
    )
    return (
        df.join(F.broadcast(rates), F.col(group_col).eqNullSafe(F.col("__g__")))
        .filter(F.expr(f"{bucket} < CAST(floor(__rate__ * 4294967296.0d) AS BIGINT)"))
        .drop("__g__", "__rate__")
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    epoch: int = 0,
    n_shards: int = 16,
    seed: str = "",
) -> DataFrame:
    """Deterministic per-epoch training order: every key gets a shard and
    an in-shard sort position, both pure functions of (seed, epoch, key) —
    a new epoch is a fresh uniform shuffle, and any engine can reproduce
    (and audit) the exact batch order from the key alone.

    The assignment is a zero-shuffle projection (two slices of one md5:
    hex chars 1-8 -> order, 9-12 -> shard).  Materializing the order is
    the writer's move:
    ``out.repartition(n_shards, 'shard')
    .sortWithinPartitions('shard', 'sort_key')`` — one partition-count-
    bounded shuffle and per-partition sorts, never a global orderBy.
    Sort by BOTH columns: hash partitioning can land several shards in
    one partition (murmur3 collisions are the norm at small n), and the
    shard prefix keeps each shard's rows contiguous there.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = (
        f"md5(concat('{seed}', '|', CAST({epoch} AS STRING), '|', "
        f"CAST({key_col} AS STRING)))"
    )
    return df.withColumn(
        "shard",
        F.expr(
            f"CAST(pmod(conv(substr({h}, 9, 4), 16, 10), {n_shards}) AS INT)"
        ),
    ).withColumn(
        "sort_key",
        F.expr(f"CAST(conv(substr({h}, 1, 8), 16, 10) AS BIGINT)"),
    )


def sample_exact_n(
    df: DataFrame,
    n: int,
    key_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Deterministic EXACT-size corpus sample: the n smallest seeded key
    hashes — a uniform sample that is stable under reruns, repartitioning,
    and row order, and reproducible by any auditing engine.

    Scale shape: Spark executes orderBy+limit as TakeOrderedAndProject —
    each partition keeps its local top-n heap and the driver merges n
    rows, so there is NO full-sort shuffle.  The merge is driver-side
    O(n): right for samples up to ~1M rows; for larger takes use
    ``hash_split`` fractions (distributed, approximate size) instead.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    h = f"md5(concat('{seed}', '|', CAST({key_col} AS STRING)))"
    return (
        df.withColumn("__h__", F.expr(h))
        .orderBy(F.col("__h__").asc(), F.col(key_col).asc())
        .limit(n)
        .drop("__h__")
    )


def weighted_sample_priority(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str = "doc_id",
    seed: str = "",
    priority_col: str = "priority",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep exactly
    ``n`` rows with inclusion odds proportional to ``weight_col`` — the
    quality-weighted corpus subset selection step ("sample the best 1M
    docs, long docs more likely") that uniform hash sampling can't do.

    Efraimidis–Spirakis priority sampling: each row draws a uniform
    u in (0, 1] (derived from md5 of the seeded key, so reruns /
    repartitions / other engines reproduce it bit-for-bit — never an RNG)
    and gets priority u^(1/w); the n largest priorities ARE a weighted
    sample without replacement.  Priorities are rounded to 6 decimals
    before ranking so IEEE pow() ulp differences between engines cannot
    reorder the cut; rounding ties break on the unrounded u descending
    (then key asc as the final total order).  Tie-breaking on u keeps
    the cut pseudo-random under heavy weights — for w >= ~1e4 the
    rounded u^(1/w) collapses onto few values, and a key-ordered
    tie-break there would systematically favor low keys.  u itself is
    exact (32-bit integer / 2^32), so it never ties except on true
    hash collisions.

    Scale shape: priority is a per-row projection (zero shuffle);
    orderBy+limit executes as TakeOrderedAndProject — per-partition
    top-n heaps, driver merges n rows, NO full-sort shuffle.  Driver
    merge is O(n): right up to ~1M rows, use rate-based operators above
    for larger takes.  Rows with NULL or non-positive weight are
    excluded (they carry no sampling mass).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    u = (
        f"(CAST(conv(substr(md5(concat('{seed}', '|', "
        f"CAST({key_col} AS STRING))), 1, 8), 16, 10) AS DOUBLE) + 1.0d)"
        f" / 4294967296.0d"
    )
    pr = (
        f"round(pow({u}, 1.0d / CAST({weight_col} AS DOUBLE)), 6)"
    )
    return (
        df.filter(F.expr(f"{weight_col} IS NOT NULL AND {weight_col} > 0"))
        .withColumn(priority_col, F.expr(pr))
        .withColumn("__u__", F.expr(u))
        .orderBy(
            F.col(priority_col).desc(),
            F.col("__u__").desc(),
            F.col(key_col).asc(),
        )
        .limit(n)
        .drop("__u__")
    )


def mixture_plan(
    df: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    group_col: str = "source",
    token_count_expr: str = "size(split(text, ' '))",
) -> DataFrame:
    """Domain-mixture planning: given target mixture ``weights`` per
    domain and a total token ``budget_tokens``, compute per-domain
    availability and the sampling rate / epoch count that realizes the
    mix — the planning step before ``stratified_sample`` /
    ``temperature_resample`` executes it.

    Per listed domain: ``n_tokens`` available, ``target_tokens`` =
    budget * weight / sum(weights), ``rate`` = min(1, target/available)
    (the keep-rate when the domain over-supplies) and ``epochs`` =
    ceil(target/available) (the repeat count when it under-supplies —
    the up-sampling knob for rare high-quality domains).  Rates round to
    6 decimals, targets to 2, so any engine reproduces the plan.

    Scale shape: one per-domain token-count aggregation (map-side
    combined, domain-count-sized output) joined to a literal weights
    frame — the corpus itself never shuffles and the result is
    dashboard-sized.  Domains absent from ``weights`` are excluded
    (weight 0); listed domains absent from the corpus yield no row —
    surface them upstream if a missing domain should be an error.
    """
    if budget_tokens < 1:
        raise ValueError("budget_tokens must be >= 1")
    if not weights:
        raise ValueError("weights must be non-empty")
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    # JVM-side VALUES literal, not createDataFrame: the weights are a few
    # rows of config, and Python->JVM frame conversion pays a multi-second
    # first-call serializer warmup that a literal plan never touches.
    # Config values are pasted into SQL, so escape for Spark's parser:
    # backslashes and quotes in keys (Spark string literals are
    # backslash-escaped), backticks in the pasted identifier.
    spark = df.sparkSession
    rows = ", ".join(
        "('"
        + str(k).replace("\\", "\\\\").replace("'", "\\'")
        + f"', CAST({float(v) / wsum!r} AS DOUBLE))"
        for k, v in weights.items()
    )
    gcol = group_col.replace("`", "``")
    wdf = spark.sql(
        f"SELECT * FROM (VALUES {rows}) AS t(`{gcol}`, __w__)"
    )
    avail = (
        df.groupBy(group_col)
        .agg(F.expr(f"sum(CAST(({token_count_expr}) AS BIGINT))").alias("n_tokens"))
    )
    return (
        avail.join(F.broadcast(wdf), group_col)
        .select(
            group_col,
            "n_tokens",
            F.expr(f"round({budget_tokens}d * __w__, 2)").alias("target_tokens"),
            F.expr(
                f"round(least(1.0d, {budget_tokens}d * __w__ "
                f"/ CAST(n_tokens AS DOUBLE)), 6)"
            ).alias("rate"),
            F.expr(
                f"CAST(ceil({budget_tokens}d * __w__ "
                f"/ CAST(n_tokens AS DOUBLE)) AS INT)"
            ).alias("epochs"),
        )
    )


def leakage_safe_split(
    df: DataFrame,
    labels: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Train/test split that hashes the near-dup CLUSTER label, not the
    document id: every member of a duplicate cluster lands in the same
    split, so near-duplicates never straddle train/test — the eval
    leakage a plain ``hash_split`` cannot prevent (two near-identical
    docs hash independently and can land on opposite sides).

    ``labels``: (id, cluster) from ``cluster.connected_components`` over
    any pairing operator.  Docs absent from ``labels`` (never paired)
    split by their own id, which is exactly the cluster-of-one case.

    Scale: one LEFT join against the labels frame (duplicate-doc sized,
    typically a small fraction of the corpus — AQE broadcasts it when it
    fits), then the same pure per-row md5 predicate as ``hash_split``.
    """
    lab = labels.select(
        F.col(id_col), F.col(cluster_col).alias("__cl__")
    )
    keyed = df.join(lab, id_col, "left").withColumn(
        "__skey__", F.coalesce(F.col("__cl__"), F.col(id_col))
    ).drop("__cl__")
    return hash_split(keyed, key_col="__skey__", fractions=fractions,
                      seed=seed, out_col=out_col).drop("__skey__")


def curriculum_plan(
    df: DataFrame,
    score_col: str,
    cuts: tuple[float, ...] = (0.25, 0.5, 0.75),
    *,
    out_col: str = "stage",
) -> DataFrame:
    """Curriculum staging: assign every row a stage 1..len(cuts)+1 by its
    ``score_col`` relative to the corpus's EXACT quantile cutpoints —
    easy-to-hard ordering for curriculum training schedules (stage 1 =
    lowest scores).

    Scale shape: the cutpoints are ONE exact-percentile aggregation
    collapsed to a single broadcast row (type R-7 interpolation — the
    definition DuckDB's ``quantile_cont`` shares, so any engine derives
    the same cutpoints bit-for-bit from the same data); the stage itself
    is a per-row CASE against those broadcast values.  No global window,
    no single-partition sort — the classic NTILE formulation would
    funnel the corpus through one reducer, this does not.

    Rows with NULL score get NULL stage.  Boundary rule: score <= cut
    goes to the lower stage (quantile_cont semantics make each stage's
    population approach len(cuts)+1-ile fractions on continuous scores;
    heavily tied scores skew stage sizes — by design, equal scores must
    land in the same stage).
    """
    if not cuts or list(cuts) != sorted(cuts):
        raise ValueError("cuts must be non-empty ascending fractions")
    aggs = [
        F.expr(
            f"round(percentile({score_col}, {c!r}d), 6)"
        ).alias(f"__c{i}__")
        for i, c in enumerate(cuts)
    ]
    cutrow = df.agg(*aggs)
    expr = "CASE "
    for i in range(len(cuts)):
        expr += f"WHEN {score_col} <= __c{i}__ THEN {i + 1} "
    expr += (
        f"WHEN {score_col} IS NOT NULL THEN {len(cuts) + 1} "
        "ELSE NULL END"
    )
    return (
        df.crossJoin(F.broadcast(cutrow))
        .withColumn(out_col, F.expr(expr).cast("int"))
        .drop(*[f"__c{i}__" for i in range(len(cuts))])
    )


def _dsir_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, bucket) per feature OCCURRENCE: whitespace unigrams plus
    adjacent-pair bigrams (bag semantics, not set), each hashed to one of
    256 buckets by its first two md5 hex digits — reproducible in any
    engine with md5."""
    t = f"split(coalesce({text_col}, ''), ' ')"
    feats = (
        f"concat({t}, CASE WHEN size({t}) >= 2 THEN "
        f"transform(sequence(1, size({t}) - 1), i -> "
        f"concat(element_at({t}, i), '_', element_at({t}, i + 1))) "
        f"ELSE CAST(array() AS array<string>) END)"
    )
    return df.select(
        F.col(id_col),
        F.explode(F.expr(feats)).alias("__f__"),
    ).select(
        id_col,
        F.expr(
            "CAST(conv(substr(md5(__f__), 1, 2), 16, 10) AS INT)"
        ).alias("__bkt__"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public paper): score
    every raw document by how target-like its hashed bag-of-ngrams is,

        weight(doc) = sum over feature occurrences f of
                      [ln p_target(bucket(f)) - ln p_raw(bucket(f))]

    where both distributions are add-``alpha``-smoothed bucket unigram
    models over the 256-bucket hashed feature space (unigrams +
    bigrams).  High weight = looks like the target corpus; resample the
    raw corpus by these weights (``weighted_sample_priority`` /
    ``sample_exact_n``) to select pretraining data matched to a small
    high-quality target set.

    Output: (``id_col``, n_feats, dsir_weight[round 6]) — one row per
    RAW document (docs with no features get weight 0).

    Scale shape: the two bucket models are 256-row aggregates (map-side
    combined); the scoring join BROADCASTS the 256-row log-ratio table
    onto the raw corpus's exploded features and sums per doc with one
    doc-key shuffle.  Nothing is ever per-pair; the model size is fixed
    regardless of corpus size.  The raw corpus's exploded features feed
    BOTH its bucket model and the scoring pass, so they are persisted
    once (``caching.track`` — released by the runtime's next
    ``release_caches()``) instead of re-tokenizing the corpus twice.
    """
    from ..caching import track
    from ..session import ensure_min_parallelism

    def model(feats: DataFrame, spark, name: str) -> DataFrame:
        cnt = feats.groupBy("__bkt__").agg(F.count(F.lit(1)).alias("c"))
        # dense 256-bucket frame so unseen buckets get the smoothed floor
        grid = spark.range(256).select(
            F.col("id").cast("int").alias("__bkt__")
        )
        return (
            grid.join(cnt, "__bkt__", "left")
            .select(
                "__bkt__",
                F.coalesce(F.col("c"), F.lit(0)).alias(f"c_{name}"),
            )
        )

    raw_feats = track(
        _dsir_features(ensure_min_parallelism(raw), id_col, text_col)
    )
    tm = model(_dsir_features(target, id_col, text_col), raw.sparkSession, "t")
    rm = model(raw_feats, raw.sparkSession, "r")
    llr = (
        tm.join(rm, "__bkt__")
        .select(
            "__bkt__",
            F.expr(
                f"ln((c_t + {alpha!r}) / (SUM(c_t) OVER () + {alpha!r} * 256)) - "
                f"ln((c_r + {alpha!r}) / (SUM(c_r) OVER () + {alpha!r} * 256))"
            ).alias("__llr__"),
        )
    )
    scored = (
        raw_feats.join(F.broadcast(llr), "__bkt__")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.sum("__llr__"), 6).alias("dsir_weight"),
        )
    )
    ids = raw.select(id_col).distinct()
    return (
        ids.join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_feats"), F.lit(0)).alias("n_feats"),
            F.coalesce(F.col("dsir_weight"), F.lit(0.0)).alias("dsir_weight"),
        )
    )


def temporal_holdout_split(
    df: DataFrame,
    entity_col: str,
    time_col: str,
    tiebreak_col: str,
    train_frac: float = 0.8,
    out_col: str = "split",
) -> DataFrame:
    """Per-entity TEMPORAL holdout: each entity's earliest
    ``train_frac`` of rows (by event time) become ``train``, the rest
    ``test`` — the split that evaluates FORECASTING generalization.  A
    hash split would let a user's later behavior leak into training
    while their earlier behavior sits in test; here, within every
    entity, no test row precedes a train row (ties on ``time_col``
    break on ``tiebreak_col``, so the boundary is deterministic across
    partitionings and engines).  Entities with a single row land in
    train (``floor`` of a positive fraction of 1 is 0 — guarded to 1:
    a one-row entity must not be test-only, that entity would be
    unseen at training time yet evaluated).

    Scale: one window over (entity) ordered by (time, tiebreak) — a
    single shuffle on the entity key, constant state per row; the
    count rides the same window (no second pass).
    """
    if not 0.0 < train_frac < 1.0:
        raise ValueError(f"train_frac must be in (0, 1), got {train_frac}")
    from pyspark.sql.window import Window

    w = Window.partitionBy(entity_col).orderBy(
        F.col(time_col).asc(), F.col(tiebreak_col).asc()
    )
    wc = Window.partitionBy(entity_col)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .withColumn("__n__", F.count(F.lit(1)).over(wc))
        .withColumn(
            out_col,
            F.when(
                F.col("__rn__")
                <= F.greatest(
                    F.floor(F.col("__n__") * F.lit(train_frac)),
                    F.lit(1),
                ),
                F.lit("train"),
            ).otherwise(F.lit("test")),
        )
        .drop("__rn__", "__n__")
    )


def doremi_reweight(
    doc_losses: DataFrame,
    group_col: str = "source",
    loss_col: str = "loss",
    eta: float = 1.0,
    smoothing: float = 0.2,
) -> DataFrame:
    """One DoReMi-style exponentiated-gradient reweighting step over a
    per-document proxy-loss table (Xie et al. 2023, "DoReMi: Optimizing
    Data Mixtures Speeds Up Language Model Pretraining" — public
    method): domains whose documents the proxy model finds HARD (excess
    loss over the easiest domain) get upweighted, then the weights are
    smoothed toward uniform so no domain starves.

      excess_d = avg_loss_d - min_d' avg_loss_d'
      w_d      ∝ exp(eta * excess_d)
      weight_d = (1 - smoothing) * w_d / Σ w + smoothing / n_domains

    The full DoReMi loop re-trains the proxy under each new mixture;
    this operator is the REWEIGHTING step given a loss table — run it
    per round with refreshed losses.  Output per domain:
    ``(group, n_docs, avg_loss, excess, weight)``.

    Determinism: per-document losses arrive 6-dp rounded (e.g.
    ``unigram_logprob_score``); per-domain means are exact DECIMAL sums
    divided once and rounded at 6 dp; each exp() result is rounded to
    12 dp and quantized before the normalizing sum, so engines agree
    bit-for-bit (the dawid_skene ln/exp contract).

    Scale shape: ONE aggregation from the doc-loss table to the
    domains-sized frame; everything after (min, exp, normalize, smooth)
    is a couple of single-partition windows over tens of rows —
    metadata work.  The doc-loss producer owns the corpus-scale cost.
    """
    from pyspark.sql import Window

    if not 0.0 <= smoothing < 1.0:
        raise ValueError("smoothing must be in [0, 1)")
    per = doc_losses.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.col(loss_col).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).cast("decimal(18,6)").alias("avg_loss"),
    )
    # domains-sized frame: single-partition windows are metadata work
    w_all = Window.partitionBy()
    per = per.withColumn(
        "excess", F.col("avg_loss") - F.min("avg_loss").over(w_all)
    ).withColumn(
        "__f__",
        F.round(
            F.exp(F.lit(eta) * F.col("excess").cast("double")), 12
        ).cast("decimal(20,12)"),
    )
    n_dom = F.count(F.lit(1)).over(w_all)
    w_raw = F.col("__f__").cast("double") / F.sum("__f__").over(w_all).cast(
        "double"
    )
    return per.select(
        F.col("grp").alias(group_col),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("avg_loss").cast("double").alias("avg_loss"),
        F.col("excess").cast("double").alias("excess"),
        F.round(
            F.lit(1.0 - smoothing) * w_raw + F.lit(smoothing) / n_dom, 6
        ).alias("weight"),
    )


def token_budget_waterfill(
    df: DataFrame,
    domain_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Allocate a global token budget across domains by waterfilling —
    the capped-mixture planner for "train on B tokens, no domain may
    contribute more than it has, small domains keep everything":
    every domain receives ``min(available_d, level)`` where the water
    level solves ``sum_d min(available_d, level) = budget``.  This is
    the max-min fair allocation (classic waterfilling, the same
    construction as network fair-share): no domain can gain tokens
    without taking them from a domain that got fewer.

    Input is document-level — ``df[domain_col, tokens_col]`` — and the
    first step is the per-domain exact token sum; pass a pre-aggregated
    (domain, tokens) frame and it degenerates to a cheap re-sum.

    Output per domain: (domain, tokens_available, tokens_alloc,
    capped, level) —

    * ``capped`` — the domain hit the water level (alloc = level,
      fractional); uncapped domains take everything they have.
    * ``tokens_alloc`` — exact available count for uncapped domains,
      floor-quantized level (6 dp) for capped ones; the caller rounds
      to whole tokens/documents as policy dictates.
    * ``level`` — the common water level (same value on every capped
      row; NULL when the budget covers the whole corpus and nothing
      is capped).

    If ``budget >= sum_d available_d`` every domain is uncapped and
    alloc = available.

    Scale shape: the document scan partial-aggregates to the domain
    alphabet map-side; everything after runs on the domain-count-sized
    frame (one ordered cumulative window over domains — metadata work,
    like the mixture_plan/doremi rows).  Determinism: the level is
    derived from exact integer prefix sums in one double division,
    floor-quantized — bit-identical across engines and partitionings.
    """
    from pyspark.sql import Window

    if budget < 0:
        raise ValueError("budget must be >= 0")
    dom = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(F.col(tokens_col).cast("bigint")).alias("avail")
    )
    # ordered scan over the domain alphabet: ascending availability.
    # For the i-th domain (1-based) the candidate level assumes domains
    # 1..i-1 are fully allocated and the rest share the remainder:
    #   level_i = (budget - prefix_{i-1}) / (n - i + 1)
    # the TRUE level is level_i of the FIRST position where
    # level_i <= avail_i (before that, the domain fits under the
    # water); if no position qualifies the budget covers everything.
    w = Window.orderBy(F.col("avail").asc(), F.col("domain").asc())
    wall = Window.partitionBy()
    staged = dom.select(
        "domain",
        "avail",
        F.row_number().over(w).alias("rn"),
        (F.sum("avail").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - F.col("avail")).alias("prefix"),
        (F.count(F.lit(1)).over(wall)
         - F.row_number().over(w) + F.lit(1)).alias("rest"),
    ).withColumn(
        "cand",
        (F.lit(float(budget)) - F.col("prefix").cast("double"))
        / F.col("rest"),
    )
    # the FIRST qualifying position carries the true level (ascending
    # avail makes cand_j > avail_j for every earlier j, see above);
    # later candidates assume capped domains took their FULL counts and
    # are garbage — never aggregate over them
    # STRICT '<': when the budget exactly covers the corpus the last
    # position has cand == avail — nothing is truly capped there, so
    # it must NOT qualify (level stays NULL, matching the docstring).
    # When cand_i == avail_i mid-scan, position i+1 recomputes the
    # SAME level ((budget - prefix_i)/(n-i) = avail_i exactly — integer
    # prefix sums are exact in double), so strictness never loses a
    # genuinely-capped level, only the exact-cover phantom.
    first_q = F.min(
        F.when(
            F.col("cand") < F.col("avail").cast("double"), F.col("rn")
        )
    ).over(wall)
    level = F.max(
        F.when(F.col("rn") == first_q, F.col("cand"))
    ).over(wall)
    q6 = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(  # noqa: E731
        1000000.0
    )
    out = staged.withColumn("__lvl__", level).select(
        "domain",
        F.col("avail").cast("bigint").alias("tokens_available"),
        F.when(
            F.col("__lvl__").isNotNull()
            & (F.col("avail").cast("double") > F.col("__lvl__")),
            q6(F.col("__lvl__")),
        ).otherwise(F.col("avail").cast("double")).alias("tokens_alloc"),
        (
            F.col("__lvl__").isNotNull()
            & (F.col("avail").cast("double") > F.col("__lvl__"))
        ).alias("capped"),
        q6(F.col("__lvl__")).alias("level"),
    )
    return out


def group_kfold(
    df: DataFrame,
    group_col: str,
    k: int = 5,
    seed: str = "",
    out_col: str = "fold",
) -> DataFrame:
    """Group-atomic k-fold assignment for cross-validation — every row
    of a group lands in the SAME fold (scikit-learn's GroupKFold
    contract, public method), so entity-level leakage across folds is
    impossible by construction: a user's events, a document's chunks, a
    near-dup cluster's members never straddle a train/validation
    boundary.

    Fold = which of k equal slices of the md5 hex space the group's
    hash prefix falls in (the same engine-portable
    ``substr(md5(seed|group)), 1, 8)`` idiom as :func:`hash_split`) —
    a pure per-row projection: zero shuffles, zero joins, zero state,
    deterministic under reruns, repartitioning, and engine choice.
    Folds are ~equal in GROUPS (not rows); heavily skewed group sizes
    skew row counts exactly as GroupKFold's contract implies.

    Output: ``df`` plus ``out_col`` (int in [0, k)).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    bucket = _bucket_expr(group_col, seed)
    cases = " ".join(
        f"WHEN {bucket} < '{_hex_cut((i + 1) / k)}' THEN {i}"
        for i in range(k - 1)
    )
    return df.withColumn(
        out_col, F.expr(f"CASE {cases} ELSE {k - 1} END").cast("int")
    )
