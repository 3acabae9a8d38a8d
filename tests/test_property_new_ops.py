"""Property-based tests for the round-5 sampling / funnel / rolling
operators: invariants that must hold for ANY input, with Spark results
cross-checked against independent driver-side recomputation.

Examples are deliberately few (each runs Spark jobs); the properties are
about structure (determinism, exact sizes, monotonicity, frame math), not
statistical behavior.
"""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row


# -- weighted_sample_priority ------------------------------------------------

@given(
    weights=st.lists(st.integers(min_value=0, max_value=50), min_size=5,
                     max_size=40),
    n=st.integers(min_value=1, max_value=10),
)
@settings(max_examples=8, deadline=None)
def test_weighted_sample_invariants(spark, weights, n):
    from confluent_data_ingestion_spark.operators.sampling import (
        weighted_sample_priority,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, w=w) for i, w in enumerate(weights)]
    )
    out = weighted_sample_priority(df, n, weight_col="w").collect()
    positive = [i for i, w in enumerate(weights) if w > 0]
    # exact size min(n, eligible); only positive-weight rows; no dup rows
    assert len(out) == min(n, len(positive))
    ids = [r["doc_id"] for r in out]
    assert len(set(ids)) == len(ids)
    assert set(ids) <= set(positive)
    # deterministic under repartitioning (assignment is key-pure)
    again = weighted_sample_priority(
        df.repartition(7), n, weight_col="w"
    ).collect()
    assert sorted(ids) == sorted(r["doc_id"] for r in again)


@given(
    weights=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.floats(min_value=0.05, max_value=10.0, allow_nan=False),
        min_size=1, max_size=4,
    ),
    budget=st.integers(min_value=1, max_value=10**6),
)
@settings(max_examples=8, deadline=None)
def test_mixture_plan_invariants(spark, weights, budget):
    from confluent_data_ingestion_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame(
        [Row(source=s, text="x " * (5 * (i + 1)))
         for i, s in enumerate(["a", "b", "c"])]
    )
    rows = mixture_plan(df, weights, budget_tokens=budget).collect()
    present = {"a", "b", "c"} & set(weights)
    assert {r["source"] for r in rows} == present
    wsum = sum(weights.values())
    for r in rows:
        # rate in (0, 1]; epochs = ceil(target/available) >= 1; target
        # proportional to the normalized weight
        assert 0.0 < r["rate"] <= 1.0
        assert r["epochs"] >= 1
        assert abs(r["target_tokens"]
                   - round(budget * weights[r["source"]] / wsum, 2)) < 0.011
        if r["rate"] < 1.0:
            assert r["epochs"] == 1          # over-supplied: single pass


# -- funnel_stages -----------------------------------------------------------

@given(
    events=st.lists(
        st.tuples(st.integers(min_value=1, max_value=5),        # user
                  st.integers(min_value=0, max_value=50),       # second
                  st.sampled_from(["view", "click", "purchase"])),
        min_size=1, max_size=40,
    )
)
@settings(max_examples=8, deadline=None)
def test_funnel_counts_monotone_and_match_bruteforce(spark, events):
    from datetime import datetime

    from confluent_data_ingestion_spark.operators.temporal import (
        funnel_stages,
    )

    rows = [Row(user_id=u, ts=datetime(2024, 1, 1, 0, 0, s), event_type=e)
            for u, s, e in events]
    out = {r["step"]: r["n_users"] for r in funnel_stages(
        spark.createDataFrame(rows), ["view", "click", "purchase"]
    ).collect()}
    assert out[1] >= out[2] >= out[3]          # funnel never widens

    # brute-force greedy per user must agree exactly
    from collections import defaultdict
    by_user = defaultdict(list)
    for u, s, e in events:
        by_user[u].append((s, e))
    steps = ["view", "click", "purchase"]
    reach = [0, 0, 0]
    for evs in by_user.values():
        stage, last = 0, None
        for s, e in sorted(evs):
            if stage < 3 and e == steps[stage] and (
                stage == 0 or s > last
            ):
                # strict ordering: equal timestamps cannot advance
                stage += 1
                last = s
                reach[stage - 1] += 1
    assert [out[1], out[2], out[3]] == reach


# -- rolling_stats -----------------------------------------------------------

@given(
    vals=st.lists(st.integers(min_value=-100, max_value=100), min_size=1,
                  max_size=25),
    w=st.integers(min_value=1, max_value=6),
)
@settings(max_examples=8, deadline=None)
def test_rolling_stats_matches_bruteforce(spark, vals, w):
    from datetime import datetime

    from confluent_data_ingestion_spark.operators.temporal import (
        rolling_stats,
    )

    rows = [Row(event_id=i, user_id=1, ts=datetime(2024, 1, 1, 0, 0, 0, i),
                value=float(v)) for i, v in enumerate(vals)]
    out = {r["event_id"]: r for r in rolling_stats(
        spark.createDataFrame(rows), window_rows=w
    ).collect()}
    for i in range(len(vals)):
        frame = vals[max(0, i - w + 1): i + 1]
        assert out[i]["roll_sum"] == float(sum(frame))
        assert out[i]["roll_n"] == len(frame)
        assert abs(out[i]["roll_avg"] - round(sum(frame) / len(frame), 6)) \
            < 1e-9


# -- empty-input robustness ---------------------------------------------------

def test_operators_tolerate_empty_input(spark):
    """A daily batch CAN be empty (holiday, upstream outage): every core
    operator must plan and return an empty (or identity) result, never
    raise."""
    from confluent_data_ingestion_spark.operators.cluster import (
        cluster_size_stats,
        connected_components,
    )
    from confluent_data_ingestion_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )
    from confluent_data_ingestion_spark.operators.sampling import (
        cap_per_group,
        mixture_plan,
        temperature_resample,
        weighted_sample_priority,
    )
    from confluent_data_ingestion_spark.operators.temporal import (
        funnel_stages,
        rolling_stats,
    )
    from confluent_data_ingestion_spark.operators.text import (
        bigram_logprob_score,
        collocation_pmi,
        quality_cutoff_filter,
        unigram_logprob_score,
    )

    docs = spark.createDataFrame([], "doc_id bigint, text string")
    assert exact_dedup(docs).count() == 0
    assert minhash_lsh_pairs(docs).count() == 0
    assert ngram_jaccard_pairs(docs).count() == 0
    assert simhash_pairs(docs).count() == 0
    assert unigram_logprob_score(docs).count() == 0
    assert bigram_logprob_score(docs).count() == 0
    assert collocation_pmi(docs).count() == 0

    pairs = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    labels = connected_components(pairs)
    assert labels.count() == 0
    assert cluster_size_stats(labels).count() == 0

    scored = spark.createDataFrame(
        [], "doc_id bigint, lang string, n_chars bigint"
    )
    assert quality_cutoff_filter(scored).count() == 0
    weighted = spark.createDataFrame([], "doc_id bigint, w bigint")
    assert weighted_sample_priority(weighted, 10, weight_col="w").count() == 0
    srcd = spark.createDataFrame([], "doc_id bigint, source string, text string")
    assert temperature_resample(srcd).count() == 0
    assert cap_per_group(srcd, mode="rate").count() == 0
    assert mixture_plan(srcd, {"a": 1.0}, budget_tokens=10).count() == 0

    ev = spark.createDataFrame(
        [], "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"
    )
    fun = {r["step"]: r["n_users"]
           for r in funnel_stages(ev, ["view", "click"]).collect()}
    assert fun == {1: 0, 2: 0}          # stage rows exist, all zero
    assert rolling_stats(ev).count() == 0


# -- RollupStore histogram quantiles ----------------------------------------

@given(
    vals=st.lists(
        st.floats(min_value=-4.0, max_value=20.0, allow_nan=False,
                  allow_infinity=False),
        min_size=1, max_size=60,
    ),
    split=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=6, deadline=None)
def test_hist_quantile_merge_invariance_and_bound(spark, tmp_path_factory,
                                                  vals, split):
    """For ANY data and ANY batch split: (a) the incrementally-merged
    histogram state equals the one-shot state (merge associativity), and
    (b) the interpolated p50 sits within one bin width of the band of
    rank-consistent empirical medians whenever all values are inside the
    histogram bounds.  The band is [lower-method, higher-method]: a
    histogram only knows counts per bin, so it can pin down the bin of a
    rank-r order statistic (one-bin-width accuracy) but can never
    reproduce cross-value interpolation — numpy's default linear p50 of
    [0.0, 9.0] is 4.5, farther than one bin width from EVERY
    count-consistent estimate."""
    import numpy as np

    from confluent_data_ingestion_spark.streaming.rollup import RollupStore

    lo, hi, nb = 0.0, 16.0, 8
    w = (hi - lo) / nb
    base = tmp_path_factory.mktemp("histprop")
    rows = [Row(g="x", v=float(v)) for v in vals]

    inc = RollupStore(str(base / "inc"), ["g"], hist_cols={"v": (lo, hi, nb)})
    chunks = [rows[i::split] for i in range(split)]
    for i, ch in enumerate(c for c in chunks if c):
        inc.apply(spark.createDataFrame(ch, "g string, v double"), batch_id=i)
    one = RollupStore(str(base / "one"), ["g"], hist_cols={"v": (lo, hi, nb)})
    one.apply(spark.createDataFrame(rows, "g string, v double"), batch_id=0)

    got_inc = inc.snapshot(spark).collect()[0].asDict()
    got_one = one.snapshot(spark).collect()[0].asDict()
    assert got_inc == got_one  # merge order is invisible

    if all(lo <= v < hi for v in vals):
        arr = np.array(vals)
        q_lo = float(np.quantile(arr, 0.5, method="lower"))
        q_hi = float(np.quantile(arr, 0.5, method="higher"))
        assert q_lo - w - 1e-9 <= got_inc["p50_v"] <= q_hi + w + 1e-9


# -- DSIR importance weights -------------------------------------------------

def test_dsir_weights_rank_target_like_docs_higher(spark):
    """Docs sharing the target subset's vocabulary must outscore docs
    from a disjoint vocabulary, scores are deterministic across runs,
    and every raw doc gets exactly one row."""
    from pyspark.sql import Row

    from confluent_data_ingestion_spark.operators.sampling import dsir_weights

    med = [Row(doc_id=i, text="dose patient trial clinical dose result")
           for i in range(1, 5)]
    web = [Row(doc_id=i, text="click here buy now free offer click")
           for i in range(10, 16)]
    mixed = [Row(doc_id=20, text="patient trial click here")]
    raw = spark.createDataFrame(med + web + mixed)
    target = spark.createDataFrame(med[:2])  # target = medical-ish

    out = {r["doc_id"]: r for r in dsir_weights(raw, target).collect()}
    assert set(out) == {r["doc_id"] for r in med + web + mixed}
    med_scores = [out[i]["dsir_weight"] for i in range(1, 5)]
    web_scores = [out[i]["dsir_weight"] for i in range(10, 16)]
    assert min(med_scores) > max(web_scores)
    # the mixed doc lands strictly between the two blocks
    assert max(web_scores) < out[20]["dsir_weight"] < min(med_scores)
    # deterministic: a second run reproduces every score exactly
    again = {r["doc_id"]: r["dsir_weight"]
             for r in dsir_weights(raw, target).collect()}
    assert again == {k: v["dsir_weight"] for k, v in out.items()}
    # n_feats = unigrams + bigrams per occurrence
    assert out[20]["n_feats"] == 4 + 3


# -- scrub_boilerplate -------------------------------------------------------

@given(
    texts=st.lists(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(12)]),
            min_size=1, max_size=50,
        ).map(" ".join),
        min_size=1, max_size=8, unique=True,
    ),
)
@settings(max_examples=6, deadline=None)
def test_scrub_boilerplate_reassembly_invariants(spark, texts):
    """For ANY corpus: (a) with min_docs above the corpus size nothing is
    boilerplate and reassembly reproduces every document verbatim (token
    join is lossless); (b) with min_docs=2, surviving text is each doc's
    chunk subsequence in order and dropped+kept counts sum to n_chunks."""
    from pyspark.sql import Row

    from confluent_data_ingestion_spark.operators.dedup import (
        scrub_boilerplate,
    )

    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows)

    untouched = scrub_boilerplate(df, chunk_tokens=5,
                                  min_docs=len(texts) + 1).collect()
    assert {r["doc_id"]: r["text_clean"] for r in untouched} == {
        i: t for i, t in enumerate(texts)
    }
    assert all(r["n_dropped"] == 0 for r in untouched)

    # exact driver-side truth: a chunk is boilerplate iff it appears in
    # >= 2 DISTINCT docs; clean text is the in-order join of survivors
    from collections import defaultdict

    occ = defaultdict(set)
    chunks_by_doc = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        cs = [" ".join(toks[j:j + 5]) for j in range(0, len(toks), 5)]
        chunks_by_doc[i] = cs
        for c in cs:
            occ[c].add(i)

    scrubbed = scrub_boilerplate(df, chunk_tokens=5, min_docs=2).collect()
    assert len(scrubbed) == len(texts)
    for r in scrubbed:
        cs = chunks_by_doc[r["doc_id"]]
        assert r["n_chunks"] == len(cs)
        assert r["n_dropped"] == sum(1 for c in cs if len(occ[c]) >= 2)
        assert r["text_clean"] == " ".join(
            c for c in cs if len(occ[c]) < 2
        )


@given(
    ids=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1, max_size=60, unique=True,
    ),
    lookups=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1, max_size=8,
    ),
    num_bits=st.sampled_from([64, 1 << 10, 1 << 16]),
)
@settings(max_examples=8, deadline=None)
def test_bloom_skipscan_never_loses_rows(spark, tmp_path_factory, ids,
                                         lookups, num_bits):
    """One-sidedness under arbitrary ids, lookup values (present, absent,
    negative), and bloom sizes down to a fully saturated 64-bit filter:
    bloom_skip_scan must equal the plain filter exactly — skipping can
    only change which files are OPENED, never the rows returned."""
    from pyspark.sql import functions as F

    from confluent_data_ingestion_spark.operators.skipping import (
        bloom_skip_scan,
    )

    d = str(tmp_path_factory.mktemp("bloomprop") / "t")
    spark.createDataFrame(
        [(i, i % 7) for i in ids], "event_id long, g long"
    ).repartition(3).write.parquet(d)
    got = sorted(
        r["event_id"]
        for r in bloom_skip_scan(
            spark, d, "event_id", lookups, num_bits=num_bits, num_hashes=3
        ).collect()
    )
    want = sorted(
        r["event_id"]
        for r in spark.read.parquet(d)
        .filter(F.col("event_id").isin(lookups)).collect()
    )
    assert got == want


# -- round-13: salted join losslessness ---------------------------------------

@given(
    left_keys=st.lists(st.integers(min_value=-2, max_value=5), min_size=1,
                       max_size=40),
    right_keys=st.lists(st.integers(min_value=0, max_value=5), min_size=0,
                        max_size=10),
    n_salt=st.sampled_from([1, 3, 8]),
    how=st.sampled_from(["inner", "left"]),
)
@settings(max_examples=8, deadline=None)
def test_salted_join_equals_plain_join(spark, left_keys, right_keys, n_salt,
                                       how):
    """Salting must be invisible in the RESULT for any key histogram
    (including planted hot keys, unmatched lefts, empty rights): only
    the partition histogram may change."""
    from confluent_data_ingestion_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [Row(k=k, lv=i) for i, k in enumerate(left_keys)]
    )
    right = spark.createDataFrame(
        [Row(k=k, rv=k * 10 + j) for j, k in enumerate(right_keys)],
        "k bigint, rv bigint",
    ) if right_keys else spark.createDataFrame([], "k bigint, rv bigint")
    got = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in salted_join(left, right, ["k"], how=how,
                             n_salt=n_salt).collect()
    )
    want = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in left.join(right, "k", how).select("k", "lv", "rv").collect()
    )
    assert got == want


# -- round-13: temporal holdout invariants ------------------------------------

@given(
    sizes=st.lists(st.integers(min_value=1, max_value=12), min_size=1,
                   max_size=6),
    frac=st.sampled_from([0.5, 0.8]),
)
@settings(max_examples=8, deadline=None)
def test_temporal_holdout_invariants(spark, sizes, frac):
    """For any entity-size histogram: per-entity train count is exactly
    max(floor(n*frac), 1), no test row precedes a train row, and the
    assignment is stable under repartitioning."""
    from confluent_data_ingestion_spark.operators.sampling import (
        temporal_holdout_split,
    )

    rows = [
        Row(u=u, t=(i * 7919) % 97, eid=u * 1000 + i)
        for u, n in enumerate(sizes) for i in range(n)
    ]
    df = spark.createDataFrame(rows)
    out = temporal_holdout_split(df, "u", "t", "eid", train_frac=frac)
    per = {}
    for r in out.collect():
        per.setdefault(r["u"], []).append((r["t"], r["eid"], r["split"]))
    for u, items in per.items():
        n = len(items)
        train = [(t, e) for t, e, s in items if s == "train"]
        test = [(t, e) for t, e, s in items if s == "test"]
        assert len(train) == max(int(n * frac), 1)
        if test:
            assert max(train) <= min(test)  # (t, eid) order: no leakage
    again = temporal_holdout_split(
        df.repartition(5), "u", "t", "eid", train_frac=frac
    ).collect()
    assert sorted((r["eid"], r["split"]) for r in again) == sorted(
        (r["eid"], r["split"])
        for r in out.collect()
    )


# -- round-13: majority vote column-order invariance ---------------------------

@given(
    votes=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", None]),
                  st.sampled_from(["a", "b", None]),
                  st.sampled_from(["a", "c", None])),
        min_size=1, max_size=25,
    ),
)
@settings(max_examples=8, deadline=None)
def test_majority_label_column_order_invariant(spark, votes):
    """The resolved label must not depend on annotator column ORDER
    (ties break on the label value, never on which column voted) and
    votes must sum to the non-null count."""
    from confluent_data_ingestion_spark.operators.labels import majority_label

    df = spark.createDataFrame(
        [(i, a, b, c) for i, (a, b, c) in enumerate(votes)],
        "item long, x string, y string, z string",
    )
    r1 = {
        r["item"]: (r["label"], r["votes"], r["n_votes"])
        for r in majority_label(df, "item", ["x", "y", "z"]).collect()
    }
    r2 = {
        r["item"]: (r["label"], r["votes"], r["n_votes"])
        for r in majority_label(df, "item", ["z", "x", "y"]).collect()
    }
    assert r1 == r2
    for i, (a, b, c) in enumerate(votes):
        nn = sum(v is not None for v in (a, b, c))
        if nn == 0:
            assert i not in r1
        else:
            assert r1[i][2] == nn
