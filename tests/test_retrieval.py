"""BM25 retrieval (operators/retrieval.py): hand-computed scores on a
planted corpus, rank determinism, empty-token hygiene, and the index-
artifact contract (df/avgdl/n_docs live in the index, not the scorer)."""

import math

import pytest

from confluent_data_ingestion_spark.operators.retrieval import (
    bm25_index,
    bm25_topk,
)

K1, B = 1.2, 0.75


def _bm25(tf, df, n, dl, avgdl):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return round(idf * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl)), 6)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "x x y"),       # dl 3
            (2, "x z"),         # dl 2
            (3, "y y y z"),     # dl 4
        ],
        "doc_id long, text string",
    )


def test_bm25_hand_computed(spark, corpus):
    idx = bm25_index(corpus)
    q = spark.createDataFrame([(0, "x"), (0, "y")], "query_id long, term string")
    out = {r["doc_id"]: r for r in bm25_topk(idx, q, k=10).collect()}
    avgdl = 3.0  # (3 + 2 + 4) / 3
    # doc 1: x tf=2 df=2, y tf=1 df=2, dl=3
    exp1 = round(_bm25(2, 2, 3, 3, avgdl) + _bm25(1, 2, 3, 3, avgdl), 6)
    assert out[1]["score"] == pytest.approx(exp1, abs=1e-9)
    # doc 3: y tf=3 df=2, dl=4
    exp3 = _bm25(3, 2, 3, 4, avgdl)
    assert out[3]["score"] == pytest.approx(exp3, abs=1e-9)
    assert {r for r in out} == {1, 2, 3}


def test_bm25_index_carries_corpus_stats(spark, corpus):
    """df/n_docs/avgdl are index outputs (corpus statistics computed once
    at build time — the round-10 review found scoring re-aggregating the
    full postings table for df; this pins the artifact contract)."""
    idx = bm25_index(corpus)
    assert idx.n_docs == 3
    assert idx.avgdl == pytest.approx(3.0)
    assert {r["term"]: r["df"] for r in idx.df.collect()} == {
        "x": 2, "y": 2, "z": 2,
    }


def test_bm25_scoring_plan_has_no_corpus_aggregation(spark, corpus):
    """The scoring plan aggregates only (query_id, doc_id) groups — a
    groupBy on the bare term key would mean df is being recomputed from
    the full postings per call."""
    idx = bm25_index(corpus)
    q = spark.createDataFrame([(0, "x")], "query_id long, term string")
    plan = bm25_topk(idx, q, k=5)._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if line.strip().startswith("Aggregate"):
            keys = line.split("]", 1)[0]
            assert not (
                "term" in keys and "id" not in keys and "query_id" not in keys
            ), f"corpus-wide per-term aggregation in scoring plan: {line}"


def test_bm25_rank_and_tiebreak(spark, corpus):
    idx = bm25_index(corpus)
    # docs 1 and 2 both contain "x" once... doc1 has tf=2; use "z" where
    # docs 2 and 3 differ only in dl -> deterministic rank check
    q = spark.createDataFrame([(7, "z")], "query_id long, term string")
    rows = bm25_topk(idx, q, k=10).collect()
    ranks = [(r["rank"], r["doc_id"]) for r in sorted(rows, key=lambda r: r["rank"])]
    # doc 2 (dl=2, shorter) outranks doc 3 (dl=4) at equal tf
    assert ranks == [(1, 2), (2, 3)]


def test_bm25_k_truncates(spark, corpus):
    idx = bm25_index(corpus)
    q = spark.createDataFrame([(0, "x"), (0, "y"), (0, "z")],
                              "query_id long, term string")
    rows = bm25_topk(idx, q, k=1).collect()
    assert len(rows) == 1 and rows[0]["rank"] == 1


def test_bm25_empty_tokens_ignored(spark):
    docs = spark.createDataFrame([(1, "a  b "), (2, "b")],
                                 "doc_id long, text string")
    idx = bm25_index(docs)
    assert {r["term"] for r in idx.postings.collect()} == {"a", "b"}
    assert {r["id"]: r["dl"] for r in idx.doclen.collect()} == {1: 2, 2: 1}


def test_qlik_hand_computed(spark, corpus):
    """Dirichlet query-likelihood (rank-equivalent form) on the planted
    corpus: C = 9 total tokens, cf(x)=3, cf(y)=4, mu=100."""
    from confluent_data_ingestion_spark.operators.retrieval import lm_qlik_topk

    idx = bm25_index(corpus)
    assert idx.total_tokens == 9
    q = spark.createDataFrame([(0, "x"), (0, "y")], "query_id long, term string")
    out = {r["doc_id"]: r for r in lm_qlik_topk(idx, q, k=10, mu=100.0).collect()}

    def ql(dl, hits):  # hits: list of (tf, cf)
        base = round(-2 * math.log(dl + 100.0), 6)
        return round(
            base + sum(round(math.log(1 + tf / (100.0 * cf / 9.0)), 6)
                       for tf, cf in hits),
            6,
        )

    assert out[1]["score"] == pytest.approx(ql(3, [(2, 3), (1, 4)]), abs=1e-9)
    assert out[2]["score"] == pytest.approx(ql(2, [(1, 3)]), abs=1e-9)
    assert out[3]["score"] == pytest.approx(ql(4, [(3, 4)]), abs=1e-9)
    # no-hit docs never appear (candidates = matching docs only)
    assert set(out) == {1, 2, 3}


def test_rrf_fuse_hand_computed(spark):
    from confluent_data_ingestion_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2)], "query_id long, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(0, 2, 1), (0, 3, 2)], "query_id long, doc_id long, rank int"
    )
    rows = sorted(
        rrf_fuse([a, b], k=10, k_const=60).collect(), key=lambda r: r["rank"]
    )
    # d2 in both lists (1/61 + 1/62) beats d1 (1/61) beats d3 (1/62)
    assert [(r["doc_id"], r["rank"]) for r in rows] == [(2, 1), (1, 2), (3, 3)]
    assert rows[0]["rrf_score"] == pytest.approx(
        round(round(1 / 61, 6) + round(1 / 62, 6), 6), abs=1e-9
    )


def test_rrf_tie_breaks_doc_id_asc(spark):
    from confluent_data_ingestion_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(0, 9, 1), (0, 4, 2)], "query_id long, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(0, 4, 1), (0, 9, 2)], "query_id long, doc_id long, rank int"
    )
    rows = sorted(
        rrf_fuse([a, b], k=10).collect(), key=lambda r: r["rank"]
    )
    # identical fused scores -> doc_id asc wins rank 1
    assert [(r["doc_id"], r["rank"]) for r in rows] == [(4, 1), (9, 2)]


def test_scoring_broadcasts_only_query_term_stats(spark, corpus):
    """The df rows a scoring call broadcasts must be pruned to the
    query's DISTINCT terms — broadcasting the whole vocab-sized table
    per call OOMs on a large-vocab corpus (r11 regression: moving df
    into the index artifact accidentally broadcast it unpruned)."""
    from confluent_data_ingestion_spark.operators.retrieval import (
        _query_term_stats,
    )

    idx = bm25_index(corpus)  # vocab {x, y, z}
    q = spark.createDataFrame(
        [(0, "x"), (1, "x"), (1, "w")], "query_id long, term string"
    )
    pruned = _query_term_stats(idx, q.select("query_id", "term"))
    # one row per distinct matching query term — never the z row, and the
    # duplicate x collapses; OOV w has no stats row
    assert {r["term"] for r in pruned.collect()} == {"x"}
    # and scoring still matches the unpruned semantics (x in docs 1, 2)
    out = bm25_topk(idx, q, k=10)
    assert {(r["query_id"], r["doc_id"]) for r in out.collect()} == {
        (0, 1), (0, 2), (1, 1), (1, 2),
    }


def test_bm25_index_merge_rejects_duplicate_doc_id(spark):
    """Append-only contract is ENFORCED: re-sending an already-indexed id
    must fail loudly (silent double-counted df/cf corrupts every later
    score)."""
    from confluent_data_ingestion_spark.operators.retrieval import (
        bm25_index_merge,
    )

    old = spark.createDataFrame(
        [(1, "x x y"), (2, "x z")], "doc_id long, text string"
    )
    dup_batch = spark.createDataFrame(
        [(2, "z w"), (3, "w")], "doc_id long, text string"
    )
    idx = bm25_index(old)
    # the rejected batch's ALREADY-MATERIALIZED index must be released
    # before the raise — a retry loop would otherwise leak block-manager
    # memory per failed attempt
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    with pytest.raises(ValueError, match="already\\s+indexed|already "):
        bm25_index_merge(idx, dup_batch)
    # the release is non-blocking (unpersist(False)); poll to quiescence
    # so the count is stable here AND for whatever test runs next
    import time

    # <= not ==: other tests' async unpersists (session-scoped caches
    # released with blocking=False) can land between the `before` capture
    # and here, legitimately dropping the count BELOW the baseline — the
    # contract under test is only that the rejected batch's OWN block is
    # gone.  The 90 s ceiling absorbs a contended host (observed: the
    # 30 s window timed out while a full-registry gate ran concurrently).
    deadline = time.monotonic() + 90
    while (
        spark.sparkContext._jsc.sc().getPersistentRDDs().size() > before
        and time.monotonic() < deadline
    ):
        time.sleep(0.1)
    assert (
        spark.sparkContext._jsc.sc().getPersistentRDDs().size() <= before
    )
    # validate=False restores the old caller-deduped fast path
    merged = bm25_index_merge(
        idx, spark.createDataFrame([(3, "w")], "doc_id long, text string")
    )
    assert merged.n_docs == 3


def test_bm25_index_unpersist_releases_blocks(spark):
    """BM25Index.unpersist must free the localCheckpointed frames' RDD
    blocks (DataFrame.unpersist does not) — the session-alternating-
    sf_dir leak found in the r11 review.  The assertion tracks the RDD
    IDS this test created, not the session-global count: an UNRELATED
    earlier test's non-blocking unpersist completing mid-poll lowers the
    global count below the baseline and a count-equality poll then never
    converges (observed as an order-dependent full-suite flake in r16)."""

    def persistent_ids() -> set:
        return {
            int(k)
            for k in spark.sparkContext._jsc.getPersistentRDDs()
            .keySet().toArray()
        }

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "b c")], "doc_id long, text string"
    )
    before = persistent_ids()
    idx = bm25_index(docs)
    created = persistent_ids() - before
    assert len(created) >= 3  # postings, doclen, df
    idx.unpersist()
    # the release path is non-blocking (unpersist(False)): poll until
    # every block THIS test pinned is gone
    import time

    deadline = time.monotonic() + 30
    while persistent_ids() & created and time.monotonic() < deadline:
        time.sleep(0.1)
    assert not (persistent_ids() & created)


def test_bm25_index_merge_equals_full_rebuild(spark):
    """Appending a batch via bm25_index_merge must produce an index
    bit-identical (postings, term stats, scalars, and scores) to a full
    rebuild over old ∪ batch — the lossless-maintenance contract."""
    from confluent_data_ingestion_spark.operators.retrieval import (
        bm25_index_merge,
        bm25_topk,
    )

    old = spark.createDataFrame(
        [(1, "x x y"), (2, "x z"), (3, "y y y z")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(4, "x w w"), (5, "z"), (6, "")],  # new terms, and an empty doc
        "doc_id long, text string",
    )
    merged = bm25_index_merge(bm25_index(old), batch)
    full = bm25_index(old.unionByName(batch))

    assert merged.n_docs == full.n_docs == 6
    assert merged.total_tokens == full.total_tokens == 13
    assert merged.indexed_docs == full.indexed_docs == 5  # doc 6 empty
    assert merged.avgdl == full.avgdl
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(merged.postings) == key(full.postings)
    assert key(merged.doclen) == key(full.doclen)
    assert key(merged.df) == key(full.df)

    q = spark.createDataFrame(
        [(0, "x"), (0, "w"), (1, "z")], "query_id long, term string"
    )
    assert key(bm25_topk(merged, q, k=10)) == key(bm25_topk(full, q, k=10))


def test_hybrid_dense_branch_swaps_to_ivfpq(spark, sf_dir):
    """The hybrid row's documented swap contract: the exact-cosine dense
    branch is replaceable by ANY ANN row under the same
    (query_id, doc_id, rank) contract without touching the fusion.
    Actually swap in IVF-PQ and pin (a) full candidate coverage — the
    ANN branch must rank a full top-20 per query, so a broken bucket
    probe can't silently degrade the fusion to BM25-only — and (b) a
    fused top-10 overlap floor vs the exact-branch fusion (observed
    0.4-0.5 on the deterministic sf0.001 corpus; PQ m=4 over 64-dim
    near-orthogonal synthetic vectors is the quantizer's worst case,
    which is exactly why the floor, not equality, is the contract)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from confluent_data_ingestion_spark.operators.retrieval import (
        bm25_topk as _bm25_topk,
        rrf_fuse,
    )
    from confluent_data_ingestion_spark.operators.similarity import (
        cosine_topk,
        ivfpq_topk,
    )
    from confluent_data_ingestion_spark.queries import (
        _ensure_bm25_index,
        _pq_shared_index,
    )

    idx, q = _ensure_bm25_index(spark, sf_dir)
    bm = _bm25_topk(idx, q, k=20)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, qv, k=20).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rn").alias("rank"),
    )
    ix = _pq_shared_index(spark, sf_dir)
    ann = ivfpq_topk(
        ix["codes"], ix["coarse_assign"], qv, ix["books"],
        ix["coarse_books"], dim=64, m=4, k=20, nprobe=4,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("neighbor_id").asc()
    )
    swapped = ann.withColumn("rank", F.row_number().over(w)).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )

    from collections import Counter, defaultdict

    per_q = Counter(r["query_id"] for r in swapped.collect())
    assert per_q == {qid: 20 for qid in range(5)}  # full coverage

    fused_exact = rrf_fuse([bm, exact], k=10)
    fused_ann = rrf_fuse([bm, swapped], k=10)
    assert fused_ann.columns == fused_exact.columns  # same contract out
    e, a = defaultdict(set), defaultdict(set)
    for r in fused_exact.collect():
        e[r["query_id"]].add(r["doc_id"])
    for r in fused_ann.collect():
        a[r["query_id"]].add(r["doc_id"])
    assert set(e) == set(a) == set(range(5))
    overlaps = {qid: len(e[qid] & a[qid]) / len(e[qid]) for qid in e}
    assert min(overlaps.values()) >= 0.3, overlaps
    assert sum(overlaps.values()) / len(overlaps) >= 0.4, overlaps
