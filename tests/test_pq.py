"""Product-quantization ANN: codebook training, encoding, ADC top-k, and
the two-stage exact-rerank path (operators/similarity.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

DIM, M, K = 64, 4, 5


@pytest.fixture(scope="module")
def pq_parts(spark, sf_dir):
    from confluent_data_ingestion_spark.operators.similarity import (
        pq_encode, pq_train_codebooks,
    )
    from confluent_data_ingestion_spark.session import load_tables

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    # ~n/7 centroids per subspace and ~n/10 queries regardless of the test
    # scale factor (the registry query's %50/%100 assumes sf>=0.01 corpora)
    init = emb.filter(F.col("vec_id") % 7 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    books = pq_train_codebooks(
        emb, init, dim=DIM, m=M, refine_iters=1
    ).persist()
    codes = pq_encode(emb, books, dim=DIM, m=M).persist()
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    yield emb, books, codes, queries
    books.unpersist()
    codes.unpersist()


def _exact_l2_topk(emb, queries, k):
    v = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("ve"),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qe"),
    )
    d = (
        "aggregate(zip_with(qe, ve, (x, y) -> (x-y)*(x-y)), "
        "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    sc = (
        q.crossJoin(v)
        .filter("query_id <> neighbor_id")
        .select("query_id", "neighbor_id", F.expr(f"round({d}, 6)").alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return sc.withColumn("rn", F.row_number().over(w)).filter(f"rn <= {k}")


def test_codebook_shape(pq_parts):
    emb, books, _, _ = pq_parts
    rows = books.collect()
    n_init = emb.filter(F.col("vec_id") % 7 == 0).count()
    # one codebook per subspace, at most n_init centroids each (Lloyd can
    # drop emptied clusters), every code vector of subspace length
    per_m = {}
    for r in rows:
        per_m.setdefault(r.m_idx, 0)
        per_m[r.m_idx] += 1
        assert len(r.ce) == DIM // M
    assert set(per_m) == set(range(M))
    assert all(0 < c <= n_init for c in per_m.values())


def test_codes_are_m_per_vector(pq_parts):
    emb, _, codes, _ = pq_parts
    n = emb.count()
    assert codes.count() == n * M
    bad = codes.groupBy("vec_id").count().filter(F.col("count") != M).count()
    assert bad == 0


def test_adc_recall_floor(spark, pq_parts):
    from confluent_data_ingestion_spark.operators.similarity import (
        pq_topk, recall_at_k,
    )

    emb, books, codes, queries = pq_parts
    approx = pq_topk(codes, queries, books, dim=DIM, m=M, k=K)
    exact = _exact_l2_topk(emb, queries, K)
    rec = recall_at_k(approx, exact).collect()[0].recall
    # raw ADC on random 64-dim gaussian data is coarse (no subspace
    # structure to exploit) but far above chance (5/499 = 1%): measured
    # 0.176 here and confirmed bit-for-bit by an independent NumPy PQ
    # reference; the registry config (10 centroids/subspace) measures 0.40
    assert rec >= 0.12


def test_rerank_recall_beats_adc(spark, pq_parts):
    from confluent_data_ingestion_spark.operators.similarity import (
        pq_rerank_topk, pq_topk, recall_at_k,
    )

    emb, books, codes, queries = pq_parts
    exact = _exact_l2_topk(emb, queries, K)
    adc = recall_at_k(
        pq_topk(codes, queries, books, dim=DIM, m=M, k=K), exact
    ).collect()[0].recall
    rer50 = recall_at_k(
        pq_rerank_topk(codes, queries, emb, books, dim=DIM, m=M, k=K,
                       rerank=50),
        exact,
    ).collect()[0].recall
    rer150 = recall_at_k(
        pq_rerank_topk(codes, queries, emb, books, dim=DIM, m=M, k=K,
                       rerank=150),
        exact,
    ).collect()[0].recall
    # exact rescoring can only help, and more candidates help further:
    # measured 0.664 (R=50) and 0.88 (R=150) vs ADC 0.176
    assert rer50 >= adc
    assert rer150 >= rer50
    assert rer150 >= 0.8


def test_rerank_distances_are_exact(pq_parts):
    """Every reranked pair's distance equals the exact three-dot l2^2."""
    from confluent_data_ingestion_spark.operators.similarity import (
        pq_rerank_topk,
    )

    emb, books, codes, queries = pq_parts
    rer = pq_rerank_topk(codes, queries, emb, books, dim=DIM, m=M, k=K,
                         rerank=50)
    v = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("ve"),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qe"),
    )
    dd = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    chk = (
        rer.join(v, "neighbor_id").join(q, "query_id")
        .select(
            "dist",
            F.expr(
                f"round({dd.format(a='qe', b='qe')} - 2 * ({dd.format(a='qe', b='ve')})"
                f" + {dd.format(a='ve', b='ve')}, 6)"
            ).alias("want"),
        )
    )
    assert chk.filter(F.col("dist") != F.col("want")).count() == 0


def test_dim_must_divide(spark, pq_parts):
    from confluent_data_ingestion_spark.operators.similarity import (
        pq_train_codebooks,
    )

    emb, _, _, _ = pq_parts
    with pytest.raises(ValueError):
        pq_train_codebooks(emb, emb.limit(1).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        ), dim=DIM, m=5)


def test_adc_plan_broadcasts_lut(pq_parts):
    """The scoring join must broadcast the LUT side, never shuffle codes."""
    from confluent_data_ingestion_spark.operators.similarity import pq_topk

    emb, books, codes, queries = pq_parts
    plan = (
        pq_topk(codes, queries, books, dim=DIM, m=M, k=K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


class TestIvfPq:
    @pytest.fixture(scope="class")
    def ivf_parts(self, spark, pq_parts):
        from confluent_data_ingestion_spark.operators.similarity import (
            pq_encode, pq_train_codebooks,
        )

        emb, books, codes, queries = pq_parts
        coarse_init = emb.filter(F.col("vec_id") % 25 == 0).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        coarse_books = pq_train_codebooks(
            emb, coarse_init, dim=DIM, m=1, refine_iters=0
        ).persist()
        coarse_assign = pq_encode(emb, coarse_books, dim=DIM, m=1).select(
            "vec_id", F.col("code").alias("bucket")
        ).persist()
        yield emb, books, codes, queries, coarse_books, coarse_assign
        coarse_books.unpersist()
        coarse_assign.unpersist()

    def test_probes_scan_fraction_of_corpus(self, ivf_parts):
        """nprobe/K_coarse buckets -> the ADC touches a strict subset."""
        from confluent_data_ingestion_spark.operators.similarity import (
            ivfpq_topk,
        )

        emb, books, codes, queries, cb, ca = ivf_parts
        n = emb.count()
        k_coarse = cb.count()
        # distinct neighbors scored for one query <= its two buckets' size
        out = ivfpq_topk(codes, ca, queries, books, cb, dim=DIM, m=M,
                         k=10**9, nprobe=2)
        per_q = out.groupBy("query_id").count().collect()
        sizes = {r.bucket: r["count"] for r in
                 ca.groupBy("bucket").count().collect()}
        assert per_q, "no queries scored"
        for r in per_q:
            # strictly less than the corpus: bucketing pruned the scan
            assert r["count"] < n
            assert r["count"] <= 2 * max(sizes.values())
        assert k_coarse > 2  # pruning is real, not 1-bucket degenerate

    def test_recall_positive_and_bounded_by_adc(self, ivf_parts):
        from confluent_data_ingestion_spark.operators.similarity import (
            ivfpq_topk, pq_topk, recall_at_k,
        )

        emb, books, codes, queries, cb, ca = ivf_parts
        exact = _exact_l2_topk(emb, queries, K)
        ivf = recall_at_k(
            ivfpq_topk(codes, ca, queries, books, cb, dim=DIM, m=M, k=K,
                       nprobe=2),
            exact,
        ).collect()[0].recall
        full = recall_at_k(
            pq_topk(codes, queries, books, dim=DIM, m=M, k=K), exact
        ).collect()[0].recall
        # pruning can only lose candidates vs the full ADC scan, but the
        # nearest buckets hold most true neighbors: recall stays well
        # above chance (measured 0.148 vs full-scan 0.176 at sf0.001)
        assert 0 < ivf <= full + 1e-9
        assert ivf >= 0.08

    def test_more_probes_monotone(self, ivf_parts):
        from confluent_data_ingestion_spark.operators.similarity import (
            ivfpq_topk, recall_at_k,
        )

        emb, books, codes, queries, cb, ca = ivf_parts
        exact = _exact_l2_topk(emb, queries, K)
        r2 = recall_at_k(
            ivfpq_topk(codes, ca, queries, books, cb, dim=DIM, m=M, k=K,
                       nprobe=2), exact).collect()[0].recall
        rall = recall_at_k(
            ivfpq_topk(codes, ca, queries, books, cb, dim=DIM, m=M, k=K,
                       nprobe=10**6), exact).collect()[0].recall
        assert rall >= r2  # probing every bucket recovers the full ADC scan
