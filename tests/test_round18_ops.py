"""Round-18 optimization guards.

The excerpt-corpus shingle artifact is now DERIVED (documents-table
shingle artifact + the 1/37 planted-excerpt slice signed fresh) instead
of re-exploding the whole union corpus.  The derivation is only valid
because a document's shingles depend on its own text alone and the
planted excerpt ids are disjoint — this test pins the derived frame
against the direct full-corpus build, row set for row set.
"""

import pytest


def _rows(df):
    return {(r["doc_id"], r["s"]) for r in df.collect()}


def test_excerpt_shingles_artifact_equals_direct_build(spark, sf_dir):
    from confluent_data_ingestion_spark import queries as q

    try:
        derived = _rows(q._excerpt_shingles(spark, sf_dir))
        direct = _rows(q._build_shingles5(q._excerpt_corpus(spark, sf_dir)))
        assert derived == direct
        # the planted slice is actually present (ids offset by 3,000,000)
        assert any(doc_id >= 3000000 for doc_id, _ in derived)
    finally:
        q.release_artifact_families(["excerpt_shingles", "doc_shingles"])


def test_excerpt_shingles_reuses_doc_artifact(spark, sf_dir):
    """The derivation must consume the documents shingle artifact (one
    corpus-scale explode for the whole dedup family), not rebuild it."""
    from confluent_data_ingestion_spark import queries as q

    try:
        q.release_artifact_families(["excerpt_shingles", "doc_shingles"])
        q._excerpt_shingles(spark, sf_dir)
        # building the excerpt artifact populates the doc family too
        keys = q.artifact_family_keys()
        assert keys["doc_shingles"], "doc_shingles artifact not built"
        assert keys["excerpt_shingles"], "excerpt_shingles artifact not built"
    finally:
        q.release_artifact_families(["excerpt_shingles", "doc_shingles"])
