"""Round-17 regression tests: the r16 ADVICE items — degenerate-source
engine/oracle parity for ngram_diversity, the unrounded-threshold
contract of containment_verify_pairs, and fail-loud torn-state
detection in UniqueKeyMonitor.snapshot — plus the new
containment-excerpt prefix-filter operator (recall ~1.0 on planted
excerpts, the gap the r16 verdict asked to close) and the
ngram_diversity approx (HLL) mode."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from confluent_data_ingestion_spark.streaming.contracts import (
    UniqueKeyMonitor,
)


# ---------------------------------------------------------------------------
# ngram_diversity: degenerate sources agree between engine and oracle
# ---------------------------------------------------------------------------


def test_ngram_diversity_degenerate_source_oracle_parity(spark):
    """A source whose docs all have <2 tokens aggregates (it has unigram
    rows) so the engine reports n_bigrams=0; the oracle's LEFT-JOINed
    bigram CTE has no row for it — the SQL must coalesce that case to 0
    (r16 ADVICE).  A source of only empty/NULL texts never aggregates
    and must stay NULL in BOTH engines."""
    import duckdb
    import pandas as pd

    from confluent_data_ingestion_spark.operators.text import ngram_diversity
    from confluent_data_ingestion_spark.queries import ORACLES

    rows = [
        ("multi", "x y x"), ("multi", "y x"),
        ("short", "solo"), ("short", "uno"),   # degenerate: no bigrams
        ("empty", ""), ("empty", None),        # never aggregates
    ]
    docs = spark.createDataFrame(rows, "source string, text string")
    got = {
        r["source"]: (
            r["n_docs"], r["n_tokens"], r["distinct_tokens"], r["ttr"],
            r["n_bigrams"], r["distinct_bigrams"], r["distinct2"],
        )
        for r in ngram_diversity(docs).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["source", "text"])
    )
    want = {
        src: (
            nd, None if nt is None else int(nt),
            None if dt is None else int(dt), ttr,
            None if nb is None else int(nb),
            None if db is None else int(db), d2,
        )
        for src, nd, nt, dt, ttr, nb, db, d2 in con.execute(
            ORACLES["corpus_diversity_ngrams"]
        ).fetchall()
    }
    assert got == want
    assert got["short"][4] == 0 and got["short"][5] == 0  # coalesced 0
    assert got["empty"][1] is None and got["empty"][4] is None


# ---------------------------------------------------------------------------
# containment_verify_pairs: threshold the UNROUNDED score (r16 ADVICE)
# ---------------------------------------------------------------------------


def test_containment_verify_thresholds_unrounded_like_allpairs(spark):
    """A pair whose true containment sits in [t - 5e-7, t) must be
    excluded by BOTH the all-pairs path and the verify path: with
    containment exactly 2/3 and t just above it, the old verify code
    rounded 0.6666667 -> 0.666667 >= t and kept a pair the all-pairs
    row drops, breaking exactness-on-candidates."""
    from confluent_data_ingestion_spark.operators.dedup import (
        containment_verify_pairs,
        ngram_containment_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d e")],  # containment = 2/3
        "doc_id long, text string",
    )
    pair = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    t_above = 0.6666668  # 2/3 < t <= round(2/3, 6)
    assert 2 / 3 < t_above <= 0.666667
    assert ngram_containment_pairs(
        docs, n=1, threshold=t_above, max_group_size=None
    ).count() == 0
    assert containment_verify_pairs(
        docs, pair, n=1, threshold=t_above
    ).count() == 0
    # and just below the true value both paths keep it, rounded output
    for got in (
        ngram_containment_pairs(
            docs, n=1, threshold=0.666666, max_group_size=None
        ),
        containment_verify_pairs(docs, pair, n=1, threshold=0.666666),
    ):
        rows = got.collect()
        assert len(rows) == 1
        assert rows[0]["containment"] == 0.666667
        assert rows[0]["contained_doc"] == 1


# ---------------------------------------------------------------------------
# UniqueKeyMonitor: torn state fails loudly (r16 ADVICE)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("missing", ["counters", "keys"])
def test_unique_monitor_torn_state_fails_loudly(spark, missing):
    """apply() writes keys then counters; a crash between the writes
    leaves exactly one dir.  snapshot() must raise, not report 'no
    batches yet' — the silent empty report would mask the partial
    write."""
    path = tempfile.mkdtemp(prefix="cdis-ukm-torn-")
    mon = UniqueKeyMonitor(path, ["k"])
    mon.apply(spark.createDataFrame([(1,), (2,)], "k long"), 0)
    shutil.rmtree(f"{path}/{missing}")
    with pytest.raises(ValueError, match="crashed between"):
        mon.snapshot(spark)


# ---------------------------------------------------------------------------
# containment_excerpt_pairs: the no-miss excerpt scale path (r16 task 3)
# ---------------------------------------------------------------------------


def test_containment_excerpts_recall_is_one_on_planted(spark, sf_dir):
    """The r16 row documented LSH-candidate recall of 11/28 on planted
    half-document excerpts (Jaccard ~0.5 rarely collides in bands
    tuned for 0.8+).  The prefix-filter path must find EVERY planted
    (parent, parent+3000000) pair — its no-miss guarantee is a
    theorem, and this pins the measured recall at 1.0."""
    from confluent_data_ingestion_spark.operators.dedup import (
        containment_excerpt_pairs,
    )
    from confluent_data_ingestion_spark.queries import _excerpt_corpus

    corpus = _excerpt_corpus(spark, sf_dir)
    planted = {
        (r["doc_id"], r["doc_id"] + 3000000)
        for r in corpus.filter("doc_id >= 3000000")
        .selectExpr("doc_id - 3000000 AS doc_id").collect()
    }
    assert len(planted) >= 10  # the corpus actually plants excerpts
    found = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_excerpt_pairs(
            corpus, n=5, threshold=0.8
        ).collect()
    }
    missed = planted - set(found)
    assert not missed, f"prefix filter missed planted excerpts: {missed}"
    for pair in planted:  # a planted excerpt's shingles are a subset
        assert found[pair] == 1.0


def test_containment_excerpts_matches_capless_allpairs(spark, sf_dir):
    """Prefix filtering is exact: the full output must be bit-identical
    to capless ngram_containment_pairs on the same corpus."""
    from confluent_data_ingestion_spark.operators.dedup import (
        containment_excerpt_pairs,
        ngram_containment_pairs,
    )
    from confluent_data_ingestion_spark.queries import _excerpt_corpus

    corpus = _excerpt_corpus(spark, sf_dir)
    got = {
        (r["doc_a"], r["doc_b"]): (r["containment"], r["contained_doc"])
        for r in containment_excerpt_pairs(
            corpus, n=5, threshold=0.8
        ).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"]): (r["containment"], r["contained_doc"])
        for r in ngram_containment_pairs(
            corpus, n=5, threshold=0.8, max_group_size=None
        ).collect()
    }
    assert got == want


def test_containment_excerpts_df_cap_narrows_but_runs(spark):
    """With max_df the guarantee narrows to the capped shingle universe
    (documented); a corpus where the excerpt's rare shingles survive
    the cap still finds the pair, and verification scores FULL sets."""
    from confluent_data_ingestion_spark.operators.dedup import (
        containment_excerpt_pairs,
    )

    parent = " ".join(f"w{i}" for i in range(40))
    excerpt = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, parent), (2, excerpt), (3, "q r s t u v w x y z")],
        "doc_id long, text string",
    )
    rows = containment_excerpt_pairs(
        docs, n=5, threshold=0.9, max_df=10
    ).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == {(1, 2)}
    assert rows[0]["containment"] == 1.0
    assert rows[0]["contained_doc"] == 2

    with pytest.raises(ValueError):
        containment_excerpt_pairs(docs, threshold=1.5)


# ---------------------------------------------------------------------------
# ngram_diversity approx (HLL) mode: the 100 TB-safe distinct-2 leg
# ---------------------------------------------------------------------------


def test_ngram_diversity_approx_within_hll_bound(spark):
    """exact=False swaps the corpus-scale distinct-bigram hash state for
    a fixed-size HLL++ sketch; at rsd=0.01 every per-source estimate
    must land within 5 sigma (5%) of the exact count at sf0.01, and
    every other column must be bit-identical (only the distinct-2 leg
    changes)."""
    from confluent_data_ingestion_spark.operators.text import ngram_diversity

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    exact = {r["source"]: r for r in ngram_diversity(docs).collect()}
    approx = {
        r["source"]: r
        for r in ngram_diversity(docs, exact=False, rsd=0.01).collect()
    }
    assert set(exact) == set(approx)
    for src, e in exact.items():
        a = approx[src]
        for col in ("n_docs", "n_tokens", "distinct_tokens", "ttr",
                    "n_bigrams"):
            assert a[col] == e[col], (src, col)
        assert e["distinct_bigrams"] > 500  # estimate is non-trivial
        rel = abs(a["distinct_bigrams"] - e["distinct_bigrams"]) / e[
            "distinct_bigrams"
        ]
        assert rel <= 0.05, (src, rel)
        assert abs(a["distinct2"] - e["distinct2"]) <= 0.05 * e["distinct2"]


# ---------------------------------------------------------------------------
# UniqueKeyMonitor.compact: cross-batch digest compaction (r16 task 1)
# ---------------------------------------------------------------------------


def _apply_batches(spark, mon, n_batches, start=0, rows_per=20, dup_every=5):
    for b in range(start, start + n_batches):
        rows = [
            ((b * rows_per + i) // dup_every,)  # every dup_every rows collide
            for i in range(rows_per)
        ]
        mon.apply(spark.createDataFrame(rows, "k long"), b)


def test_unique_monitor_compact_preserves_snapshot(spark):
    """Folding old batch dirs into one compacted pseudo-batch must not
    change the cumulative report by one ulp — distinct-of-union is
    invariant under re-grouping — while the keys dir count drops to
    keep_last + 1."""
    path = tempfile.mkdtemp(prefix="cdis-ukm-compact-")
    mon = UniqueKeyMonitor(path, ["k"])
    _apply_batches(spark, mon, 12)
    before = mon.snapshot(spark).collect()
    assert len(mon._key_batch_ids()) == 12

    res = mon.compact(spark, keep_last=4)
    assert res == {"folded": 8, "kept": 4}
    ids = mon._key_batch_ids()
    assert len(ids) == 5 and ids[0] < 0  # 4 live + 1 compacted
    after = mon.snapshot(spark).collect()
    assert after == before

    # idempotent: nothing left to fold
    assert mon.compact(spark, keep_last=4)["folded"] == 0
    assert mon.snapshot(spark).collect() == before


def test_unique_monitor_compact_then_more_batches_and_refold(spark):
    """Compaction composes with continued streaming: new batches land as
    normal dirs, a second compact folds them INTO the prior compacted
    dir (prior negative ids are sources too), and the report still
    equals the one-shot truth."""
    path = tempfile.mkdtemp(prefix="cdis-ukm-refold-")
    mon = UniqueKeyMonitor(path, ["k"])
    _apply_batches(spark, mon, 8)
    mon.compact(spark, keep_last=2)
    _apply_batches(spark, mon, 6, start=8)
    res = mon.compact(spark, keep_last=2)
    assert res["kept"] == 2 and res["folded"] == 7  # 6 old live + 1 compacted
    ids = mon._key_batch_ids()
    assert sum(1 for i in ids if i < 0) == 1
    row = mon.snapshot(spark).collect()[0]
    # 14 batches x 20 rows, key = row_index // 5 -> 56 distinct / 280
    assert row["observed"] == round(56 / 280, 6)


def test_unique_monitor_replay_after_fold_is_harmless(spark):
    """A microbatch replayed AFTER its digests were folded re-creates
    its batch dir; the duplicates cannot change count_distinct, so the
    report is unchanged — the crash-window story rides the same
    algebra."""
    path = tempfile.mkdtemp(prefix="cdis-ukm-replay-")
    mon = UniqueKeyMonitor(path, ["k"])
    _apply_batches(spark, mon, 6)
    mon.compact(spark, keep_last=2)
    before = mon.snapshot(spark).collect()
    _apply_batches(spark, mon, 1, start=0)  # replay folded batch 0
    assert mon.snapshot(spark).collect() == before
    # and a re-compact folds the duplicate dir away again
    mon.compact(spark, keep_last=2)
    assert mon.snapshot(spark).collect() == before


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer et al. 2003): selection + guarantee
# ---------------------------------------------------------------------------


def _winnow_reference(text: str, k: int, w: int) -> set:
    """Pure-python winnowing oracle: min-hash of every w-window over the
    k-gram md5 stream, rightmost on ties, trailing windows truncated."""
    import hashlib

    ts = text.split(" ")
    grams = [
        (hashlib.md5(" ".join(ts[i:i + k]).encode()).hexdigest(), i + 1)
        for i in range(len(ts) - k + 1)
    ]
    sel = set()
    for s in range(len(grams)):
        win = grams[s:s + w]
        sel.add(min(win, key=lambda g: (g[0], -g[1])))
    return sel


def test_winnow_fingerprints_match_reference_selection(spark):
    """The engine's one-pass string-key selection (md5 || zero-padded
    reversed position) must reproduce classic winnowing exactly:
    min hash per window, RIGHTMOST position on ties (repeated k-grams
    in one doc make ties real), truncated trailing windows."""
    from confluent_data_ingestion_spark.operators.dedup import (
        winnow_fingerprints,
    )

    # 'a b c' repeats -> identical 3-grams at different positions: ties
    text = "a b c d a b c d a b c x y z a b c"
    rows = winnow_fingerprints(
        spark.createDataFrame([(1, text)], "doc_id long, text string"),
        k=3, window=4,
    ).collect()
    got = {(r["f"], r["pos"]) for r in rows}
    assert got == _winnow_reference(text, 3, 4)
    # density: ~2/(w+1) of grams, never more than gram count
    n_grams = len(text.split()) - 2
    assert 0 < len(got) <= n_grams
    # sub-k docs produce nothing
    assert winnow_fingerprints(
        spark.createDataFrame([(2, "too short")], "doc_id long, text string"),
        k=5, window=4,
    ).count() == 0


def test_winnow_overlap_guarantee_on_shared_run(spark):
    """Any shared verbatim run of window + k - 1 tokens must produce at
    least one shared fingerprint (the winnowing theorem) — two docs
    sharing an 8-token run inside unrelated context must pair."""
    from confluent_data_ingestion_spark.operators.dedup import (
        winnow_overlap_pairs,
    )

    run = "the quick brown fox jumps over lazy dogs"  # 8 tokens = w+k-1
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta gamma {run} delta epsilon zeta"),
            (2, f"uno dos tres cuatro {run} cinco seis"),
            (3, "completely unrelated words only appear in here tonight"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in winnow_overlap_pairs(
            docs, k=5, window=4, min_shared=1
        ).collect()
    }
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_winnow_pairs_flag_planted_excerpts(spark, sf_dir):
    """On the planted-excerpt corpus the winnowed radar (40 pct density)
    must flag every planted (parent, excerpt) pair at min_shared=2
    whose excerpt is long enough for the theorem to promise two
    fingerprints: two disjoint w+k-1 runs, i.e. >= 2(w+k-1) = 16
    tokens (a 5-token excerpt has ONE gram and can share only one
    fingerprint — the documented reason min_shared exists)."""
    from pyspark.sql import functions as F

    from confluent_data_ingestion_spark.operators.dedup import (
        winnow_overlap_pairs,
    )
    from confluent_data_ingestion_spark.queries import _excerpt_corpus

    corpus = _excerpt_corpus(spark, sf_dir)
    planted = {
        (r["doc_id"], r["doc_id"] + 3000000)
        for r in corpus.filter("doc_id >= 3000000")
        .filter(F.size(F.split("text", " ")) >= 16)
        .selectExpr("doc_id - 3000000 AS doc_id").collect()
    }
    assert len(planted) >= 10
    found = {
        (r["doc_a"], r["doc_b"])
        for r in winnow_overlap_pairs(
            corpus, k=5, window=4, min_shared=2
        ).collect()
    }
    assert planted <= found
