"""BM25 lexical retrieval — the sparse counterpart of the embedding ANN
family (`operators/similarity.py`).

A training-data pipeline needs lexical search next to vector search:
near-dup triage, contamination spot-checks, and eval-set mining all ask
"which documents contain these terms" with a relevance order.  BM25 is
the standard scorer; here it is expressed as pure DataFrame ops:

  bm25_index   ONE corpus-sized explode+aggregate producing the WHOLE
               index artifact — postings (term, doc_id, tf), document
               lengths, the per-term document-frequency table, and the
               two corpus scalars (doc count, average length).  All
               corpus statistics live here, computed once; postings
               shuffle on the term key only (short strings), never the
               text.  At 100 TB the artifact persists to storage and is
               amortized over every query batch.
  bm25_topk    score a bag of query terms against a prebuilt index:
               broadcast the (tiny) query frame onto the postings, join
               the vocab-bounded df table by broadcast, one partial
               aggregation per (query, doc), deterministic top-k per
               query (score desc, doc_id asc) via window ranking.
               Scoring touches NO corpus-wide aggregation — every
               per-call cost is bounded by the query terms' postings.

Numerics: each per-(term, doc) contribution rounds to 6 decimals and
accumulates as DECIMAL(18,6) — the repo-wide convention — so scores are
bit-identical in any engine regardless of add order.  IDF uses the
Robertson-Sparck-Jones form ln(1 + (N - df + 0.5) / (df + 0.5)), which
is positive for every df, so scores never cancel to negative zero.

Scale posture: the index build is one explode pass (linear, the floor);
the df and length tables are vocab- and doc-count-sized; query scoring
touches only the postings of the query's terms — a broadcast semi-join
prunes the posting scan before any shuffle, and df arrives by broadcast
from the index (never recomputed).  The one shuffle-side join left in
scoring is hits ⨝ doclen on doc id: doclen is doc-count-sized, so at
cluster scale it intentionally shuffles (broadcasting a billion-row
length table would OOM executors); the hits side is already pruned to
the query terms' postings, so the exchange is the smaller of the two.
Top-k per query executes as a bounded window over (query, candidate)
rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BM25Index:
    """The persistable retrieval artifact: everything scoring needs.

    postings: (term, id, tf); doclen: (id, dl); df: (term, df) — the
    vocab-bounded document-frequency table; n_docs / avgdl: the two
    corpus scalars.  Callers that score many query batches persist all
    three frames (they ARE the index); nothing in :func:`bm25_topk`
    recomputes a corpus statistic.
    """

    postings: DataFrame
    doclen: DataFrame
    df: DataFrame
    n_docs: int
    avgdl: float


def bm25_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize: bool = True,
) -> BM25Index:
    """Build the full BM25 index from ONE explode of the corpus.

    With ``materialize`` (the default, and the deployment shape) the
    postings table is checkpointed as soon as it exists and doclen /
    df / avgdl all derive from THAT artifact — the corpus is tokenized
    exactly once, and the derived tables are doc- and vocab-sized
    aggregations of the persisted postings, never re-scans of the text.
    At 100 TB the checkpoint stands in for writing the index tables to
    storage.  ``materialize=False`` returns fully lazy frames for
    callers embedding the build in a larger plan.

    n_docs and avgdl are the only collects (both scalars; n_docs comes
    from the parquet-metadata count of ``docs`` so empty documents are
    counted too).  df is computed HERE — it is a corpus statistic, so
    it belongs to the index artifact, not to the per-query scoring
    path.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).alias("term"),
    )
    postings = toks.groupBy("term", "id").agg(F.count("*").alias("tf"))
    if materialize:
        postings = postings.localCheckpoint()
    doclen = postings.groupBy("id").agg(F.sum("tf").alias("dl"))
    df_tab = postings.groupBy("term").agg(F.count("*").alias("df"))
    if materialize:
        doclen = doclen.localCheckpoint()
        df_tab = df_tab.localCheckpoint()
    n_docs = docs.count()
    avgdl_row = doclen.agg(
        (F.sum("dl") / F.count("*")).alias("avgdl")
    ).collect()[0]
    return BM25Index(
        postings=postings,
        doclen=doclen,
        df=df_tab,
        n_docs=n_docs,
        avgdl=float(avgdl_row["avgdl"]),
    )


def bm25_topk(
    index: BM25Index,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents per query by BM25 over a prebuilt index.

    ``queries``: (query_id, term) — one row per query term; duplicate
    terms in one query weigh that term once per occurrence (bag
    semantics).  Returns (query_id, doc_id, rank, score) with the
    deterministic order (score desc, doc_id asc); ``score`` is a DOUBLE
    rounded to 6 decimals.

    Plan shape: postings pruned to query terms by a broadcast join, df
    joined by broadcast from the index (vocab-bounded — the unmatched
    non-query terms stream past a broadcast hash join for free), doclen
    joined on id (doc-count-sized: intentionally a shuffle-capable join
    at cluster scale, see module docstring).  No corpus-wide aggregation
    runs per scoring call.
    """
    qterms = queries.select("query_id", "term")
    hits = (
        index.postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(index.df), "term")
        .join(index.doclen, "id")
    )
    contrib = F.expr(
        f"cast(round(ln(1.0 + ({index.n_docs} - df + 0.5) / (df + 0.5)) * "
        f"(tf * ({k1} + 1.0)) / "
        f"(tf + {k1} * (1.0 - {b} + {b} * dl / {index.avgdl!r})), 6) "
        "as decimal(18,6))"
    )
    scored = (
        hits.select("query_id", F.col("id").alias("doc_id"), contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("s"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "rank",
            F.round(F.col("s").cast("double"), 6).alias("score"),
        )
    )
