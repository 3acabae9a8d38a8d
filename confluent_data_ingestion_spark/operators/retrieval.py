"""BM25 lexical retrieval — the sparse counterpart of the embedding ANN
family (`operators/similarity.py`).

A training-data pipeline needs lexical search next to vector search:
near-dup triage, contamination spot-checks, and eval-set mining all ask
"which documents contain these terms" with a relevance order.  BM25 is
the standard scorer; here it is expressed as pure DataFrame ops:

  bm25_index   ONE corpus-sized explode+aggregate producing the two
               index tables — postings (term, doc_id, tf) and document
               lengths — plus the bounded per-term document-frequency
               table.  Postings shuffle on the term key only (short
               strings), never the text.
  bm25_topk    score a bag of query terms: broadcast the (tiny) query
               frame onto the postings, one partial aggregation per
               (query, doc), deterministic top-k per query
               (score desc, doc_id asc) via window ranking.

Numerics: each per-(term, doc) contribution rounds to 6 decimals and
accumulates as DECIMAL(18,6) — the repo-wide convention — so scores are
bit-identical in any engine regardless of add order.  IDF uses the
Robertson-Sparck-Jones form ln(1 + (N - df + 0.5) / (df + 0.5)), which
is positive for every df, so scores never cancel to negative zero.

Scale posture: the index build is one explode pass (linear, the floor);
the df and length tables are vocab- and doc-count-sized; query scoring
touches only the postings of the query's terms — a broadcast semi-join
prunes the posting scan before any shuffle.  Top-k per query executes
as a bounded window over (query, candidate) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, int]:
    """Build the BM25 index: (postings, doclen, n_docs).

    postings: (term, id, tf); doclen: (id, dl) with dl = token count.
    Both derive from ONE explode of the corpus; callers that score many
    query batches should checkpoint/persist them (they are the index).
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).alias("term"),
    )
    postings = toks.groupBy("term", "id").agg(F.count("*").alias("tf"))
    doclen = postings.groupBy("id").agg(F.sum("tf").alias("dl"))
    n_docs = docs.count()
    return postings, doclen, n_docs


def bm25_topk(
    postings: DataFrame,
    doclen: DataFrame,
    n_docs: int,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents per query by BM25.

    ``queries``: (query_id, term) — one row per query term; duplicate
    terms in one query weigh that term once per occurrence (bag
    semantics).  Returns (query_id, doc_id, rank, score) with the
    deterministic order (score desc, doc_id asc); ``score`` is a DOUBLE
    rounded to 6 decimals.
    """
    # df is computed over the FULL postings (corpus statistics), then the
    # posting scan is pruned to the query's terms by a broadcast join
    df_tab = postings.groupBy("term").agg(F.count("*").alias("df"))
    qterms = queries.select("query_id", "term")
    hits = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_tab.join(F.broadcast(qterms.select("term").distinct()), "term")), "term")
        .join(doclen, "id")
    )
    avgdl_row = doclen.agg(
        (F.sum("dl") / F.count("*")).alias("avgdl")
    ).collect()[0]
    avgdl = float(avgdl_row["avgdl"])
    contrib = F.expr(
        f"cast(round(ln(1.0 + ({n_docs} - df + 0.5) / (df + 0.5)) * "
        f"(tf * ({k1} + 1.0)) / "
        f"(tf + {k1} * (1.0 - {b} + {b} * dl / {avgdl!r})), 6) "
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
