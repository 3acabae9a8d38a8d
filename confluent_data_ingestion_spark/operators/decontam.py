"""Benchmark decontamination: n-gram overlap between a training corpus and
an evaluation/benchmark set.

The standard LLM-pretraining hygiene step: a training document sharing
long word n-grams with a benchmark document leaks the benchmark into the
model, so such documents are flagged (and usually dropped) before
training.  This is the eval-overlap formulation used by published LLM
data pipelines — n-gram collision against the eval set, reported with
enough detail (hit counts, overlap ratio) to pick a drop threshold.

Scale design:
 - Both sides decompose to distinct (doc, n-gram) rows via
   ``exploded_shingles`` (generate on an INT sequence — see that
   docstring for the Catalyst trap it avoids).
 - The join key is md5(ngram) — fixed 32-byte keys shuffle instead of
   arbitrary-length n-gram text, and any SQL engine reproduces it for
   oracle parity.  A 128-bit collision producing a false flag is beyond
   negligible at any corpus size.
 - Benchmarks are small by nature; ``broadcast_eval=True`` broadcasts
   the eval n-gram set so the 100 TB training side NEVER shuffles — the
   whole operator is then one map-side join over the train scan plus a
   groupBy on train doc ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import ensure_min_parallelism
from .dedup import exploded_shingles


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    eval_id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_shared: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Flag training documents sharing >= ``min_shared`` distinct word
    ``n``-grams with any eval document.

    Output per contaminated train doc: (``id_col``, n_shared — distinct
    shared n-grams, n_eval_docs — distinct eval docs hit, contam_ratio —
    shared / total distinct n-grams of the doc, rounded to 6 decimals).
    """
    tr = exploded_shingles(
        ensure_min_parallelism(train.select(id_col, text_col)),
        id_col, text_col, n, hashed=True,
    ).select(F.col(id_col), F.col("s").alias("__k__"))
    ev = exploded_shingles(
        eval_df.select(F.col(eval_id_col).alias("__eid__"), F.col(text_col)),
        "__eid__", text_col, n, hashed=True,
    ).select("__eid__", F.col("s").alias("__k__"))
    if broadcast_eval:
        ev = F.broadcast(ev)
    # LEFT join + one groupBy: totals and hit counts come from a SINGLE
    # pass over the train shingles.  Splitting totals into a separate
    # groupBy branch would scan + re-shingle the full training corpus
    # twice — at 100 TB the rescan dwarfs the Expand the multi-distinct
    # aggregate costs here (distinct keys pre-reduce map-side).
    joined = tr.join(ev, "__k__", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.countDistinct("__k__").alias("__tot__"),
            F.countDistinct(
                F.when(F.col("__eid__").isNotNull(), F.col("__k__"))
            ).alias("n_shared"),
            F.countDistinct("__eid__").alias("n_eval_docs"),
        )
        .filter(F.col("n_shared") >= min_shared)
        .select(
            id_col,
            "n_shared",
            "n_eval_docs",
            F.round(F.col("n_shared") / F.col("__tot__"), 6).alias(
                "contam_ratio"
            ),
        )
    )


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    span_chars: int = 60,
    anchor_chars: int = 8,
) -> DataFrame:
    """Unified decontamination report: token-level (n-gram collision) AND
    character-level (verbatim-span) contamination in one per-document
    verdict — the two detectors catch different leaks (n-grams survive
    paraphrase-adjacent token edits; spans survive formatting/punctuation
    changes that shift token boundaries), so a release gate wants both.

    Output: one row per flagged training doc — (``id_col``,
    n_shared_ngrams, ngram_ratio, n_shared_spans, verdict) with verdict
    in {'ngram_only', 'span_only', 'both'}; unflagged docs are absent.

    Scale shape: both detectors stream the training corpus against a
    broadcast eval-set digest (the corpus never shuffles); their outputs
    are contaminated-subset-sized, and the full-outer merge joins those
    two small frames on the doc id.
    """
    from .dedup import cross_set_span_contamination

    ng = ngram_contamination(train, eval_df, id_col=id_col,
                             text_col=text_col, n=n).select(
        F.col(id_col),
        F.col("n_shared").alias("n_shared_ngrams"),
        F.col("contam_ratio").alias("ngram_ratio"),
    )
    sp = cross_set_span_contamination(
        train, eval_df, id_col=id_col, text_col=text_col,
        span_chars=span_chars, anchor_chars=anchor_chars,
    ).select(F.col(id_col), "n_shared_spans")
    return (
        ng.join(sp, id_col, "full_outer")
        .select(
            id_col,
            F.coalesce("n_shared_ngrams", F.lit(0)).cast("bigint")
            .alias("n_shared_ngrams"),
            F.coalesce("ngram_ratio", F.lit(0.0)).alias("ngram_ratio"),
            F.coalesce("n_shared_spans", F.lit(0)).cast("bigint")
            .alias("n_shared_spans"),
            F.expr(
                "CASE WHEN n_shared_ngrams IS NOT NULL "
                "AND n_shared_spans IS NOT NULL THEN 'both' "
                "WHEN n_shared_ngrams IS NOT NULL THEN 'ngram_only' "
                "ELSE 'span_only' END"
            ).alias("verdict"),
        )
    )


def semantic_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "vec_id",
    eval_id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
) -> DataFrame:
    """Embedding-space decontamination: flag training vectors whose cosine
    to ANY eval-set vector reaches ``threshold`` — the semantic companion
    to the n-gram/span detectors above (paraphrased benchmark leaks share
    no 8-gram and no verbatim span, but their embeddings stay close; this
    is the eval-overlap variant of SemDeDup-style embedding screening).

    Output: one row per flagged training vector — (``id_col``, eval_id,
    cosine) with ``eval_id`` the closest eval vector (ties broken by the
    smaller id); clean vectors are absent.  Cosines round to 6 decimals
    (sequential-fold dot products — any engine reproduces them).

    Scale shape: same contract as ``ngram_contamination`` — eval sets are
    small by nature, so the eval matrix BROADCASTS (with per-row norms
    precomputed once) and the 100 TB training side never shuffles: the
    whole operator is a map-side broadcast scoring pass plus a
    flagged-subset-sized aggregation.  The nested-loop is the declared
    design (plan-guard allowlisted), exactly like the IVF centroid
    scorers; if the eval set ever outgrows broadcast range, bucket it
    with the LSH/IVF machinery in ``operators/similarity.py`` first.

    Zero-norm vectors (all-zero embeddings — a real artifact of failed
    encoder batches) have no defined cosine and are excluded on BOTH
    sides before scoring: without the guard, 0/0 yields NaN, and Spark
    orders NaN above every number, so ``cosine >= threshold`` would flag
    a zero training vector against every eval vector.
    """
    from .similarity import _dot

    if not -1.0 <= threshold <= 1.0:
        raise ValueError(f"cosine threshold must be in [-1, 1], got {threshold}")
    t = ensure_min_parallelism(train).select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__te__"),
    ).withColumn("__tn__", F.expr(f"sqrt({_dot('__te__', '__te__')})")) \
        .filter(F.col("__tn__") > 0)
    e = eval_df.select(
        F.col(eval_id_col).alias("eval_id"),
        F.col(vec_col).cast("array<double>").alias("__ee__"),
    ).withColumn("__en__", F.expr(f"sqrt({_dot('__ee__', '__ee__')})")) \
        .filter(F.col("__en__") > 0)
    scored = (
        t.crossJoin(F.broadcast(e))
        .select(
            id_col,
            "eval_id",
            F.expr(
                f"round({_dot('__te__', '__ee__')} / (__tn__ * __en__), 6)"
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return scored.groupBy(id_col).agg(
        F.expr(
            "min_by(struct(eval_id, cosine), struct(-cosine, eval_id))"
        ).alias("__m__")
    ).select(
        id_col,
        F.col("__m__.eval_id").alias("eval_id"),
        F.col("__m__.cosine").alias("cosine"),
    )
