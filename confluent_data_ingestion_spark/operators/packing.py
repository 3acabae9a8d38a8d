"""Sequence packing: map documents into fixed token-budget training
sequences (context windows) for LLM pretraining.

Formulation: the standard concat-and-chunk packing — documents are laid
end-to-end in a deterministic order and the token stream is cut every
``budget`` tokens; a document may straddle a cut (training pipelines
separate docs with EOS and let attention masks handle the seams).  Each
document gets its pack coordinates: which sequence it starts in and at
what offset, and how many sequences it spans.

Scale design:
 - One global ordering would be one panel-wide sort on a single partition.
   Instead documents hash into ``n_streams`` INDEPENDENT streams packed in
   parallel: the only shuffle is the window's hash partitioning on the
   stream id, and per-stream work is a sort of n/``n_streams`` rows.  Set
   ``n_streams`` to a small multiple of cluster cores; sequence ids are
   globally unique as (stream, pack_id) pairs.
 - All assignment is a pure function of (seed, key, token counts): stable
   under reruns/repartitioning and reproducible in any SQL engine (md5
   hex order + a windowed running sum), so the packing plan itself can be
   audited or regenerated without the original cluster.
 - Zero Python in the path: hashing, ordering, and the running sum are
   Catalyst window/scalar expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HEXPOS = "(instr('0123456789abcdef', substr({h}, {i}, 1)) - 1)"


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
    budget: int = 2048,
    n_streams: int = 16,
    seed: str = "",
) -> DataFrame:
    """Assign every document its packed-sequence coordinates.

    Output: (``id_col``, n_tokens, stream, pack_id, pack_offset, n_seqs)
    where ``pack_id`` is the budget-window index within the stream that
    the document STARTS in, ``pack_offset`` its token offset inside that
    window, and ``n_seqs`` how many windows it spans.

    ``tokens_col`` supplies a precomputed token count; otherwise
    whitespace tokens of ``text_col`` are counted.  ``n_streams`` is
    capped at 256 (stream id = first two md5 hex digits of the key).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if not 1 <= n_streams <= 256:
        raise ValueError(f"n_streams must be in [1, 256], got {n_streams}")
    toks = (
        F.col(tokens_col)
        if tokens_col
        else F.size(F.split(F.col(text_col), " "))
    )
    h = f"substr(md5(concat('{seed}', '|', CAST({id_col} AS STRING))), 1, 8)"
    stream = (
        f"({_HEXPOS.format(h=h, i=1)} * 16 + {_HEXPOS.format(h=h, i=2)})"
        f" % {n_streams}"
    )
    base = df.select(
        F.col(id_col),
        toks.cast("long").alias("n_tokens"),
        F.expr(h).alias("__h__"),
        F.expr(stream).cast("int").alias("stream"),
    )
    w = (
        Window.partitionBy("stream")
        .orderBy(F.col("__h__"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("__end__", F.sum("n_tokens").over(w))
        .withColumn("__start__", F.col("__end__") - F.col("n_tokens"))
        .select(
            id_col,
            "n_tokens",
            "stream",
            (F.col("__start__") / budget).cast("long").alias("pack_id"),
            (F.col("__start__") % budget).alias("pack_offset"),
            F.when(F.col("n_tokens") == 0, F.lit(1))
            .otherwise(
                (F.expr("__end__ - 1") / budget).cast("long")
                - (F.col("__start__") / budget).cast("long")
                + 1
            )
            .cast("long")
            .alias("n_seqs"),
        )
    )


def shard_assignment(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
    n_shards: int = 8,
    mode: str = "hash",
    seed: str = "",
) -> DataFrame:
    """Assign every document to one of ``n_shards`` output shards.

    Output: (``id_col``, n_tokens, shard).

    Two modes for two regimes:
     - ``hash`` (the corpus-scale path): shard = md5 bucket of the key —
       a pure per-row predicate, zero shuffle, balanced to ~sqrt(n/shards)
       tokens by the law of large numbers.  This is the only mode that
       scans document data, and it never moves it.
     - ``balanced`` (the shard-PLANNER path): boustrophedon ("snake")
       assignment over the token-count-descending global order — shard
       token totals match to within one document.  Runs a global-order
       window (single-partition sort), which is fine for what it's for:
       planners run on the (id, n_tokens) METADATA projection — two longs
       per document, not the corpus — as the finalize step after counts
       are aggregated.  For 10^9+ docs use ``hash``.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    toks = (
        F.col(tokens_col)
        if tokens_col
        else F.size(F.split(F.col(text_col), " "))
    ).cast("bigint")
    base = df.select(F.col(id_col), toks.alias("n_tokens"))
    if mode == "hash":
        bucket = (
            f"CAST(conv(substr(md5(concat('{seed}', '|', "
            f"CAST({id_col} AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        )
        return base.withColumn(
            "shard", F.expr(f"CAST({bucket} % {n_shards} AS INT)")
        )
    if mode == "balanced":
        w = Window.orderBy(F.col("n_tokens").desc(), F.col(id_col).asc())
        rn = F.row_number().over(w) - 1  # 0-based
        pos = rn % (2 * n_shards)
        snake = F.when(pos < n_shards, pos).otherwise(2 * n_shards - 1 - pos)
        return base.withColumn("shard", snake.cast("int"))
    raise ValueError(f"unknown mode {mode!r}; use 'hash' or 'balanced'")


def concat_chunk_plan(
    df: DataFrame,
    chunk_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
    epoch: int = 0,
    seed: str = "",
) -> DataFrame:
    """Pretraining sequence construction: concatenate documents in a
    deterministic per-epoch order and split the stream into fixed
    ``chunk_tokens`` windows that CROSS document boundaries — the actual
    shape of LM training batches (``pack_sequences`` keeps documents
    whole; this is the concat-and-chunk alternative).

    Output: one row per (document, chunk) overlap —
    (shard, chunk_no, id, tok_from, tok_to), 1-based inclusive token
    slice of the document that lands in that chunk.  A writer groups by
    (shard, chunk_no) and slices each doc's tokens to materialize
    sequences; every column is a pure function of (seed, epoch, ids), so
    any engine reproduces the exact same batches.

    Scale shape: the order is ``sampling.epoch_shuffle``'s md5 hash; the
    cumulative token offset is ONE window sum per shard partition (shard
    count = parallelism knob, shards are hash-balanced so partitions are
    corpus/n_shards sized); chunk overlap rows come from a per-row
    sequence explode (a doc spans ceil(n/chunk)+1 chunks at most).  No
    text moves — the plan carries only ids, counts, and offsets.
    """
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    from .sampling import epoch_shuffle

    c = chunk_tokens
    toks = df.select(
        id_col, F.expr(f"size(split({text_col}, ' '))").alias("__n__")
    ).filter(F.col("__n__") > 0)
    ordered = epoch_shuffle(toks, key_col=id_col, epoch=epoch,
                            n_shards=n_shards, seed=seed)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("sort_key").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pos = ordered.withColumn(
        "__start__", F.coalesce(F.sum("__n__").over(w), F.lit(0))
    )
    return (
        pos.select(
            "shard",
            F.col(id_col),
            "__n__",
            "__start__",
            F.explode(
                F.expr(f"sequence(__start__ div {c}, "
                       f"(__start__ + __n__ - 1) div {c})")
            ).alias("__k__"),
        )
        .select(
            "shard",
            F.col("__k__").cast("int").alias("chunk_no"),
            F.col(id_col),
            F.expr(f"CAST(greatest(__k__ * {c} - __start__, 0) + 1 AS INT)")
            .alias("tok_from"),
            F.expr(f"CAST(least((__k__ + 1) * {c} - __start__, __n__) AS INT)")
            .alias("tok_to"),
        )
    )
