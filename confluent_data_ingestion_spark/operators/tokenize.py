"""Distributed BPE tokenizer training: learn merge rules from a corpus —
the tokenizer-construction step of a training-data pipeline (the
reference pipelines stop at token COUNTING; a 100 TB text pipeline also
has to train the tokenizer that does the counting).

Algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units"): start from characters, repeatedly merge the
most frequent adjacent symbol pair.  Distributed shape:

 1. ONE corpus-sized shuffle builds the (word, count) table; every merge
    iteration after that touches only this VOCABULARY-sized frame — the
    classic trick that makes BPE training tractable at corpus scale.
 2. Per iteration: pair counts are a map-side-combined aggregation over
    the word table; the argmax pair is a 1-ROW DataFrame (max count,
    lexicographic tiebreak) that BROADCASTS onto the word table — the
    re-segmentation fold reads the pair from join columns, so the driver
    never collects anything; merges accumulate as a union of 1-row
    frames.
 3. Re-segmentation is a Catalyst ``aggregate`` fold implementing the
    standard greedy left-to-right non-overlapping merge.
 4. ``localCheckpoint`` per iteration keeps the plan depth constant
    (the connected-components recipe).

Determinism: counts are exact longs; the argmax tiebreak is total
(count desc, left asc, right asc) — any engine reproduces the same merge
sequence, which the pure-Python differential reference in
tests/test_bpe.py verifies end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# greedy left-to-right non-overlapping merge of adjacent pair (A, B) -> M
# over a symbol array, as a single Catalyst fold.  State: (out, carry).
_MERGE_FOLD = """
    CASE WHEN size(syms) = 0 THEN syms ELSE
    aggregate(
      slice(syms, 2, size(syms) - 1),
      struct(CAST(array() AS array<string>) AS out,
             element_at(syms, 1) AS carry),
      (acc, x) -> CASE
        WHEN acc.carry = {a} AND x = {b}
          THEN struct(concat(acc.out, array({m})) AS out,
                      CAST(NULL AS STRING) AS carry)
        WHEN acc.carry IS NULL THEN struct(acc.out AS out, x AS carry)
        ELSE struct(concat(acc.out, array(acc.carry)) AS out,
                    x AS carry) END,
      acc -> CASE WHEN acc.carry IS NULL THEN acc.out
                  ELSE concat(acc.out, array(acc.carry)) END
    ) END
"""


def _word_table(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "w", "cnt",
            F.expr("CAST(split(w, '') AS array<string>)").alias("syms"),
        )
    )


def bpe_train_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules from the corpus.  Output:
    (rank, left, right, merged, pair_count) — rank 1 is the first (most
    frequent) merge.  Fewer rows come back if the vocabulary exhausts
    its adjacent pairs first."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    words_plan = _word_table(df, text_col)
    # the model loop touches only the VOCABULARY-sized table (the one
    # corpus shuffle happens building it); when the vocabulary fits the
    # bounded-collect budget, run the merge loop driver-side — the same
    # integers and the same (count desc, left, right) total order, with
    # zero per-iteration Spark jobs.  The tokenizer model is driver-side
    # by design anyway (bpe_segment collects it into plan literals).
    head = words_plan.select("w", "cnt").take(_DRIVER_BPE_MAX_VOCAB + 1)
    if len(head) <= _DRIVER_BPE_MAX_VOCAB:
        return _bpe_train_driver(df.sparkSession, head, n_merges)
    words = words_plan.localCheckpoint()
    merges: DataFrame | None = None
    for rank in range(1, n_merges + 1):
        pairs = (
            words.select(
                "cnt",
                F.explode(
                    F.expr(
                        "CASE WHEN size(syms) >= 2 THEN "
                        "transform(sequence(1, size(syms) - 1), i -> "
                        "struct(element_at(syms, i) AS a, "
                        "element_at(syms, i + 1) AS b)) "
                        "ELSE CAST(array() AS array<struct<a:string,b:string>>)"
                        " END"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("pc"))
        )
        # total-order argmax as a 1-row aggregate: max_by over a struct
        # whose ordering is (count desc, left asc, right asc) — encoded by
        # negating the count in the comparison struct
        best = pairs.agg(
            F.expr("min_by(struct(a, b, pc), struct(-pc, a, b))").alias("m")
        ).select(
            F.lit(rank).cast("int").alias("rank"),
            F.col("m.a").alias("left"),
            F.col("m.b").alias("right"),
            F.concat(F.col("m.a"), F.col("m.b")).alias("merged"),
            F.col("m.pc").alias("pair_count"),
        ).filter(F.col("left").isNotNull())
        # ONE materialization per iteration: the argmax row broadcasts
        # onto the word table and RIDES ALONG as constant columns, so the
        # single localCheckpoint pins the re-segmented vocabulary AND the
        # chosen merge together (two checkpoints per rank — best, then
        # words — doubled the job count for a loop whose cost is pure
        # scheduling at small vocab; the merges union then reads the
        # constants back from the checkpointed frame, never re-running a
        # rank's vocabulary aggregation)
        fold = _MERGE_FOLD.format(a="left", b="right", m="merged")
        words = (
            words.crossJoin(F.broadcast(best))
            .select(
                "w", "cnt", F.expr(fold).alias("syms"),
                "rank", "left", "right", "merged", "pair_count",
            )
            .localCheckpoint()
        )
        best = words.select(
            "rank", "left", "right", "merged", "pair_count"
        ).limit(1)
        merges = best if merges is None else merges.unionByName(best)
        words = words.select("w", "cnt", "syms")
    return merges


# Vocabulary bound for the driver-side merge loop: 64k (word, count)
# rows is a few MB — the bounded-reduction class (a tokenizer
# vocabulary, not row data).  Above it the distributed loop runs.
_DRIVER_BPE_MAX_VOCAB = 65536


def _bpe_train_driver(spark, head, n_merges: int) -> DataFrame:
    """The merge loop of ``bpe_train_merges`` over a collected
    vocabulary: identical arithmetic (exact long counts, the same
    (count desc, left asc, right asc) argmax — Python's code-point
    string order IS UTF8String's byte order, UTF-8 preserves it) and
    the identical greedy left-to-right non-overlapping re-segmentation
    the ``_MERGE_FOLD`` expression applies.  Pinned against the same
    pure-Python reference as the distributed loop in tests/test_bpe.py."""
    words = [(r["w"], int(r["cnt"])) for r in head]
    segs = {w: list(w) for w, _ in words}
    out_rows = []
    for rank in range(1, n_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for w, cnt in words:
            s = segs[w]
            for i in range(len(s) - 1):
                k = (s[i], s[i + 1])
                pairs[k] = pairs.get(k, 0) + cnt
        if not pairs:
            break
        (a, b), pc = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out_rows.append((rank, a, b, a + b, pc))
        for w, _cnt in words:
            s, out, carry = segs[w], [], None
            for x in s:
                if carry is None:
                    carry = x
                elif carry == a and x == b:
                    out.append(a + b)
                    carry = None
                else:
                    out.append(carry)
                    carry = x
            if carry is not None:
                out.append(carry)
            segs[w] = out
    return spark.createDataFrame(
        out_rows,
        "rank int, left string, right string, merged string, "
        "pair_count bigint",
    )


def bpe_segment(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Apply learned merge rules (in rank order) to segment each row's
    words into BPE tokens.  The merges table is collected ONCE into the
    plan as expression literals (it is the trained model — a few hundred
    rows, driver-side by design, exactly like broadcasting a centroid
    set); segmentation itself is a per-row fold chain, zero shuffle.

    Empty words (consecutive/leading/trailing spaces) are dropped before
    segmenting — the same rule ``_word_table`` applies during training,
    so engine and oracle agree on irregular whitespace."""
    rules = [
        (r["left"], r["right"], r["merged"])
        for r in merges.orderBy("rank").collect()
    ]

    def q(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    # one nested expression, built inside out: each rule's fold wraps
    # the previous rule's expression EXACTLY ONCE (no exponential
    # blowup — total text is linear in the rule count), and the single
    # select costs one analysis pass where a withColumn-per-rule chain
    # paid one pass per rule over a growing plan (~1 s of driver time
    # for 8 rules, measured)
    expr = (
        f"transform(filter(split({text_col}, ' '), w -> w <> ''), "
        "w -> CAST(split(w, '') AS array<string>))"
    )
    for a, b, m in rules:
        fold = _MERGE_FOLD.format(a=q(a), b=q(b), m=q(m))
        expr = f"transform({expr}, syms -> {fold})"
    return df.select("*", F.expr(expr).alias(out_col))
