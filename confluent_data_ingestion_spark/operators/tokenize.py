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
    words = _word_table(df, text_col).localCheckpoint()
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

    out = df.withColumn(
        "__t0__",
        F.expr(
            f"transform(filter(split({text_col}, ' '), w -> w <> ''), "
            "w -> CAST(split(w, '') AS array<string>))"
        ),
    )
    prev = "__t0__"
    # one withColumn per rule, each referencing the PREVIOUS column by
    # name — the fold expression appears once per rule, not once per
    # upstream reference (no exponential expression blowup)
    for i, (a, b, m) in enumerate(rules):
        fold = _MERGE_FOLD.format(a=q(a), b=q(b), m=q(m))
        nxt = f"__t{i + 1}__"
        out = out.withColumn(nxt, F.expr(
            f"transform({prev}, syms -> {fold})"
        ))
        prev = nxt
    keep = [c for c in out.columns if not c.startswith("__t")]
    return out.select(*keep, F.col(prev).alias(out_col))
