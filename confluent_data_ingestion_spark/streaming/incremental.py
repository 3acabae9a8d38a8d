"""Streaming incremental dedup: label each microbatch of an incoming
document stream against a persisted dedup index, grow the index with the
batch's accepted (novel) documents, and emit the labeled batch.

This is the streaming form of ``operators.dedup.dedup_against_corpus`` —
the daily-ingest loop collapsed to per-microbatch cadence.  The index is
the :func:`operators.dedup.build_dedup_index` pair persisted as parquet
(``<index_dir>/digests``, ``<index_dir>/bands``): each batch reads the
index state as of its start (so a doc first seen in batch k IS a
duplicate in batch k+1), labels itself with semi-joins on 32-byte keys,
appends the novel docs' digests/band keys, and appends the labeled rows
to the output.

Scale notes: the per-batch cost is (batch size) signature scans plus
semi-joins against the index — the corpus is never re-scanned.  The index
parquet grows by append; compact it offline (distinct rewrite) when the
file count matters.  Intra-batch duplicates are not collapsed here (two
copies of the same novel text in ONE batch both label novel) — run
``exact_dedup`` inside the batch first if that matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    _minhash_band_keys,
    build_dedup_index,
    dedup_against_corpus,
)


def init_dedup_index(base_df: DataFrame, index_dir: str, **kw) -> None:
    """Materialize the index parquet pair from a base corpus (empty base
    -> empty index files, so the first batch labels everything novel)."""
    idx = build_dedup_index(base_df, **kw)
    idx["digests"].write.mode("overwrite").parquet(f"{index_dir}/digests")
    idx["bands"].write.mode("overwrite").parquet(f"{index_dir}/bands")


def streaming_ingest_dedup(
    stream_df: DataFrame,
    index_dir: str,
    out_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    max_group_size: int | None = 500,
):
    """Start the labeling stream; returns the StreamingQuery.

    ``stream_df`` must carry ``id_col`` and ``text_col``.  Output rows =
    input columns + ``verdict`` (dup_exact / dup_near / novel), appended
    to ``out_path`` as parquet.
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        index = {
            "digests": spark.read.parquet(f"{index_dir}/digests"),
            "bands": spark.read.parquet(f"{index_dir}/bands"),
        }
        labels = dedup_against_corpus(
            batch_df, index=index, id_col=id_col, text_col=text_col, n=n,
            num_hashes=num_hashes, rows_per_band=rows_per_band,
            max_group_size=max_group_size,
        )
        labeled = batch_df.join(labels, id_col)
        labeled.persist()
        try:
            labeled.write.mode("append").parquet(out_path)
            novel = labeled.filter(F.col("verdict") == "novel").select(
                id_col, text_col
            )
            novel.select(F.md5(F.col(text_col)).alias("d")).distinct() \
                .write.mode("append").parquet(f"{index_dir}/digests")
            _minhash_band_keys(novel, id_col, text_col, n, num_hashes,
                               rows_per_band) \
                .select("band", "key").distinct() \
                .write.mode("append").parquet(f"{index_dir}/bands")
        finally:
            labeled.unpersist()

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
