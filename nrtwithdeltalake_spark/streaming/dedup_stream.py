"""Dedup-at-ingest: the incremental signature-index dedup
(``operators.dedup.build_dedup_index`` / ``incremental_dedup``) run as a
streaming ``foreachBatch`` loop — every micro-batch of documents is
classified against the corpus index, novel docs land in the corpus
table, and their signatures are appended to the index tables, so the
next micro-batch (or any later one) sees them.

This is the NRT form of the reference's bronze→silver loop
(``/root/reference/COPY_MSQL_TO_SILVER.py:259-260``) applied to
training-data hygiene: the "silver" invariant here is "no exact or
near duplicate ever enters the corpus". State is the signature index
(~1% of corpus bytes, see SCALING.md), NOT engine streaming state — so
restarts are trivially safe: re-processing a batch re-classifies
against the already-updated index and its duplicates simply drop
(classification is idempotent by content).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.dedup import build_dedup_index, incremental_dedup
from ..pipeline.tables import VersionedTable

_INDEX_PARTS = ("exact", "sigs", "bands")


def index_paths(root: str) -> dict[str, str]:
    return {k: f"{root}/idx_{k}" for k in _INDEX_PARTS}


def dedup_ingest_batch(
    batch_df: DataFrame,
    corpus_path: str,
    index_root: str,
    threshold: float = 0.5,
) -> None:
    """One micro-batch through the dedup gate (the foreachBatch body).

    Bootstrap: first batch creates corpus + index. Steady state: novel
    docs append to the corpus, their signatures to the index. Only
    novel-doc data is written — duplicate-heavy batches cost their scan
    plus index joins, nothing more."""
    if not batch_df.take(1):
        return
    spark = batch_df.sparkSession
    paths = index_paths(index_root)
    if not VersionedTable.exists(paths["exact"]):
        # intra-batch exact dedup before bootstrap (keep lowest doc_id)
        first = batch_df.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy(
                    "doc_id"
                )
            ),
        )
        novel = first.filter(F.col("__rn") == 1).drop("__rn")
        VersionedTable.create(spark, corpus_path, novel)
        idx = build_dedup_index(novel)
        for k, p in paths.items():
            VersionedTable.create(spark, p, idx[k])
        return
    index = {k: VersionedTable(spark, p).read() for k, p in paths.items()}
    classified = incremental_dedup(batch_df, index, threshold=threshold)
    novel_ids = [
        r.doc_id for r in classified.filter(F.col("status") == "novel").collect()
    ]
    if not novel_ids:
        return
    novel = batch_df.filter(F.col("doc_id").isin(novel_ids))
    VersionedTable(spark, corpus_path).append(novel)
    idx = build_dedup_index(novel)
    for k, p in paths.items():
        VersionedTable(spark, p).append(idx[k])


def run_dedup_ingest(
    stream_df: DataFrame,
    corpus_path: str,
    index_root: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
) -> None:
    """Attach the dedup gate to a document stream and drain available
    input (availableNow trigger — the scheduled-ingest shape)."""
    q = (
        stream_df.writeStream.foreachBatch(
            lambda df, _epoch: dedup_ingest_batch(
                df, corpus_path, index_root, threshold
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
