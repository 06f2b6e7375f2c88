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
(~1% of corpus bytes, see SCALING.md), NOT engine streaming state.

Scale + crash posture (both previously flagged, both fixed here):

* Novel-row selection is a ``left_semi`` join on ``doc_id`` — never a
  driver-side ``collect()`` + ``isin(...)`` literal, so driver memory
  and plan size are independent of batch novelty (a bootstrap-scale
  batch with millions of novel docs stays fully distributed).
* Every batch is intra-batch deduped (exact md5 + minhash near-dup)
  before anything is appended, so two copies of the same new text in
  ONE micro-batch still yield one corpus row.
* Appends are ordered exact-index FIRST, corpus LAST. On checkpoint
  replay after a mid-append crash, re-processed rows classify as
  ``exact_dup`` with ``match_id == doc_id`` (they matched *their own*
  interrupted index entry); the batch function detects these
  self-matches and completes only the missing appends (anti-joined per
  table), making replay idempotent for every crash point — not just
  the all-appends-completed case.
* The (band, bkey) index is probed through a BUCKETED catalog mirror
  (``bucketBy(band, bkey)`` parquet table): the index side of every
  micro-batch's classify join arrives pre-partitioned on the join key,
  so only the small batch side shuffles — at a 10⁹-doc corpus the
  index is the big side, and reshuffling it per micro-batch would
  dominate gate cost. The versioned table stays authoritative (the
  mirror is a pure projection, rebuilt by ``rebuild_bands_mirror`` on
  the maintenance cadence); mirror writes precede versioned writes so
  the mirror can only ever over-approximate (spurious candidates die
  in the signature verify; missing ones would miss duplicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..operators.dedup import (
    N_BANDS,
    N_PERM,
    _minhash_sig,
    _mod_hashes,
    _shingle_hashes,
    _tokenized,
    build_dedup_index,
    incremental_dedup,
)
from ..pipeline.tables import VersionedTable

_INDEX_PARTS = ("exact", "sigs", "bands")
_MIRROR_BUCKETS = 16


def index_paths(root: str) -> dict[str, str]:
    return {k: f"{root}/idx_{k}" for k in _INDEX_PARTS}


def bands_mirror_name(index_root: str) -> str:
    """Catalog name of the bucketed bands-index mirror for one ingest
    gate (root-hashed: catalog names are global, index roots aren't)."""
    import hashlib as _hl

    return "dedup_bands_" + _hl.md5(index_root.encode()).hexdigest()[:12]


def _mirror_write(df: DataFrame, name: str, mode: str) -> None:
    (
        df.write.bucketBy(_MIRROR_BUCKETS, "band", "bkey")
        .sortBy("band", "bkey")
        .mode(mode)
        .format("parquet")
        .saveAsTable(name)
    )


def rebuild_bands_mirror(spark, index_root: str) -> None:
    """Re-derive the bucketed mirror from the authoritative versioned
    bands table — the compaction/self-heal path (each micro-batch
    append adds ``_MIRROR_BUCKETS`` files; run this on the maintenance
    cadence to re-pack them, or whenever the mirror is suspected stale:
    the mirror is a pure projection, always rebuildable)."""
    bands = VersionedTable(spark, index_paths(index_root)["bands"]).read()
    _mirror_write(bands, bands_mirror_name(index_root), "overwrite")


def _band_keys(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, bkey) LSH band keys for a (doc_id, sig) frame —
    same banding as ``build_dedup_index`` so intra-batch candidates use
    the index's collision structure."""
    r = N_PERM // N_BANDS
    return sigs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {N_BANDS - 1}), "
                f"b -> struct(b AS band, xxhash64(concat_ws(',', "
                f"slice(sig, b * {r} + 1, {r}))) AS bkey))"
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.bkey")


def intra_batch_dedup(
    df: DataFrame,
    threshold: float = 0.5,
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """Drop exact and near duplicates WITHIN one micro-batch, keeping
    the lowest doc_id of each duplicate group.

    Exact: row_number over md5(text). Near: minhash band self-join →
    candidate pairs → signature-estimated Jaccard ≥ threshold → the
    higher doc_id of every verified pair is dropped (greedy,
    deterministic — survivors contain no near-dup pair). All joins key
    on (band, bkey); the pair space is confined to bucket collisions,
    so the pass is batch-bounded at any corpus size."""
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    surv = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    sigs = (
        _tokenized(surv)
        .select("doc_id", _shingle_hashes().alias("__sh"))
        .withColumn("__hb", _mod_hashes("__sh"))
        .select("doc_id", _minhash_sig("__hb").alias("sig"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if caches is not None:
        caches.append(sigs)
    bands = _band_keys(sigs)
    cand = (
        bands.alias("l")
        .join(
            bands.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )
    est = (
        F.size(
            F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda b: b)
        ).cast("double")
        / N_PERM
    )
    drop = (
        cand.join(
            sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")),
            "doc_a",
        )
        .join(
            sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")),
            "doc_b",
        )
        .filter(est >= threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return surv.join(drop, "doc_id", "left_anti")


def select_novel(batch_df: DataFrame, classified: DataFrame) -> DataFrame:
    """Batch rows classified novel — a distributed ``left_semi`` join,
    NEVER ``collect()`` + ``isin(...)`` (a literal ``In`` over novel ids
    would grow driver memory and plan size with batch novelty; see the
    plan guardrail in ``tests/test_plans.py``)."""
    return batch_df.join(
        classified.filter(F.col("status") == "novel").select("doc_id"),
        "doc_id",
        "left_semi",
    )


def dedup_ingest_batch(
    batch_df: DataFrame,
    corpus_path: str,
    index_root: str,
    threshold: float = 0.5,
) -> None:
    """One micro-batch through the dedup gate (the foreachBatch body).

    Bootstrap: first batch creates index (exact first) + corpus.
    Steady state: novel docs' signatures append to the index, then the
    docs to the corpus. Only novel-doc data is written — duplicate-heavy
    batches cost their scan plus index joins, nothing more. Append order
    exact → sigs → bands → corpus plus the self-match recovery below
    makes checkpoint replay idempotent at every crash point."""
    if not batch_df.take(1):
        return
    spark = batch_df.sparkSession
    paths = index_paths(index_root)
    mirror = bands_mirror_name(index_root)
    if not VersionedTable.exists(paths["exact"]):
        boot_caches: list[DataFrame] = []
        novel = intra_batch_dedup(batch_df, threshold, caches=boot_caches)
        idx = build_dedup_index(novel)
        for k in _INDEX_PARTS:
            VersionedTable.create(spark, paths[k], idx[k])
        _mirror_write(idx["bands"], mirror, "overwrite")
        VersionedTable.create(spark, corpus_path, novel)
        for c in boot_caches + [idx["_sig_cache"]]:
            c.unpersist()
        return
    index = {k: VersionedTable(spark, p).read() for k, p in paths.items()}
    # auth_bands stays the versioned read (file list pinned at .read()
    # time) for the recovery anti-joins below: a catalog-table reference
    # resolves lazily by NAME, so after this batch's own mirror append
    # it would already contain the rows being anti-joined away
    auth_bands = index["bands"]
    if spark.catalog.tableExists(mirror):
        # probe the BUCKETED mirror: the index side of the steady-state
        # classify join arrives pre-partitioned on (band, bkey), so only
        # the (small) batch side shuffles — the index is never
        # reshuffled per micro-batch (plan-pinned in
        # tests/test_streaming.py::test_dedup_bands_mirror_join_no_index_shuffle).
        # Safe under recompute: bands only GENERATE candidates, which the
        # sig verify checks against the pinned versioned sigs frame.
        index["bands"] = spark.table(mirror)
    # every persisted frame this batch creates (directly or inside
    # incremental_dedup / build_dedup_index) is unpersisted before
    # returning — a foreachBatch loop that leaks per-batch caches
    # accumulates blocks unboundedly (ADVICE r13)
    caches: list[DataFrame] = []
    classified = incremental_dedup(
        batch_df, index, threshold=threshold, caches=caches
    ).persist(StorageLevel.MEMORY_AND_DISK)
    caches.append(classified)
    novel = intra_batch_dedup(
        select_novel(batch_df, classified), threshold, caches=caches
    ).persist(StorageLevel.MEMORY_AND_DISK)
    caches.append(novel)
    idx = build_dedup_index(novel)
    caches.append(idx["_sig_cache"])

    # Crash recovery: a row whose exact match is ITSELF was indexed by an
    # interrupted earlier attempt of this same (replayed) batch — finish
    # whatever appends it is missing. Empty in the happy path (one take(1)
    # probe); anti-joins are recovery-row-bounded.
    recov = batch_df.join(
        classified.filter(
            (F.col("status") == "exact_dup")
            & (F.col("match_id") == F.col("doc_id"))
        ).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    has_recov = bool(recov.take(1))
    if not has_recov and not novel.take(1):
        for c in caches:
            c.unpersist()
        return
    sigs_add = idx["sigs"]
    bands_add = idx["bands"]
    corpus_add = novel
    if has_recov:
        ridx = build_dedup_index(recov)
        caches.append(ridx["_sig_cache"])
        sigs_add = sigs_add.unionByName(
            ridx["sigs"].join(index["sigs"], "corpus_id", "left_anti")
        )
        bands_add = bands_add.unionByName(
            ridx["bands"].join(
                auth_bands.select("corpus_id").distinct(),
                "corpus_id",
                "left_anti",
            )
        )
        corpus_add = corpus_add.unionByName(
            recov.join(
                VersionedTable(spark, corpus_path).read().select("doc_id"),
                "doc_id",
                "left_anti",
            )
        )
    VersionedTable(spark, paths["exact"]).append(idx["exact"])
    VersionedTable(spark, paths["sigs"]).append(sigs_add)
    if spark.catalog.tableExists(mirror):
        # mirror BEFORE the versioned append: the mirror may only ever be
        # a superset of the authoritative table (extra rows cost spurious
        # candidates, discarded by the sig verify; missing rows would
        # miss duplicates). Replay can re-append the same band rows —
        # candidates are .distinct()ed, and rebuild_bands_mirror
        # re-packs/dedups on the maintenance cadence. bands_add's plan
        # anti-joins only pinned versioned reads (auth_bands), so its
        # recompute for the versioned append below is unaffected by this
        # write's cache invalidation.
        _mirror_write(bands_add, mirror, "append")
    VersionedTable(spark, paths["bands"]).append(bands_add)
    VersionedTable(spark, corpus_path).append(corpus_add)
    for c in caches:
        c.unpersist()


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
