"""Multimodal column support: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns flowing through
the same DataFrames as relational data (SURVEY.md §2.2 north-star row).
The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic fake — but the Spark-side plumbing is real:
binary columns, Arrow batch transfer, ``mapInPandas`` batch iteration,
typed output schema, partition-preserving execution.

At 100 TB: payload bytes dominate; keep them in their own column so
Parquet column pruning skips them unless the operator needs them, and
size ``spark.sql.files.maxPartitionBytes`` so a batch of payloads fits
executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .helpers import fan_out


def q_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata without decoding: payload size and content
    hash. Runs entirely JVM-side (oracle-backed)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
    )


ORACLE_MULTIMODAL_BYTES = """
SELECT doc_id,
       cast(octet_length(encode(text)) as bigint) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
"""


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder — the real one would call PIL/ffmpeg, unavailable in
    this container. Deterministic fake: dimensions derived from the
    payload digest, 'frame count' from payload length. Replace the body
    with a real codec without touching the Spark plumbing."""
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0] % 1024
    height = 64 + digest[1] % 1024
    n_frames = 1 + len(payload) % 32
    return width, height, n_frames


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract over binary payloads via ``mapInPandas``:
    Arrow-batched binary in, typed metadata out. The pandas function is
    the pattern for any per-payload Python step (image resize, audio
    frame-sample, thumbnail) — rows-only check (stubbed decode)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    with_payload = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": meta.map(lambda m: m[0]),
                    "height": meta.map(lambda m: m[1]),
                    "n_frames": meta.map(lambda m: m[2]),
                    "n_bytes": pdf["payload"].map(len),
                }
            )

    return with_payload.mapInPandas(
        decode_batches,
        schema="doc_id long, width int, height int, n_frames int, n_bytes long",
    )


MAX_SAMPLED_FRAMES = 4


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one input payload → N output rows (≤ 4 evenly
    strided 'frames'), the video-keyframe / audio-window extraction shape.
    Unlike decode (1→1), this exercises variable output cardinality
    through ``mapInPandas`` — the same pattern yields image tiles,
    audio windows, or PDF pages. Frame bytes are faked (codec-free
    container) as deterministic digests; the row shape, Arrow batching,
    and per-frame metadata are real. Rows-only check."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    with_payload = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_index": [],
                "frame_md5": [],
                "n_frames_total": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, _, n_frames = _fake_decode(payload)
                stride = max(1, -(-n_frames // MAX_SAMPLED_FRAMES))
                for idx in range(0, n_frames, stride):
                    out["doc_id"].append(doc_id)
                    out["frame_index"].append(idx)
                    # stand-in for decoded frame bytes: digest(payload‖idx)
                    out["frame_md5"].append(
                        hashlib.md5(payload + idx.to_bytes(4, "big")).hexdigest()
                    )
                    out["n_frames_total"].append(n_frames)
            yield pd.DataFrame(out)

    return with_payload.mapInPandas(
        sample_batches,
        schema=(
            "doc_id long, frame_index int, frame_md5 string, n_frames_total int"
        ),
    )


THUMB_W, THUMB_H = 64, 64


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/thumbnail: binary in → binary out with target dimensions —
    the 1→1 payload-transform shape (image resize, audio transcode,
    re-encode). The output stays a ``binary`` column so downstream
    operators (hashing, dedup, storage) treat it like any payload. Codec
    stubbed (deterministic digest-derived bytes, length ∝ thumb area);
    swap ``_fake_resize`` for PIL without touching the plumbing.
    Rows-only check."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    with_payload = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def _fake_resize(payload: bytes) -> bytes:
        seed = hashlib.md5(payload).digest()
        reps = (THUMB_W * THUMB_H) // len(seed)
        return seed * reps

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = pdf["payload"].map(_fake_resize)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": thumbs,
                    "thumb_w": THUMB_W,
                    "thumb_h": THUMB_H,
                    "n_bytes": thumbs.map(len),
                }
            )

    return with_payload.mapInPandas(
        resize_batches,
        schema="doc_id long, thumb binary, thumb_w int, thumb_h int, n_bytes long",
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL (non-stub) per-payload feature extraction: byte-level
    statistics (size, mean byte value, Shannon entropy of the byte
    histogram) computed with numpy over Arrow batches in
    ``mapInPandas``. No codec needed, so unlike the decode stub these
    numbers are genuine — proving the multimodal plumbing end-to-end
    with verifiable output (tests recompute them in pure Python).
    Entropy is the standard compressibility / corruption signal a media
    ingest pipeline screens on before spending decode cycles."""
    import numpy as np

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    with_payload = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"], "n_bytes": [], "mean_byte": [], "byte_entropy": []}
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                counts = np.bincount(arr, minlength=256)
                p = counts[counts > 0] / max(len(arr), 1)
                out["n_bytes"].append(len(arr))
                out["mean_byte"].append(round(float(arr.mean()) if len(arr) else 0.0, 6))
                out["byte_entropy"].append(round(float(-(p * np.log2(p)).sum()), 6))
            yield pd.DataFrame(out)

    return with_payload.mapInPandas(
        feats,
        "doc_id long, n_bytes long, mean_byte double, byte_entropy double",
    )


QUERIES = {
    "q_multimodal_bytes": q_multimodal_bytes,
    "q_multimodal_features": q_multimodal_features,
    "q_multimodal_decode": q_multimodal_decode,
    "q_multimodal_frame_sample": q_multimodal_frame_sample,
    "q_multimodal_resize": q_multimodal_resize,
}

ORACLES = {
    "q_multimodal_bytes": ORACLE_MULTIMODAL_BYTES,
}
