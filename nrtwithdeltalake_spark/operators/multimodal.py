"""Multimodal column support: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns flowing through
the same DataFrames as relational data (SURVEY.md §2.2 north-star row).
The decode step is REAL: payloads are genuine spec-compliant BMP/PNG
files (synthesized deterministically from the document fixture — the
container ships no media files) and every operator runs them through
the engine's own header-parsing, inflating, unfiltering codec
(``operators/imagecodec.py``), not a digest fake. The Spark plumbing
is the part that matters at scale and is equally real: binary columns,
Arrow batch transfer, ``mapInPandas`` batch iteration, typed output
schemas, partition-preserving execution.

At 100 TB: payload bytes dominate; keep them in their own column so
Parquet column pruning skips them unless the operator needs them, and
size ``spark.sql.files.maxPartitionBytes`` so a batch of payloads fits
executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .helpers import fan_out
from .imagecodec import decode_image, encode_bmp, encode_png


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


def synth_image(text: bytes) -> np.ndarray:
    """Deterministic (H, W, 3) uint8 image derived from document text —
    the fixture generator for the image operators (the container ships
    no media files). Dimensions 8–32 per side from the digest; pixel
    bytes from an md5 counter stream, so every payload is unique and
    reproducible in pure Python by the tests."""
    digest = hashlib.md5(text).digest()
    w = 8 + digest[0] % 25
    h = 8 + digest[1] % 25
    n = h * w * 3
    blocks = []
    for i in range(0, n, 16):
        blocks.append(hashlib.md5(digest + i.to_bytes(4, "big")).digest())
    stream = b"".join(blocks)[:n]
    return np.frombuffer(stream, dtype=np.uint8).reshape(h, w, 3)


def synth_payload(doc_id: int, text: bytes) -> bytes:
    """Real image bytes for one document: even doc_ids encode as BMP,
    odd as PNG — both decoders stay exercised in-pipeline."""
    img = synth_image(text)
    return encode_bmp(img) if doc_id % 2 == 0 else encode_png(img)


def _with_image_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload binary) — one real BMP/PNG file per document,
    produced in its own ``mapInPandas`` stage so the decode operators
    downstream consume a genuine Arrow-transferred binary column, same
    as they would reading a parquet of scraped images."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("text_bytes")
    )

    def synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        synth_payload(int(d), bytes(t))
                        for d, t in zip(pdf["doc_id"], pdf["text_bytes"])
                    ],
                }
            )

    return docs.mapInPandas(synth_batches, schema="doc_id long, payload binary")


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode over binary payloads via ``mapInPandas``:
    Arrow-batched BMP/PNG bytes in, typed metadata out — header parse,
    zlib inflate, scanline unfilter all happen here (imagecodec.py),
    exactly what a PIL/ffmpeg step would do with the same plumbing.
    Emits true dimensions, channel count, sniffed format, and the mean
    pixel value (the decode-proving statistic: it requires every pixel,
    not just headers). Python-recompute-verified; rows-only check."""
    payloads = _with_image_payload(spark, sf_dir)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": pdf["doc_id"],
                "width": [],
                "height": [],
                "channels": [],
                "img_format": [],
                "n_bytes": [],
                "mean_pixel": [],
            }
            for payload in pdf["payload"]:
                img = decode_image(bytes(payload))
                out["width"].append(img.shape[1])
                out["height"].append(img.shape[0])
                out["channels"].append(img.shape[2])
                out["img_format"].append(
                    "bmp" if bytes(payload[:2]) == b"BM" else "png"
                )
                out["n_bytes"].append(len(payload))
                out["mean_pixel"].append(round(float(img.mean()), 6))
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        decode_batches,
        schema=(
            "doc_id long, width int, height int, channels int, "
            "img_format string, n_bytes long, mean_pixel double"
        ),
    )


MAX_SAMPLED_FRAMES = 4
FRAME_BAND_H = 4  # a 'frame' is a 4-row horizontal band of the image


def sample_frames(payload: bytes) -> tuple[int, list[tuple[int, bytes]]]:
    """Pure-python core of the frame sampler (shared with the test
    recompute): decode the image, treat each ``FRAME_BAND_H``-row band
    as a frame, pick ≤ ``MAX_SAMPLED_FRAMES`` evenly strided bands, and
    re-encode each selected band as a standalone BMP — real decoded
    pixel bytes out, the video-keyframe extraction shape."""
    img = decode_image(payload)
    rgb = img[:, :, :3] if img.shape[2] >= 3 else np.repeat(img, 3, axis=2)
    n_frames = -(-rgb.shape[0] // FRAME_BAND_H)
    stride = max(1, -(-n_frames // MAX_SAMPLED_FRAMES))
    out = []
    for idx in range(0, n_frames, stride):
        band = np.ascontiguousarray(
            rgb[idx * FRAME_BAND_H : (idx + 1) * FRAME_BAND_H]
        )
        out.append((idx, encode_bmp(band)))
    return n_frames, out


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one input payload → N output rows (≤ 4 evenly
    strided frames), the video-keyframe / audio-window extraction shape.
    Unlike decode (1→1), this exercises variable output cardinality
    through ``mapInPandas``; each emitted frame is a REAL standalone
    BMP cut from the decoded pixels (see ``sample_frames``), fingerprinted
    by md5 of its actual bytes. Rows-only check (python-recompute test)."""
    payloads = _with_image_payload(spark, sf_dir)

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_index": [],
                "frame_md5": [],
                "frame_bytes": [],
                "n_frames_total": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames, frames = sample_frames(bytes(payload))
                for idx, frame in frames:
                    out["doc_id"].append(doc_id)
                    out["frame_index"].append(idx)
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
                    out["frame_bytes"].append(frame)
                    out["n_frames_total"].append(n_frames)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        sample_batches,
        schema=(
            "doc_id long, frame_index int, frame_md5 string, "
            "frame_bytes binary, n_frames_total int"
        ),
    )


THUMB_W, THUMB_H = 8, 8


def box_resize(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Integer-bin box downsample (area average, round-half-up): the
    deterministic resize kernel — no float-libm variance across
    platforms beyond IEEE division, reproducible in pure numpy by the
    tests."""
    h, w, c = img.shape
    re = (np.arange(th + 1) * h) // th
    ce = (np.arange(tw + 1) * w) // tw
    out = np.empty((th, tw, c), dtype=np.uint8)
    for r in range(th):
        for col in range(tw):
            block = img[re[r] : re[r + 1], ce[col] : ce[col + 1]]
            out[r, col] = np.floor(
                block.reshape(-1, c).mean(axis=0) + 0.5
            ).astype(np.uint8)
    return out


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/thumbnail: binary in → binary out — the 1→1
    payload-transform shape (image resize, audio transcode, re-encode).
    REAL pixels: decode the BMP/PNG, box-downsample to 8×8 with
    ``box_resize``, re-encode as BMP. The output stays a ``binary``
    column so downstream operators (hashing, dedup, storage) treat it
    like any payload. Rows-only check (python-recompute test decodes
    the thumbs back)."""
    payloads = _with_image_payload(spark, sf_dir)

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [
                encode_bmp(
                    box_resize(
                        decode_image(bytes(p))[:, :, :3], THUMB_W, THUMB_H
                    )
                )
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": thumbs,
                    "thumb_w": THUMB_W,
                    "thumb_h": THUMB_H,
                    "n_bytes": [len(t) for t in thumbs],
                }
            )

    return payloads.mapInPandas(
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
