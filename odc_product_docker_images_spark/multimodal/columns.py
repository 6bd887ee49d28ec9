"""Multimodal columns (SURVEY.md §2.10 X5).

Image/audio/video payloads as opaque ``binary`` columns with typed metadata
structs — the Spark-side plumbing (schema, batch shape, partition-safe UDF
signatures) is real and tested; the codec itself is STUBBED because decode
libraries (PIL/ffmpeg) are not in this container.

Design for 100 TB of media:
- payload is a BinaryType column; Parquet stores it row-grouped so metadata
  predicates prune without touching bytes (select meta-only → column
  pruning skips the blobs entirely — the same trick as band pruning).
- decode/resize/frame-sample run as ``mapInPandas`` over Arrow batches:
  bytes → numpy, no shuffle, linear scale-out; batch size bounded via
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of blobs
  fits executor memory.
- derived features (dims, channels, per-band stats) land in sibling typed
  columns so downstream ops never re-touch the payload.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

DECODERS_AVAILABLE = False  # flip when PIL/soundfile exist in the image


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decode: derive (width, height,
    channels) from a content hash.  A real deployment replaces this body
    with PIL/turbojpeg; the signature and batch shape are the contract."""
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 4


def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    if DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real decoder wiring goes here (PIL not in container)")
    for pdf in it:
        dims = [_fake_decode(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "channels": [d[2] for d in dims],
            }
        )


@register("multimodal_decode")  # ⊘oracle: binary plumbing + stubbed codec — pytest-checked
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: synthesize a binary payload column (documents.text bytes as the
    opaque blob) + typed metadata, run the decode stub via mapInPandas."""
    dc = load(spark, sf_dir, "documents")
    media = dc.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.col("n_chars").cast("bigint").alias("content_length"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )
    return media.select("doc_id", "payload").mapInPandas(
        _decode_batches,
        schema="doc_id long, n_bytes long, width int, height int, channels int",
    )


@register(
    "multimodal_meta",
    oracle="""
        SELECT source AS origin,
               COUNT(*) AS n_assets,
               CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
               CAST(MAX(n_chars) AS BIGINT) AS max_bytes
        FROM documents
        GROUP BY source
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: metadata-only rollup — MUST prune the payload column (asserted
    in plan tests): storage stats per origin without touching a single
    blob byte."""
    dc = load(spark, sf_dir, "documents")
    media = dc.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.col("source").alias("origin"),
        F.col("n_chars").cast("bigint").alias("content_length"),
    )
    return media.groupBy("origin").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("content_length").alias("total_bytes"),
        F.max("content_length").alias("max_bytes"),
    )


_FRAME, _STRIDE = 48, 128  # chars per frame, chars between sampled frames


def _framesample_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One asset row in → one row PER SAMPLED FRAME out (mapInPandas is the
    fan-out shape; a real video pipeline emits decoded frame tensors here).
    Frame bytes are REAL slices of the payload; only pixel decode is a
    stub elsewhere."""
    for pdf in it:
        ids, idxs, hashes, lens = [], [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            n_frames = -(-len(text) // _STRIDE)  # ceil
            for i in range(n_frames):
                frame = text[i * _STRIDE : i * _STRIDE + _FRAME]
                ids.append(doc_id)
                idxs.append(i)
                hashes.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
                lens.append(len(frame))
        yield pd.DataFrame(
            {"doc_id": ids, "frame_idx": idxs, "frame_md5": hashes, "frame_len": lens}
        )


@register(
    "multimodal_framesample",
    oracle=f"""
        SELECT doc_id, i AS frame_idx,
               MD5(SUBSTRING(text, CAST(i * {_STRIDE} + 1 AS INT), {_FRAME}))
                 AS frame_md5,
               LEN(SUBSTRING(text, CAST(i * {_STRIDE} + 1 AS INT), {_FRAME}))
                 AS frame_len
        FROM documents,
             UNNEST(RANGE(0, CAST(CEIL(LEN(text) / {_STRIDE}.0) AS BIGINT))) AS t(i)
    """,
)
def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: deterministic frame sampling — every ``_STRIDE``-th offset of
    each asset yields a ``_FRAME``-char frame, one output row per frame
    (the video keyframe-extraction batch shape: mapInPandas fans a row out
    to N frames without any shuffle; frames carry content hash + length as
    the typed feature columns).  The frame slicing and hashing are real on
    both engines, so unlike the decode stub this key has a full value-hash
    oracle.  Repartitioned before the fan-out so single-file inputs don't
    serialize the stage (CLAUDE.md rule)."""
    dc = load(spark, sf_dir, "documents")
    return (
        dc.select("doc_id", "text")
        .repartition(8, "doc_id")
        .mapInPandas(
            _framesample_batches,
            schema="doc_id long, frame_idx long, frame_md5 string, frame_len long",
        )
    )
