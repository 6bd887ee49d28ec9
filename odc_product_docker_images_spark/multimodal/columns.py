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

COMPRESSED_DECODERS_AVAILABLE = False  # flip when PIL/turbojpeg exist in the image

_PGM_W = 32  # synthesized raster width (bytes per row)


def _decode_pgm(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL pure-python decode of the binary PGM (P5) container: parse the
    netpbm header (magic, width, height, maxval, single whitespace byte)
    with an index scanner — the raster may legally contain whitespace
    bytes, so token-splitting the whole payload would corrupt it — and
    slice the raster.  Returns (width, height, channels, raster).

    Compressed formats (JPEG/PNG/audio) still raise: their codecs are not
    in this container (``COMPRESSED_DECODERS_AVAILABLE``); the uncompressed
    netpbm path exercises the full bytes→pixels contract for real.
    """
    if not payload.startswith(b"P5"):
        if COMPRESSED_DECODERS_AVAILABLE:  # pragma: no cover
            raise NotImplementedError("compressed codec wiring goes here")
        raise NotImplementedError(f"unsupported container: {payload[:2]!r}")
    pos, fields = 2, []
    while len(fields) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # exactly ONE whitespace byte separates maxval from the raster
    width, height, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only 8-bit rasters supported")
    raster = payload[pos : pos + width * height]
    return width, height, 1, raster


def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = [_decode_pgm(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "width": [r[0] for r in rows],
                "height": [r[1] for r in rows],
                "channels": [r[2] for r in rows],
                "n_pixel_bytes": [len(r[3]) for r in rows],
                "pixel_md5": [hashlib.md5(r[3]).hexdigest() for r in rows],
                "row0_md5": [hashlib.md5(r[3][: r[0]]).hexdigest() for r in rows],
            }
        )


@register(
    "multimodal_decode",
    oracle=f"""
        SELECT doc_id,
               CAST({_PGM_W} AS INTEGER) AS width,
               CAST(CEIL(LEN(text) / {_PGM_W}.0) AS INTEGER) AS height,
               CAST(1 AS INTEGER) AS channels,
               CAST({_PGM_W} * CEIL(LEN(text) / {_PGM_W}.0) AS BIGINT) AS n_pixel_bytes,
               MD5(RPAD(text, CAST({_PGM_W} * CEIL(LEN(text) / {_PGM_W}.0) AS INT), '.'))
                 AS pixel_md5,
               MD5(SUBSTR(RPAD(text, CAST({_PGM_W} * CEIL(LEN(text) / {_PGM_W}.0) AS INT),
                          '.'), 1, {_PGM_W})) AS row0_md5
        FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: binary media decode with a FULL value oracle.  Each document is
    packed Spark-side into a REAL netpbm PGM (P5) container — header +
    8-bit raster, text bytes padded to a {_PGM_W}-wide raster — and the
    mapInPandas decoder parses the header and slices the raster like any
    codec would.  The oracle recomputes the raster stats (dims, pixel md5,
    first-row md5) straight from the text, so a mis-parsed header offset
    or a wrong slice breaks the value hash.  Compressed codecs stay
    honestly stubbed (``_decode_pgm``); the Arrow plumbing, batch shape
    and bytes→pixels contract are exercised for real."""
    dc = load(spark, sf_dir, "documents")
    padded = F.expr(
        f"rpad(text, CAST({_PGM_W} * ceil(length(text) / {_PGM_W}.0) AS INT), '.')"
    )
    header = F.concat_ws(
        "",
        F.lit(f"P5\n{_PGM_W} "),
        F.expr(f"CAST(ceil(length(text) / {_PGM_W}.0) AS INT)").cast("string"),
        F.lit("\n255\n"),
    )
    media = dc.select(
        "doc_id",
        F.concat(F.encode(header, "utf-8"), F.encode(padded, "utf-8")).alias("payload"),
        F.struct(
            F.lit("image/x-portable-graymap").alias("mime"),
            F.col("n_chars").cast("bigint").alias("content_length"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )
    return media.select("doc_id", "payload").mapInPandas(
        _decode_batches,
        schema=(
            "doc_id long, width int, height int, channels int,"
            " n_pixel_bytes long, pixel_md5 string, row0_md5 string"
        ),
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


_PCM_N, _PCM_WIN = 2048, 256  # samples per asset, samples per analysis window
_PCM_A, _PCM_B = 7919, 2654435761  # deterministic sample-synth multipliers


def _audio_synth_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Pack each asset a deterministic int16 little-endian PCM payload —
    the stand-in for a WAV data chunk (the container-header parse is the
    same scanner discipline as ``_decode_pgm``)."""
    import numpy as np

    for pdf in it:
        payloads = []
        for d in pdf["doc_id"]:
            i = np.arange(_PCM_N, dtype=np.int64)
            v = ((int(d) * _PCM_A + i * _PCM_B) % 65536) - 32768
            payloads.append(v.astype("<i2").tobytes())
        yield pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy(), "payload": payloads})


def _audio_feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """bytes → int16 samples → per-window features.  One asset row in,
    one row per analysis window out (the audio-featurization fan-out)."""
    import numpy as np

    for pdf in it:
        ids, wins, peaks, rmss, zcs = [], [], [], [], []
        for d, p in zip(pdf["doc_id"], pdf["payload"]):
            v = np.frombuffer(p, dtype="<i2").astype(np.int64)
            for w in range(len(v) // _PCM_WIN):
                seg = v[w * _PCM_WIN : (w + 1) * _PCM_WIN]
                ids.append(d)
                wins.append(w)
                peaks.append(int(np.abs(seg).max()))
                # Σs² exact in int64; /256 is a power-of-two (exact);
                # sqrt is IEEE-correctly-rounded in numpy AND both SQL
                # engines — bit-identical with NO rounding step
                rmss.append(float(np.sqrt(float(int((seg * seg).sum())) / _PCM_WIN)))
                zcs.append(int(((seg[1:] * seg[:-1]) < 0).sum()))
        yield pd.DataFrame(
            {"doc_id": ids, "win": wins, "peak": peaks, "rms": rmss,
             "zero_crossings": zcs}
        )


@register(
    "multimodal_audio_features",
    oracle=f"""
        WITH s AS (
            SELECT doc_id, t.i,
                   ((doc_id * {_PCM_A} + t.i * {_PCM_B}) % 65536) - 32768 AS v
            FROM (SELECT doc_id FROM documents) d,
                 UNNEST(RANGE(0, {_PCM_N})) AS t(i)
        ), w AS (
            SELECT doc_id, CAST(FLOOR(i / {_PCM_WIN}) AS BIGINT) AS win, i, v,
                   LAG(v) OVER (PARTITION BY doc_id,
                                CAST(FLOOR(i / {_PCM_WIN}) AS BIGINT)
                                ORDER BY i) AS prev
            FROM s
        )
        SELECT doc_id, win,
               MAX(ABS(v)) AS peak,
               SQRT(CAST(SUM(v * v) AS BIGINT) / {_PCM_WIN}.0) AS rms,
               CAST(SUM(CASE WHEN prev IS NOT NULL AND v * prev < 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        FROM w GROUP BY 1, 2
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 audio: windowed feature extraction over int16 PCM payloads —
    the audio twin of frame sampling: synthesize a deterministic PCM
    payload per asset (arithmetic stand-in for the WAV data chunk), then
    decode bytes → samples → per-window peak / RMS / zero-crossing counts
    in a second Arrow pass.  Real plumbing throughout: little-endian int16
    byte decode, window slicing, integer feature math.  FULL oracle —
    DuckDB regenerates the samples from RANGE and computes identical
    features (peak and zero-crossings are pure integers; RMS is an exact
    int sum, a power-of-two divide and an IEEE-correctly-rounded sqrt, so
    even the float column needs no rounding).  Scale: two zero-shuffle
    Arrow map passes; window fan-out is 8 rows per asset, bounded by the
    payload length, never the corpus."""
    dc = load(spark, sf_dir, "documents")
    media = (
        dc.select("doc_id")
        .repartition(8, "doc_id")
        .mapInPandas(_audio_synth_batches, schema="doc_id long, payload binary")
    )
    return media.mapInPandas(
        _audio_feature_batches,
        schema="doc_id long, win long, peak long, rms double, zero_crossings long",
    )
