"""Embedding quantization (SURVEY.md §2.10 X3 scale support).

Vector memory is the binding constraint for 100 TB-tier similarity search:
float32×64 dims = 256 B/vector; int8 symmetric quantization cuts that 4×
(and SIMD int8 dot products are ~2-4× faster than fp32 in modern ANN
runtimes).  This module implements the storage-side half — per-vector
max-abs symmetric int8 codes + dequantized reconstruction quality — as
pure array expressions, so at scale it runs inside the scan's codegen
stage with zero shuffle and the codes land in Parquet as ``array<tinyint>``.

Rounding: quantization uses ``floor(x·s + 0.5)`` (NOT ``round``) — a pure
IEEE mul/add/floor chain that is bit-identical across engines, sidestepping
the HALF_UP-vs-half-even ROUND trap (functions/det.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register
from .similarity import dot


def _fsum(arr: Column) -> Column:
    """Sequential left-fold sum of a double array (matches LIST_SUM order)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


@register(
    "sim_quantize_int8",
    oracle="""
        WITH v AS (
            SELECT vec_id,
                   LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ), scaled AS (
            SELECT vec_id, e,
                   127.0 / LIST_MAX(LIST_TRANSFORM(e, x -> ABS(x))) AS s
            FROM v
        ), q AS (
            SELECT vec_id, e, s,
                   LIST_TRANSFORM(e, x -> FLOOR(x * s + 0.5)) AS code
            FROM scaled
        )
        SELECT vec_id,
               CAST(LIST_SUM(LIST_TRANSFORM(code,
                    c -> CASE WHEN ABS(c) = 127 THEN 1 ELSE 0 END)) AS BIGINT)
                 AS n_saturated,
               ROUND(LIST_SUM(LIST_TRANSFORM(LIST_ZIP(e, code),
                    p -> POWER(p[1] - p[2] / s, 2))) / 64.0, 12) AS mse,
               ROUND(LIST_SUM(LIST_TRANSFORM(LIST_ZIP(e, code), p -> p[1] * (p[2] / s)))
                     / (SQRT(LIST_SUM(LIST_TRANSFORM(e, x -> x * x)))
                        * SQRT(LIST_SUM(LIST_TRANSFORM(code, c -> (c / s) * (c / s))))),
                     6) AS recon_cos
        FROM q
    """,
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 storage path: symmetric per-vector int8 quantization + recon
    quality.  ``s = 127/max|x|`` guarantees codes land in [-127, 127]
    (no clamp branch needed); dequantize is ``code/s``.  Emits per-vector
    saturation count, reconstruction MSE, and cos(original, recon) —
    the quality gates a pipeline would threshold before swapping the ANN
    index to int8.  All per-element ops are IEEE-exact mul/div/floor so
    Spark and DuckDB agree bit-for-bit before the final coarse rounds.

    The fixture's N(0, .15) vectors always have max|x| > 0; all-zero
    vectors would need a NULLIF guard on the scale."""
    em = load(spark, sf_dir, "embeddings")
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    df = em.select("vec_id", e.alias("e"))
    s = 127.0 / F.array_max(F.transform(F.col("e"), F.abs))
    df = df.withColumn("s", s)
    code = F.transform(F.col("e"), lambda x: F.floor(x * F.col("s") + 0.5).cast("double"))
    df = df.withColumn("code", code)
    recon = F.transform(F.col("code"), lambda c: c / F.col("s"))
    df = df.withColumn("recon", recon)
    sq_err = F.zip_with(F.col("e"), F.col("recon"), lambda a, b: F.pow(a - b, 2))
    nrm_e = F.sqrt(_fsum(F.transform(F.col("e"), lambda x: x * x)))
    nrm_r = F.sqrt(_fsum(F.transform(F.col("recon"), lambda x: x * x)))
    return df.select(
        "vec_id",
        _fsum(
            F.transform(
                F.col("code"),
                lambda c: F.when(F.abs(c) == 127, F.lit(1.0)).otherwise(F.lit(0.0)),
            )
        )
        .cast("bigint")
        .alias("n_saturated"),
        F.round(_fsum(sq_err) / 64.0, 12).alias("mse"),
        F.round(dot(F.col("e"), F.col("recon")) / (nrm_e * nrm_r), 6).alias("recon_cos"),
    )
