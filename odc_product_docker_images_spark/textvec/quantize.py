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


from pyspark.sql import Window

from ..functions.det import dround, sql_dround

_BQ_QUERIES = 10  # query vectors: vec_id < 10
_BQ_K = 5  # neighbors kept per query
_PI = 3.141592653589793


@register(
    "sim_binary_quantize",
    oracle=f"""
        WITH v AS (
            SELECT vec_id,
                   LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ), packed AS (
            SELECT vec_id, e,
                   CAST(LIST_SUM(LIST_TRANSFORM(e[1:32],
                        (x, i) -> CASE WHEN x > CAST(0.0 AS DOUBLE)
                                  THEN POWER(2, i - 1)
                                  ELSE CAST(0.0 AS DOUBLE) END)) AS BIGINT)
                       AS w0,
                   CAST(LIST_SUM(LIST_TRANSFORM(e[33:64],
                        (x, i) -> CASE WHEN x > CAST(0.0 AS DOUBLE)
                                  THEN POWER(2, i - 1)
                                  ELSE CAST(0.0 AS DOUBLE) END)) AS BIGINT)
                       AS w1
            FROM v
        ), pairs AS (
            SELECT q.vec_id AS vec_id, c.vec_id AS nbr_id,
                   CAST(bit_count(xor(q.w0, c.w0))
                        + bit_count(xor(q.w1, c.w1)) AS BIGINT) AS hamming
            FROM packed q JOIN packed c ON c.vec_id != q.vec_id
            WHERE q.vec_id < {_BQ_QUERIES}
        ), topk AS (
            SELECT vec_id, nbr_id, hamming,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY hamming, nbr_id) AS rn
            FROM pairs
        )
        SELECT t.vec_id, t.nbr_id, t.hamming,
               {sql_dround(
                   f"COS(CAST({_PI!r} AS DOUBLE) * t.hamming / 64)"
               )} AS est_cos,
               {sql_dround(
                   "LIST_SUM(LIST_TRANSFORM(RANGE(1, 65),"
                   " i -> a.e[i] * b.e[i]))"
                   " / (SQRT(LIST_SUM(LIST_TRANSFORM(a.e, x -> x * x)))"
                   " * SQRT(LIST_SUM(LIST_TRANSFORM(b.e, x -> x * x))))"
               )} AS true_cos
        FROM topk t
        JOIN v a ON a.vec_id = t.vec_id
        JOIN v b ON b.vec_id = t.nbr_id
        WHERE t.rn <= {_BQ_K}
    """,
)
def sim_binary_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 storage path, 1-bit tier: sign binarization + Hamming search +
    exact rerank — the 256× compression rung below `sim_quantize_int8`
    (64 float dims → two 32-bit words = 8 B/vector) that modern vector
    stores run as the FIRST funnel stage.  Codes pack per-dimension sign
    bits into int64 words with exact powers of two (every value ≤ 2³²−1
    is an exact double, so LIST_SUM/fold packing is bit-identical in
    both engines); Hamming = popcount(xor) per word pair — pure integer
    codegen.  The angular estimate cos(π·h/64) is the sign-random-
    projection identity (Charikar ⟨pub⟩ SimHash/SRP: P[sign match] =
    1 − θ/π, here with the identity projection since the fixture's
    coordinates are i.i.d.); the exact cosine of each surviving pair is
    recomputed for the rerank column, restricted to Q·K rows.

    Scale shape (100 TB of vectors): the query side (vec_id < 10, _BQ_QUERIES)
    broadcasts — 8 B codes mean even a million-query batch is ~8 MB; the
    corpus side streams through the xor/popcount in whole-stage codegen
    with NO shuffle until the per-query top-5 (_BQ_K) window on Q·K-bounded
    candidates; the float embeddings are only touched again by the final
    rerank join (Q·K rows), never by the scan."""
    em = load(spark, sf_dir, "embeddings")
    e = F.transform("embedding", lambda x: x.cast("double"))
    base = em.select("vec_id", e.alias("e"))

    def word(lo: int) -> Column:
        return (
            _fsum(
                F.transform(
                    F.slice(F.col("e"), lo, 32),
                    lambda x, i: F.when(
                        x > F.lit(0.0),
                        F.pow(F.lit(2.0), i.cast("double")),
                    ).otherwise(F.lit(0.0)),
                )
            )
            .cast("long")
        )

    packed = base.select("vec_id", word(1).alias("w0"), word(33).alias("w1"))
    q = packed.filter(F.col("vec_id") < _BQ_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("w0").alias("qw0"),
        F.col("w1").alias("qw1"),
    )
    pairs = packed.join(
        F.broadcast(q), F.col("vec_id") != F.col("qid")
    ).select(
        F.col("qid").alias("q_id"),
        F.col("vec_id").alias("nbr_id"),
        (
            F.bit_count(F.col("qw0").bitwiseXOR(F.col("w0")))
            + F.bit_count(F.col("qw1").bitwiseXOR(F.col("w1")))
        )
        .cast("long")
        .alias("hamming"),
    )
    w = Window.partitionBy("q_id").orderBy("hamming", "nbr_id")
    sel = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _BQ_K)
        .select("q_id", "nbr_id", "hamming")
    )
    qa = base.select(F.col("vec_id").alias("q_id"), F.col("e").alias("ea"))
    qb = base.select(F.col("vec_id").alias("nbr_id"), F.col("e").alias("eb"))
    joined = sel.join(F.broadcast(qa), "q_id").join(F.broadcast(qb), "nbr_id")
    ea, eb = F.col("ea"), F.col("eb")
    true_cos = dot(ea, eb) / (F.sqrt(dot(ea, ea)) * F.sqrt(dot(eb, eb)))
    return joined.select(
        F.col("q_id").alias("vec_id"),
        "nbr_id",
        "hamming",
        dround(F.cos(F.lit(_PI) * F.col("hamming") / F.lit(64))).alias(
            "est_cos"
        ),
        dround(true_cos).alias("true_cos"),
    )
