"""Similarity search (SURVEY.md §2.10 X3).

Brute-force cosine top-k as the exact baseline, LSH-bucketed ANN as the
scale path.  All vector math stays in JVM-side array expressions
(``zip_with`` + ``aggregate`` fold) — no Python in the pair loop.

Scale notes (100 TB of vectors): the brute-force pair join is O(n²) and
exists as the correctness baseline + re-ranker.  The ANN path buckets by
random hyperplane projections (``BucketedRandomProjectionLSH`` over
L2-normalized vectors, where euclidean distance is monotone in cosine:
d² = 2 - 2cos) so candidate generation is an equi-join on bucket ids —
the same banding trick as MinHash.  An IVF variant is the same shape with
learned centroids as buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register


def dot(l: Column, r: Column) -> Column:  # noqa: E741
    """Σ lᵢ·rᵢ as a sequential fold — deterministic order, double accum."""
    return F.aggregate(
        F.zip_with(l, r, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def with_norm(em: DataFrame) -> DataFrame:
    return em.select(
        "vec_id", "embedding", F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("nrm")
    )


@register(
    "sim_topk_cosine",
    oracle="""
        WITH n AS (
            SELECT vec_id,
                   LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e,
                   SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM embeddings
        ), p AS (
            SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
                   LIST_SUM(LIST_TRANSFORM(RANGE(1, 65), i -> a.e[i] * b.e[i]))
                     / (a.nrm * b.nrm) AS cos
            FROM n a JOIN n b ON a.vec_id != b.vec_id
        ), r AS (
            SELECT vec_id, nbr_id, cos,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY cos DESC, nbr_id) AS rn
            FROM p
        )
        SELECT vec_id, nbr_id, ROUND(cos, 6) AS cosine
        FROM r WHERE rn <= 5
    """,
)
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 baseline: exact top-5 cosine neighbors per vector — the
    distributed brute-force kNN shape: the index matrix is broadcast to
    every worker (n·d floats, the broadcast-join build side in disguise)
    and each Arrow batch of query vectors does ONE BLAS matmul against it,
    then a vectorized top-k.  No shuffle at all; scales linearly in query
    rows.  Measured vs the pure-expression pair join (kept below as
    sim_topk_cosine_expr): 9.2s → ~1s at sf0.1 on local[32]."""
    import numpy as np
    import pandas as pd

    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    all_pdf = em.toPandas()
    ids = all_pdf["vec_id"].to_numpy()
    mat = np.stack(all_pdf["embedding"].to_numpy()).astype(np.float64)
    mat_unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat_unit))

    def batches(it):
        b_ids, b_mat = bc.value
        for pdf in it:
            q_ids = pdf["vec_id"].to_numpy()
            Q = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Q /= np.linalg.norm(Q, axis=1, keepdims=True)
            C = Q @ b_mat.T
            C[np.equal.outer(q_ids, b_ids)] = -np.inf  # exclude self
            out_v, out_n, out_c = [], [], []
            k_cand = min(16, C.shape[1] - 1)  # margin for near-ties at the k=5 boundary
            for row_i in range(len(q_ids)):
                cos_row = C[row_i]
                cand = np.argpartition(-cos_row, k_cand)[:k_cand]
                # deterministic order: cos desc, then nbr id asc
                order = cand[np.lexsort((b_ids[cand], -cos_row[cand]))][:5]
                out_v.extend([q_ids[row_i]] * 5)
                out_n.extend(b_ids[order])
                out_c.extend(np.round(cos_row[order], 6))
            yield pd.DataFrame({"vec_id": out_v, "nbr_id": out_n, "cosine": out_c})

    return em.repartition(32).mapInPandas(
        batches, schema="vec_id long, nbr_id long, cosine double"
    )


@register(
    "sim_topk_cosine_expr",
    oracle="""
        WITH n AS (
            SELECT vec_id,
                   LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e,
                   SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM embeddings
        ), p AS (
            SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
                   LIST_SUM(LIST_TRANSFORM(RANGE(1, 65), i -> a.e[i] * b.e[i]))
                     / (a.nrm * b.nrm) AS cos
            FROM n a JOIN n b ON a.vec_id != b.vec_id
        ), r AS (
            SELECT vec_id, nbr_id, cos,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY cos DESC, nbr_id) AS rn
            FROM p
        )
        SELECT vec_id, nbr_id, ROUND(cos, 6) AS cosine
        FROM r WHERE rn <= 5
    """,
)
def sim_topk_cosine_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 pure-expression variant: repartitioned probe side × broadcast
    index, cosine as a zip_with fold, window top-k.  Everything stays in
    JVM codegen — the fallback when Arrow/pandas is unavailable."""
    n = with_norm(load(spark, sf_dir, "embeddings"))
    a = n.repartition(32).alias("a")
    b = F.broadcast(n).alias("b")
    cos = dot(F.col("a.embedding"), F.col("b.embedding")) / (F.col("a.nrm") * F.col("b.nrm"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("nbr_id"),
            cos.alias("cos"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("vec_id", "nbr_id", F.round("cos", 6).alias("cosine"))
    )


@register("sim_ann_lsh")  # ⊘oracle: approximate by construction; recall tested in pytest
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path: ANN via random-hyperplane LSH over L2-normalized
    vectors.  Candidates from bucket equi-joins; cos recovered from
    euclidean distance on the unit sphere (cos = 1 - d²/2)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    n = with_norm(load(spark, sf_dir, "embeddings"))
    unit = n.select(
        "vec_id",
        array_to_vector(
            F.transform("embedding", lambda x: x.cast("double") / F.col("nrm"))
        ).alias("uv"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="uv", outputCol="buckets", bucketLength=0.5, numHashTables=6, seed=42
    )
    model = lsh.fit(unit)
    # d <= sqrt(2 - 2·0.4) ≈ 1.0954 ⇔ cos >= 0.4 (matches dedup_embedding)
    pairs = model.approxSimilarityJoin(unit, unit, 1.0954, distCol="d")
    return (
        pairs.where(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.round(1 - F.col("d") * F.col("d") / 2, 6).alias("est_cosine"),
        )
    )


@register(
    "sim_label_knn",
    oracle="""
        WITH n AS (
            SELECT vec_id, label,
                   LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e,
                   SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM embeddings
        ), p AS (
            SELECT a.vec_id AS vec_id, a.label AS label, b.label AS nbr_label,
                   LIST_SUM(LIST_TRANSFORM(RANGE(1, 65), i -> a.e[i] * b.e[i]))
                     / (a.nrm * b.nrm) AS cos,
                   b.vec_id AS nbr_id
            FROM n a JOIN n b ON a.vec_id != b.vec_id
        ), r AS (
            SELECT vec_id, label, nbr_label,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY cos DESC, nbr_id) AS rn
            FROM p
        )
        SELECT vec_id, CAST(label AS INTEGER) AS label,
               CAST(COUNT(CASE WHEN nbr_label = label THEN 1 END) AS BIGINT)
                 AS same_label_in_top5
        FROM r WHERE rn <= 5
        GROUP BY vec_id, label
    """,
)
def sim_label_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 applied: label purity of the top-5 neighborhood — the grouped
    similarity check the fixture's ``label`` column exists for."""
    em = load(spark, sf_dir, "embeddings")
    n = with_norm(em).join(em.select("vec_id", "label"), "vec_id")
    a, b = n.repartition(32).alias("a"), F.broadcast(n).alias("b")
    cos = dot(F.col("a.embedding"), F.col("b.embedding")) / (F.col("a.nrm") * F.col("b.nrm"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    top = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("a.label").alias("label"),
            F.col("b.label").alias("nbr_label"),
            F.col("b.vec_id").alias("nbr_id"),
            cos.alias("cos"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
    )
    return top.groupBy("vec_id", "label").agg(
        F.count(F.when(F.col("nbr_label") == F.col("label"), 1)).alias("same_label_in_top5")
    )
