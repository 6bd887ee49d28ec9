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
    """X3 baseline: exact top-5 cosine neighbors per vector as a
    block-partitioned matrix product — the fully distributed brute-force
    kNN.  The index is split into B blocks (``vec_id % B``) and replicated
    to P query partitions; queries are exploded across the B blocks; each
    (qpart, block) cell is one ``cogroup().applyInPandas`` task doing a
    single BLAS matmul + per-query top-5; a final window merges the
    per-block candidates (exact: every true global top-5 neighbor is in
    its own block's top-5).

    Nothing touches the driver: both replications ride the cogroup
    shuffle, (B+P)·n rows total instead of an n-row driver broadcast —
    at the 100 TB tier B and P scale so a cell (n/P queries × n/B index
    vectors) fits one executor; the exact all-pairs communication is
    inherent to brute force, the ANN path (sim_ann_lsh) is the sub-linear
    alternative.  Ties at the top-5 boundary are broken (cos desc,
    nbr_id asc) by a FULL lexsort per block and again by the merge
    window, so equal-cosine candidates can't be dropped arbitrarily, and
    corpora with <6 vectors emit however many neighbors exist."""
    import numpy as np
    import pandas as pd

    B, P = 4, 8
    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # separate scan for the index side — cogroup children sharing one base
    # plan can lose the right side's data columns to attribute dedup
    # (see dedup_embedding for the full mechanics)
    em_i = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = em.withColumn("qpart", F.pmod("vec_id", F.lit(P)).cast("int")).withColumn(
        "block", F.explode(F.sequence(F.lit(0), F.lit(B - 1)))
    )
    idx = em_i.withColumn("block", F.pmod("vec_id", F.lit(B)).cast("int")).withColumn(
        "qpart", F.explode(F.sequence(F.lit(0), F.lit(P - 1)))
    )

    def topk_block(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id": [], "nbr_id": [], "cos": []})
        if left.empty or right.empty:
            return empty
        q_ids = left["vec_id"].to_numpy()
        Q = np.stack(left["embedding"].to_numpy()).astype(np.float64)
        Q /= np.linalg.norm(Q, axis=1, keepdims=True)
        b_ids = right["vec_id"].to_numpy()
        M = np.stack(right["embedding"].to_numpy()).astype(np.float64)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        C = Q @ M.T
        C[np.equal.outer(q_ids, b_ids)] = -np.inf  # exclude self
        out_v, out_n, out_c = [], [], []
        for i in range(len(q_ids)):
            order = np.lexsort((b_ids, -C[i]))[:5]
            order = order[C[i][order] != -np.inf]
            out_v.extend([q_ids[i]] * len(order))
            out_n.extend(b_ids[order])
            out_c.extend(C[i][order])
        return pd.DataFrame({"vec_id": out_v, "nbr_id": out_n, "cos": out_c})

    cand = (
        q.groupBy("qpart", "block")
        .cogroup(idx.groupBy("qpart", "block"))
        .applyInPandas(topk_block, schema="vec_id long, nbr_id long, cos double")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("vec_id", "nbr_id", F.round("cos", 6).alias("cosine"))
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
