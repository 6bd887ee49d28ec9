"""One Lloyd (k-means) iteration as a relational plan (SURVEY.md §2.10 X3
— the clustering step under IVF index training, expressed verifiably).

Iterative ML training on Spark is a LOOP OF RELATIONAL STEPS — each
iteration is assign (distance argmin) + update (per-centroid mean), both
plain DataFrame ops.  ``sim_ann_ivf`` runs the whole loop (rows-only by
necessity); this key verifies ONE step end-to-end against a full DuckDB
oracle, which is exactly how you make an iterative algorithm auditable:
pin the step, induct on the loop."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.det import davg, dround, sql_davg, sql_dround
from ..io import load
from ..registry import register

_K = 8
_DIM = 64


@register(
    "sim_kmeans_step",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ), c AS (
            SELECT vec_id AS centroid_id, e AS ce FROM v WHERE vec_id < {_K}
        ), d AS (
            SELECT v.vec_id, c.centroid_id,
                   {sql_dround("LIST_SUM(LIST_TRANSFORM(RANGE(1, " + str(_DIM + 1) + "), i -> (e[i] - ce[i]) * (e[i] - ce[i])))")} AS dist
            FROM v CROSS JOIN c
        ), a AS (
            SELECT vec_id, centroid_id FROM (
                SELECT vec_id, centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY dist, centroid_id) AS rn
                FROM d
            ) WHERE rn = 1
        ), sizes AS (
            SELECT centroid_id, COUNT(*) AS n_members FROM a GROUP BY centroid_id
        )
        SELECT a.centroid_id,
               CAST(dims.i AS INTEGER) AS dim,
               {sql_davg("e[dims.i]", "new_val")},
               MAX(n_members) AS n_members
        FROM a
        JOIN v USING (vec_id)
        JOIN sizes USING (centroid_id)
        CROSS JOIN RANGE(1, {_DIM + 1}) dims(i)
        GROUP BY a.centroid_id, dims.i
    """,
)
def sim_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: ONE Lloyd iteration — assign every vector to its nearest of the
    K seed centroids (squared-L2 argmin) and emit the updated per-centroid
    per-dimension means.  Spark-first: seeds (the first K vectors — a
    deterministic seeding) ride a broadcast onto the vector scan; the
    distance is a pure JVM fold (``zip_with`` squared diffs + ``aggregate``
    sum — no UDF), the argmin is a K-row window per vector, and the update
    is ``posexplode`` + one hash-agg keyed (centroid, dim).  At 100 TB:
    assignment is map-side only (K centroids always broadcast), the update
    shuffles (centroid, dim) partial means — K·D rows, independent of
    corpus size; the full training loop is this plan iterated with the
    update fed back as the next broadcast (sim_ann_ivf runs that loop;
    this key is its auditable induction step).

    Determinism: distances fold left-to-right over the same element order
    in both engines and are rounded 6 dp (dround) BEFORE the argmin, whose
    tie-break is (dist, centroid_id); the mean takes the exact decimal
    path.  Every float starts life as a float32 cast — exact in double."""
    v = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    seeds = v.where(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("centroid_id"), F.col("e").alias("ce")
    )
    sq = F.zip_with("e", "ce", lambda x, y: (x - y) * (x - y))
    dist = dround(
        F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)
    ).alias("dist")
    d = v.crossJoin(F.broadcast(seeds)).select("vec_id", "centroid_id", "e", dist)
    w = Window.partitionBy("vec_id").orderBy("dist", "centroid_id")
    a = (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "centroid_id", "e")
    )
    sizes = a.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        a.select("centroid_id", F.posexplode("e").alias("pos", "val"))
        .groupBy("centroid_id", (F.col("pos") + 1).cast("int").alias("dim"))
        .agg(davg("val", "new_val"))
        .join(F.broadcast(sizes), "centroid_id")
        .select("centroid_id", "dim", "new_val", "n_members")
    )
