"""Semantic deduplication — SemDeDup-style cluster-then-prune (X2/X3, r5).

The published recipe for embedding-level dedup at corpus scale (Abbas et
al. 2023, "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication"): k-means the embedding space, then look for near-duplicate
pairs ONLY within each cluster and keep one representative per duplicate
group.  The quadratic pair stage is confined to cluster-sized blocks —
clusters are the candidate buckets, exactly the
bucketed-candidates-then-exact-verify discipline every other dedup path in
this repo follows (LSH bands, IVF lists, shingle blocks).

Spark-first shape:
- assignment is the `sim_kmeans_step` plan prefix: K seed centroids ride a
  broadcast onto the vector scan, squared-L2 via ``zip_with`` fold (pure
  JVM), argmin as a K-row window per vector;
- the pair stage is ``applyInPandas`` per cluster — one BLAS gram matrix
  per cluster, nothing driver-side;
- the keep/drop rule is deterministic greedy-by-id: a vector is dropped
  iff some LOWER-id member of its cluster sits above the cosine
  threshold; ``dup_of`` records the smallest such witness.

At 100 TB: K grows with the corpus so cluster sizes stay bounded (the
paper's setting) — assignment stays map-side (centroids always broadcast),
the only corpus-sized shuffle is the cluster repartition, and each cluster
gram matrix is an executor-local BLAS call.  The prune kernel additionally
bounds its own allocation (~64 MB witness-row blocks, r9), so an
under-provisioned K degrades to slower tasks, never to a worker OOM.  The output carries no float
columns: all parity-sensitive arithmetic is either the dround'd exact
decimal path (assignment) or an ulp-improbable threshold compare (the
``dedup_embedding`` precedent).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.det import dround, sql_dround
from ..io import load
from ..registry import register

_K = 8
_DIM = 64
_TAU = 0.4  # ~3.8% drop rate on the fixture — a realistic near-dup density


def _assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-seed-centroid assignment — the `sim_kmeans_step` prefix.

    Distances take the dround exact-decimal path BEFORE the argmin and the
    tie-break is (dist, centroid_id), so the assignment is bit-identical
    across engines (same convention, same proof, as kmeans.py)."""
    v = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    seeds = v.where(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("centroid_id"), F.col("e").alias("ce")
    )
    sq = F.zip_with("e", "ce", lambda x, y: (x - y) * (x - y))
    dist = dround(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)).alias("dist")
    d = v.crossJoin(F.broadcast(seeds)).select("vec_id", "e", "centroid_id", dist)
    w = Window.partitionBy("vec_id").orderBy("dist", "centroid_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "centroid_id", "e")
    )


def _prune(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-cluster SemDeDup prune: gram matrix over the normalized members,
    drop j iff max_{i<j} cos(i, j) > τ; dup_of = min witnessing i.

    CHUNKED gram (r9, the kernel-memory discipline): witness rows stream
    through in ~64 MB blocks so a corpus-sized cluster can't materialize
    an n×n product in one task — at a 200k-vector corpus a full gram was
    ~5 GB/cluster.  Chunks scan witness index i ASCENDING, so the first
    chunk that hits column j holds j's minimal witness — identical output
    to the full-matrix argmax; chunked rows are independent dot products,
    so the thresholded compares are bit-identical."""
    import numpy as np

    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    ids = pdf["vec_id"].to_numpy(np.int64)
    M = np.stack(pdf["e"].to_numpy()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    n = len(ids)
    dropped = np.zeros(n, dtype=bool)
    first = np.zeros(n, dtype=np.int64)
    step = max(1, (8 << 20) // max(1, n))
    cols = np.arange(n)
    for s in range(0, n, step):
        e = min(s + step, n)
        C = M[s:e] @ M.T  # (e-s, n) block of the gram matrix
        hit = (C > _TAU) & (np.arange(s, e)[:, None] < cols[None, :])
        any_hit = hit.any(axis=0)
        new = any_hit & ~dropped
        if new.any():
            first[new] = s + hit[:, new].argmax(axis=0)
        dropped |= any_hit
    return pd.DataFrame(
        {
            "vec_id": ids,
            "centroid_id": pdf["centroid_id"].to_numpy(np.int64),
            "is_dropped": dropped.astype(np.int32),
            "dup_of": pd.array(
                [int(ids[first[j]]) if dropped[j] else None for j in range(n)],
                dtype="Int64",
            ),
        }
    )


@register(
    "dedup_semantic",
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
        ), n AS (
            SELECT a.vec_id, a.centroid_id, v.e,
                   SQRT(LIST_SUM(LIST_TRANSFORM(v.e, x -> x * x))) AS nrm
            FROM a JOIN v USING (vec_id)
        ), p AS (
            SELECT b.vec_id, MIN(i.vec_id) AS dup_of
            FROM n b JOIN n i
              ON b.centroid_id = i.centroid_id AND i.vec_id < b.vec_id
            WHERE LIST_SUM(LIST_TRANSFORM(RANGE(1, {_DIM + 1}),
                  k -> b.e[k] * i.e[k])) / (b.nrm * i.nrm)
                  > CAST({_TAU} AS DOUBLE)
            GROUP BY b.vec_id
        )
        SELECT a.vec_id, a.centroid_id,
               CAST(p.vec_id IS NOT NULL AS INTEGER) AS is_dropped,
               p.dup_of
        FROM a LEFT JOIN p USING (vec_id)
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X3: SemDeDup — cluster-restricted semantic near-dup pruning.
    One row per vector: its cluster, whether the greedy-by-id rule drops
    it (a lower-id cluster member exceeds cos τ), and the smallest
    witnessing duplicate.  Reference analog: the curation step between
    embedding generation and training-set assembly in published web-scale
    pipelines; the engine analog of `dedup_embedding` with the all-pairs
    stage replaced by the cluster buckets that make it tractable."""
    a = _assign(spark, sf_dir)
    return a.groupBy("centroid_id").applyInPandas(
        _prune,
        "vec_id long, centroid_id long, is_dropped int, dup_of long",
    )
