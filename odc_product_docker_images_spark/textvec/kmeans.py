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

from ..functions.det import (
    davg,
    dec_cast,
    dround,
    dsum,
    exact_double,
    sql_davg,
    sql_dec_cast,
    sql_dround,
    sql_dsum,
    sql_exact_double,
)
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


# power-iteration seed: exact binary fractions (k/16), no parse ambiguity
_PCA_V0 = [((j * 37) % 16 - 8) / 16.0 for j in range(64)]


@register(
    "ml_pca_power_step",
    oracle=f"""
        WITH pv AS (
            SELECT LIST_TRANSFORM({_PCA_V0!r}, x -> CAST(x AS DOUBLE)) AS v0
        ), proj AS (
            SELECT vec_id, embedding,
                   LIST_SUM(LIST_TRANSFORM(RANGE(1, 65),
                       i -> CAST(embedding[i] AS DOUBLE) * v0[i])) AS s
            FROM embeddings CROSS JOIN pv
        ), contrib AS (
            SELECT UNNEST(GENERATE_SERIES(1, 64)) AS dim_idx,
                   vec_id, embedding, s
            FROM proj
        ), w AS (
            SELECT CAST(dim_idx AS INTEGER) AS dim_idx,
                   {sql_dsum(
                       "CAST(embedding[dim_idx] AS DOUBLE) * s", "w"
                   )}
            FROM contrib GROUP BY dim_idx
        ), nrm AS (
            SELECT dim_idx, w,
                   SQRT({sql_exact_double(
                       f"SUM({sql_dec_cast('w * w')}) OVER ()"
                   )}) AS norm
            FROM w
        )
        SELECT dim_idx, w, w / norm AS v_next
        FROM nrm
    """,
)
def ml_pca_power_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML3: one verified power-iteration step toward the top principal
    component of the embedding covariance — v' = normalize(Σ x·⟨x, v⟩)
    (the Gram matrix is never materialized: C·v folds into a projection
    pass plus per-dimension sums).  The kmeans/pagerank induction
    discipline applied to PCA.

    Spark-first: ⟨x, v⟩ is a codegen'd fold against the literal seed;
    the per-dimension sums come from a posexplode → 64-key hash agg with
    map-side partials (shuffle is 64 × partitions rows, not the corpus);
    the norm rides a 64-row window.  Determinism: seed is exact binary
    fractions; fold order matches LIST_SUM; products decimal-summed;
    sqrt is IEEE-correctly-rounded (not libm-dependent) — unrounded."""
    probe = F.array(*[F.lit(v) for v in _PCA_V0])
    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    s = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            probe,
            lambda x, y: x.cast("double") * y,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    proj = em.select("vec_id", "embedding", s.alias("s"))
    contrib = proj.select(
        F.posexplode("embedding").alias("j0", "xj"), "s"
    ).select(
        (F.col("j0") + 1).cast("int").alias("dim_idx"),
        (F.col("xj").cast("double") * F.col("s")).alias("term"),
    )
    w = contrib.groupBy("dim_idx").agg(dsum("term", "w"))
    norm = F.sqrt(
        exact_double(
            F.sum(dec_cast(F.col("w") * F.col("w"))).over(Window.partitionBy()),
            6,
        )
    )
    return w.select(
        "dim_idx", "w", (F.col("w") / norm).alias("v_next")
    )


_KM_ITERS = 3  # unrolled Lloyd iterations (the graph_pagerank_loop convention)


def _kmeans_loop_oracle(iters: int) -> str:
    """Chained-CTE oracle for K unrolled Lloyd iterations: each round
    re-derives the centroid arrays from the previous update's
    (centroid, dim) means — grouped aggregation per step rules out the
    recursive-CTE form, so the fixed iteration count unrolls (the
    ``graph_pagerank_loop`` convention)."""
    dist = sql_dround(
        "LIST_SUM(LIST_TRANSFORM(RANGE(1, "
        + str(_DIM + 1)
        + "), i -> (e[i] - ce[i]) * (e[i] - ce[i])))"
    )
    parts = [
        f"""
        WITH v AS (
            SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ), c0 AS (
            SELECT vec_id AS centroid_id, e AS ce FROM v WHERE vec_id < {_K}
        )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""", d{i} AS (
            SELECT v.vec_id, c.centroid_id, {dist} AS dist
            FROM v CROSS JOIN c{i - 1} c
        ), a{i} AS (
            SELECT vec_id, centroid_id FROM (
                SELECT vec_id, centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY dist, centroid_id) AS rn
                FROM d{i}
            ) WHERE rn = 1
        ), sz{i} AS (
            SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n_members
            FROM a{i} GROUP BY centroid_id
        ), u{i} AS (
            SELECT a.centroid_id,
                   CAST(dims.i AS INTEGER) AS dim,
                   {sql_davg("e[dims.i]", "new_val")},
                   MAX(n_members) AS n_members
            FROM a{i} a
            JOIN v USING (vec_id)
            JOIN sz{i} USING (centroid_id)
            CROSS JOIN RANGE(1, {_DIM + 1}) dims(i)
            GROUP BY a.centroid_id, dims.i
        ), c{i} AS (
            SELECT centroid_id, LIST(new_val ORDER BY dim) AS ce
            FROM u{i} GROUP BY centroid_id
        )"""
        )
    parts.append(
        f"""
        SELECT centroid_id, dim, new_val, n_members FROM u{iters}"""
    )
    return "".join(parts)


@register("sim_kmeans_loop", oracle=_kmeans_loop_oracle(_KM_ITERS))
def sim_kmeans_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: the FULL Lloyd loop — {_KM_ITERS} unrolled iterations of
    ``sim_kmeans_step``'s verified assign+update, the deterministic
    auditable twin of the ``sim_ann_ivf`` trainer.  Each round broadcasts
    the previous round's centroids back onto the vector scan (rebuilt as
    arrays from the (centroid, dim) means — ``array_sort`` on (dim, val)
    structs mirrors DuckDB's ``LIST(... ORDER BY dim)`` exactly), so the
    corpus is scanned once per iteration — Lloyd's inherent cost — while
    everything between iterations is K·D-bounded and persisted (the
    ``graph_pagerank_loop`` convention).

    Determinism across the CHAIN: means take the exact decimal path
    (bit-identical), centroid arrays rebuilt from them are bit-identical,
    distances fold left-to-right over the same element order and round
    6 dp BEFORE the (dist, centroid_id) argmin — so every assignment,
    size, and mean hashes with no tolerance after three rounds.  Clusters
    that lose all members drop out on both engines identically (the
    update only emits assigned centroids)."""
    v = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    cent = v.where(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("centroid_id"), F.col("e").alias("ce")
    )
    upd = None
    for _ in range(_KM_ITERS):
        sq = F.zip_with("e", "ce", lambda x, y: (x - y) * (x - y))
        dist = dround(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)).alias(
            "dist"
        )
        d = v.crossJoin(F.broadcast(cent)).select("vec_id", "centroid_id", "e", dist)
        w = Window.partitionBy("vec_id").orderBy("dist", "centroid_id")
        a = (
            d.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "centroid_id", "e")
        )
        sizes = a.groupBy("centroid_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_members")
        )
        upd = (
            a.select("centroid_id", F.posexplode("e").alias("pos", "val"))
            .groupBy("centroid_id", (F.col("pos") + 1).cast("int").alias("dim"))
            .agg(davg("val", "new_val"))
            .join(F.broadcast(sizes), "centroid_id")
            .select("centroid_id", "dim", "new_val", "n_members")
            .persist()
        )
        cent = (
            upd.groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("dim"), F.col("new_val")))
                ).alias("pairs")
            )
            .select(
                "centroid_id",
                F.transform("pairs", lambda s: s["new_val"]).alias("ce"),
            )
        )
    return upd


_PCA_ITERS = 3  # unrolled power iterations


def _pca_loop_oracle(iters: int) -> str:
    """Chained-CTE oracle for K unrolled power iterations: each round
    rebuilds the unit vector as an ordered LIST from the previous
    round's per-dimension table (the ``sim_kmeans_loop`` move)."""
    wsum = sql_dsum("CAST(embedding[dim_idx] AS DOUBLE) * s", "w")
    norm = sql_exact_double(f"SUM({sql_dec_cast('w * w')}) OVER ()")
    parts = [
        f"""
        WITH varr0 AS (
            SELECT LIST_TRANSFORM({_PCA_V0!r}, x -> CAST(x AS DOUBLE)) AS va
        )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""", proj{i} AS (
            SELECT vec_id, embedding,
                   LIST_SUM(LIST_TRANSFORM(RANGE(1, 65),
                       j -> CAST(embedding[j] AS DOUBLE) * va[j])) AS s
            FROM embeddings CROSS JOIN varr{i - 1}
        ), contrib{i} AS (
            SELECT UNNEST(GENERATE_SERIES(1, 64)) AS dim_idx,
                   vec_id, embedding, s
            FROM proj{i}
        ), w{i} AS (
            SELECT CAST(dim_idx AS INTEGER) AS dim_idx, {wsum}
            FROM contrib{i} GROUP BY dim_idx
        ), v{i} AS (
            SELECT dim_idx, w, w / SQRT({norm}) AS v_next
            FROM w{i}
        ), varr{i} AS (
            SELECT LIST(v_next ORDER BY dim_idx) AS va FROM v{i}
        )"""
        )
    parts.append(
        f"""
        SELECT dim_idx, w, v_next FROM v{iters}"""
    )
    return "".join(parts)


@register("ml_pca_power_loop", oracle=_pca_loop_oracle(_PCA_ITERS))
def ml_pca_power_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML3: the FULL power iteration — {_PCA_ITERS} unrolled rounds of
    ``ml_pca_power_step``'s verified v' = normalize(Σ x·⟨x, v⟩), the
    top-principal-component trainer with the Gram matrix never
    materialized.  Each round rebuilds the unit vector as a one-row
    broadcast array from the previous round's 64-row (dim, v) table
    (``array_sort(collect_list(struct))`` == ``LIST(... ORDER BY)``),
    scans the corpus once for the projection+scatter (inherent — power
    iteration is corpus-bound per round), and shuffles only 64-key
    partial sums.  Per-round persist of the 64-row state; determinism:
    per-dim sums ride the decimal path (6 dp), the norm's sqrt is
    IEEE-correctly-rounded, v entries are one IEEE divide — so all
    three rounds hash bit-identically against the chained-CTE oracle."""
    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    probe = F.array(*[F.lit(x) for x in _PCA_V0])
    varr = None  # None → literal seed round
    v = None
    for _ in range(_PCA_ITERS):
        if varr is None:
            base = em.withColumn("va", probe)
        else:
            base = em.crossJoin(F.broadcast(varr))
        s = F.aggregate(
            F.zip_with(
                F.col("embedding"), F.col("va"), lambda x, y: x.cast("double") * y
            ),
            F.lit(0.0),
            lambda acc, v_: acc + v_,
        )
        contrib = base.select(
            F.posexplode("embedding").alias("j0", "xj"), s.alias("s")
        ).select(
            (F.col("j0") + 1).cast("int").alias("dim_idx"),
            (F.col("xj").cast("double") * F.col("s")).alias("term"),
        )
        w = contrib.groupBy("dim_idx").agg(dsum("term", "w"))
        norm = F.sqrt(
            exact_double(
                F.sum(dec_cast(F.col("w") * F.col("w"))).over(Window.partitionBy()),
                6,
            )
        )
        v = w.select("dim_idx", "w", (F.col("w") / norm).alias("v_next")).persist()
        varr = (
            v.groupBy()
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("dim_idx"), F.col("v_next")))
                ).alias("pairs")
            )
            .select(F.transform("pairs", lambda p: p["v_next"]).alias("va"))
        )
    return v
