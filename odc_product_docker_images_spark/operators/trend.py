"""Mann-Kendall trend test + Theil-Sen slope (A9+/r5).

Reference analog: the EO statistics stack's per-pixel time-series trend
products (⟨pub⟩ datacube-stats / DEA land-cover trend: Mann-Kendall
significance + Theil-Sen slope over a pixel's observation series) —
`agg_linear_trend` covers the least-squares fit; this adds the RANK-based
robust pair: S = Σ_{i<j} sign(x_j − x_i) over the time ordering, the
normal-approximation Z (no tie correction — documented simplification,
formula identical on both engines), and the Theil-Sen slope = median of
pairwise slopes.

Spark-first scale shape: the pairwise stage is a SELF-JOIN WITHIN the
series key, so pair count is bounded by per-series length squared while
the SERIES COUNT is what scales with data volume — the same
bounded-blow-up contract as the blocked dedup joins.  At 100 TB: one
shuffle partitions by series key, pairs never cross series, and a
too-long series is the caller's resampling problem (as in the reference,
which computes per-pixel series of bounded revisit count).

Determinism: S is an integer sum; pair signs are CASE comparisons on raw
doubles; slopes are one IEEE subtract/divide on whole-second epochs; the
median midpoint is the same (lo+hi)/2 in both engines; Z's sqrt is the
one libm op, absorbed by dround(6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import dround, sql_dround
from ..io import load
from ..registry import register

# variance of S under H0, no tie correction: n(n-1)(2n+5)/18
_Z_SQL = (
    "CASE WHEN s_stat > 0 THEN (s_stat - 1) WHEN s_stat < 0 THEN (s_stat + 1)"
    " ELSE 0 END"
    " / SQRT(n_obs * (n_obs - CAST(1.0 AS DOUBLE))"
    " * (CAST(2.0 AS DOUBLE) * n_obs + CAST(5.0 AS DOUBLE))"
    " / CAST(18.0 AS DOUBLE))"
)


@register(
    "agg_mann_kendall",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_id,
                   CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS sec,
                   value
            FROM events
        ), p AS (
            SELECT a.user_id AS user_id,
                   CASE WHEN b.value > a.value THEN 1
                        WHEN b.value < a.value THEN -1 ELSE 0 END AS sgn,
                   CASE WHEN b.sec > a.sec
                        THEN (b.value - a.value) / CAST(b.sec - a.sec AS DOUBLE)
                   END AS slope
            FROM e a JOIN e b
              ON a.user_id = b.user_id
             AND (a.sec < b.sec OR (a.sec = b.sec AND a.event_id < b.event_id))
        ), agg AS (
            SELECT p.user_id,
                   CAST(SUM(sgn) AS BIGINT) AS s_stat,
                   MEDIAN(slope) * CAST(1e6 AS DOUBLE) AS sen_slope_raw,
                   COUNT(*) AS n_pairs
            FROM p GROUP BY p.user_id
        ), c AS (
            SELECT user_id, COUNT(*) AS n_obs FROM e GROUP BY user_id
        )
        SELECT agg.user_id AS user_id,
               CAST(c.n_obs AS BIGINT) AS n_obs,
               s_stat,
               CAST(n_pairs AS BIGINT) AS n_pairs,
               {sql_dround(_Z_SQL, 6)} AS z_stat,
               {sql_dround('sen_slope_raw', 6)} AS sen_slope_ppm
        FROM agg JOIN c ON agg.user_id = c.user_id
    """,
)
def agg_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9+: robust per-series trend — Mann-Kendall S over the (ts,
    event_id) observation order, normal-approximation Z, and the
    Theil-Sen median slope (scaled to ppm/second so the rounded grid
    carries signal; slopes only over strictly-increasing timestamps)."""
    e = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.unix_timestamp("ts").alias("sec"),
            "value",
        )
        .repartition(32, "user_id")  # single-file input: parallelize the join
    )
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (
            (F.col("a.sec") < F.col("b.sec"))
            | ((F.col("a.sec") == F.col("b.sec")) & (F.col("a.event_id") < F.col("b.event_id")))
        ),
    ).select(
        F.col("a.user_id").alias("user_id"),
        F.when(F.col("b.value") > F.col("a.value"), 1)
        .when(F.col("b.value") < F.col("a.value"), -1)
        .otherwise(0)
        .alias("sgn"),
        F.when(
            F.col("b.sec") > F.col("a.sec"),
            (F.col("b.value") - F.col("a.value"))
            / (F.col("b.sec") - F.col("a.sec")).cast("double"),
        ).alias("slope"),
    )
    agg = pairs.groupBy("user_id").agg(
        F.sum("sgn").cast("bigint").alias("s_stat"),
        (F.median("slope") * F.lit(1e6)).alias("sen_slope_raw"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    counts = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_obs"))
    s = F.col("s_stat")
    z = (
        F.when(s > 0, s - 1).when(s < 0, s + 1).otherwise(0)
        / F.sqrt(
            F.col("n_obs") * (F.col("n_obs") - F.lit(1.0))
            * (F.lit(2.0) * F.col("n_obs") + F.lit(5.0))
            / F.lit(18.0)
        )
    )
    return agg.join(counts, "user_id").select(
        "user_id",
        "n_obs",
        "s_stat",
        "n_pairs",
        dround(z, 6).alias("z_stat"),
        dround("sen_slope_raw", 6).alias("sen_slope_ppm"),
    )
