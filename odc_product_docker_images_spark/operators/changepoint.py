"""CUSUM change-point detection per series (W12/r5c).

Reference analog: the EO time-series change products layered on the
datacube (⟨pub⟩ DEA land-cover change / disturbance mapping: per-pixel
break detection over the observation series; the classic online form is
Page's CUSUM).  `agg_mann_kendall` answers "is there a monotonic trend?";
this answers "WHERE does the level shift?" — the cumulative sum of
deviations from the series mean peaks (in absolute value) at the most
likely change point, and its range is the standard shift statistic
(Pettitt/CUSUM family, mean-anchored batch form).

Spark-first: ONE scan, ONE Exchange.  The per-series mean is a
full-frame window aggregate (not a groupBy + join-back, which planned as
4 scans / 7 Exchanges in the first cut — the PLANS.md audit caught the
branch duplication); the running sum, the per-series min/max, and the
arg-max row pick are all windows over the SAME partition key, so
everything downstream of the scan shares a single hash partitioning.
Pair-free — unlike the Mann-Kendall pair join this is O(n log n) per
series, the shape you run over EVERY pixel before spending pairs on the
flagged ones.  At 100 TB: one shuffle by series key; no stage holds more
than a series run per task.

Determinism: the mean is the davg formula (exact decimal sum / count)
expressed as a window; the running sum is a DECIMAL window sum
(associative — safe under DuckDB's segment-tree window evaluation and
Spark's running frame alike); deviations are IEEE subtractions of the
bit-identical mean; the arg-max compares identical doubles with a
(|cusum|, sec, event_id) tie-break.  The oracle states the same math in
CTE form — plan shapes differ, values are bit-equal by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.det import (
    dec_cast,
    dround,
    exact_double,
    sql_davg,
    sql_dec_cast,
    sql_dround,
    sql_exact_double,
)
from ..io import load
from ..registry import register

_CUSUM_SQL = sql_exact_double(
    f"SUM({sql_dec_cast('value - mu')}) OVER ("
    "PARTITION BY e.user_id ORDER BY sec, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)


@register(
    "window_cusum_change",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_id,
                   CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS sec,
                   value
            FROM events
        ), m AS (
            SELECT user_id, {sql_davg("value", "mu")}, COUNT(*) AS n_obs
            FROM e GROUP BY user_id
        ), c AS (
            SELECT e.user_id, event_id, sec, n_obs, {_CUSUM_SQL} AS cusum
            FROM e JOIN m USING (user_id)
        ), r AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                      ORDER BY ABS(cusum) DESC, sec, event_id) AS rn
            FROM c
        ), s AS (
            SELECT user_id, MIN(cusum) AS cusum_min, MAX(cusum) AS cusum_max
            FROM c GROUP BY user_id
        )
        SELECT r.user_id, CAST(r.n_obs AS BIGINT) AS n_obs,
               r.event_id AS cp_event_id, r.sec AS cp_sec, r.cusum AS cp_cusum,
               s.cusum_min, s.cusum_max,
               s.cusum_max - s.cusum_min AS cusum_range
        FROM r JOIN s USING (user_id) WHERE rn = 1
    """,
)
def window_cusum_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W12: per-series CUSUM change point — running sum of deviations from
    the series mean over the (ts, event_id) order; the |CUSUM| peak is the
    estimated break, the min/max range the shift statistic."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("sec"), "value"
    )
    wp = Window.partitionBy("user_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    n_obs = F.count(F.lit(1)).over(wp)
    # divide by COUNT(value), not COUNT(*): the oracle's sql_davg twin
    # skips NULLs in the denominator — identical today (no NULLs in the
    # fixture) but a latent divergence if a scale tier introduces them
    mu = exact_double(F.sum(dec_cast("value")).over(wp)) / F.count("value").over(
        wp
    ).cast("double")
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = e.withColumn("mu", mu).withColumn("n_obs", n_obs).select(
        "user_id",
        "event_id",
        "sec",
        "n_obs",
        exact_double(
            F.sum(dec_cast(F.col("value") - F.col("mu"))).over(wsum)
        ).alias("cusum"),
    )
    warg = Window.partitionBy("user_id").orderBy(
        F.abs(F.col("cusum")).desc(), "sec", "event_id"
    )
    return (
        c.select(
            "*",
            F.min("cusum").over(wp).alias("cusum_min"),
            F.max("cusum").over(wp).alias("cusum_max"),
            F.row_number().over(warg).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("n_obs").cast("bigint").alias("n_obs"),
            F.col("event_id").alias("cp_event_id"),
            F.col("sec").alias("cp_sec"),
            F.col("cusum").alias("cp_cusum"),
            "cusum_min",
            "cusum_max",
            (F.col("cusum_max") - F.col("cusum_min")).alias("cusum_range"),
        )
    )


_ZS_N = "CAST(n_m AS DOUBLE)"
_ZS_MU = "(sx / CAST(n_m AS DOUBLE))"
_ZS_VAR = (
    f"((sxx - {_ZS_N} * {_ZS_MU} * {_ZS_MU}) / ({_ZS_N} - CAST(1.0 AS DOUBLE)))"
)


@register(
    "window_seasonal_zscore",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_id,
                   CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS sec,
                   CAST(MONTH(ts) AS INTEGER) AS month, value
            FROM events
        ), m AS (
            SELECT user_id, event_id, sec, month, value,
                   COUNT(*) OVER wm AS n_m,
                   {sql_exact_double(f"SUM({sql_dec_cast('value')}) OVER wm")} AS sx,
                   {sql_exact_double(f"SUM({sql_dec_cast('value * value')}) OVER wm")} AS sxx
            FROM e
            WINDOW wm AS (PARTITION BY user_id, month)
        ), z AS (
            SELECT user_id, event_id, sec, month,
                   {sql_dround(f"(value - {_ZS_MU}) / SQRT({_ZS_VAR})", 6)} AS z
            FROM m WHERE n_m >= 2 AND {_ZS_VAR} > CAST(0.0 AS DOUBLE)
        ), r AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                      ORDER BY ABS(z) DESC, sec, event_id) AS rn
            FROM z
        ), s AS (
            SELECT user_id, COUNT(*) AS n_scored,
                   SUM(CASE WHEN ABS(z) >= CAST(2.0 AS DOUBLE)
                        THEN 1 ELSE 0 END) AS n_anomalies
            FROM z GROUP BY user_id
        )
        SELECT r.user_id, CAST(s.n_scored AS BIGINT) AS n_scored,
               CAST(s.n_anomalies AS BIGINT) AS n_anomalies,
               r.event_id AS peak_event_id,
               CAST(r.month AS INTEGER) AS peak_month, r.z AS peak_z
        FROM r JOIN s USING (user_id) WHERE rn = 1
    """,
)
def window_seasonal_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W13: seasonal-climatology anomaly screen — each observation scored
    against ITS OWN series-month climatology (mean/sd from exact decimal
    window sums over the (series, month) partition), the phenology-aware
    anomaly standard in EO time-series work (plain anomalies flag every
    winter as a drought).  Per series: scored count, |z| >= 2 anomaly
    count, and the peak-|z| observation.  Same single-scan window
    discipline as `window_cusum_change`; the month partition and the
    series rollup are the only two shuffles.  Determinism: mean and
    variance derive from exact decimal sums with one shared formula
    text; the z divide's SQRT is the one libm op, absorbed by dround(6);
    zero-variance and singleton months are excluded by exact-arithmetic
    guards on BOTH sides."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
        F.month("ts").cast("int").alias("month"),
        "value",
    )
    wm = Window.partitionBy("user_id", "month").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    m = e.select(
        "user_id", "event_id", "sec", "month", "value",
        F.count(F.lit(1)).over(wm).alias("n_m"),
        exact_double(F.sum(dec_cast("value")).over(wm)).alias("sx"),
        exact_double(
            F.sum(dec_cast(F.col("value") * F.col("value"))).over(wm)
        ).alias("sxx"),
    )
    n_d = F.col("n_m").cast("double")
    mu = F.col("sx") / n_d
    var = (F.col("sxx") - n_d * mu * mu) / (n_d - F.lit(1.0))
    z = m.where((F.col("n_m") >= 2) & (var > F.lit(0.0))).select(
        "user_id", "event_id", "sec", "month",
        dround((F.col("value") - mu) / F.sqrt(var), 6).alias("z"),
    )
    # per-series rollup as windows over the SAME partition key (a
    # groupBy + join-back duplicated the whole z subtree: 2 scans /
    # 5 Exchanges — the window_cusum_change lesson applied here too)
    wp = Window.partitionBy("user_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    warg = Window.partitionBy("user_id").orderBy(
        F.abs(F.col("z")).desc(), "sec", "event_id"
    )
    return (
        z.select(
            "user_id",
            "event_id",
            "month",
            "z",
            F.count(F.lit(1)).over(wp).alias("n_scored"),
            F.sum((F.abs("z") >= F.lit(2.0)).cast("int")).over(wp).alias(
                "n_anomalies"
            ),
            F.row_number().over(warg).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("n_scored").cast("bigint").alias("n_scored"),
            F.col("n_anomalies").cast("bigint").alias("n_anomalies"),
            F.col("event_id").alias("peak_event_id"),
            F.col("month").cast("int").alias("peak_month"),
            F.col("z").alias("peak_z"),
        )
    )
