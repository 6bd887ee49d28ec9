"""Percentile composites (SURVEY.md §2.4 extension — A2's general form).

Reference analog: the DEA/odc-stats PERCENTILE products — per-pixel 10th /
50th / 90th percentile composites of an index over a year (e.g. the
``ga_ls_tc_pc_cyear`` tasseled-cap percentiles): the low percentile shows
the dry/bare state, the high one the peak-green/wet state, the median the
typical state.  The median mosaic (``agg_median``) is the p50 special
case; this key computes all three in ONE grouped pass.

Spark mapping: ``percentile(col, p)`` is exact linear-interpolation
(holistic — per-group sort), and all three percentiles share the single
sorted pass inside one hash aggregate: one shuffle, three outputs.  The
100 TB tier is ``agg_approx_percentile`` (mergeable KLL-style sketch);
this exact form is the oracle-able baseline, same split as
median/approx-median.

Determinism: DuckDB ``quantile_cont`` uses the same linear interpolation;
both engines land within an ulp, rounded to the 6-dp grid per the
multi-pass-stats convention (same policy as ``agg_geomedian_1d``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register


@register(
    "agg_percentile_composite",
    oracle="""
        SELECT l_suppkey,
               ROUND(QUANTILE_CONT(l_quantity, 0.1), 6) AS p10,
               ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) AS p50,
               ROUND(QUANTILE_CONT(l_quantity, 0.9), 6) AS p90,
               COUNT(*) AS n_obs
        FROM lineitem GROUP BY l_suppkey
    """,
)
def agg_percentile_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+: per-pixel p10/p50/p90 percentile composite in one grouped
    pass — one Exchange, one per-group sort serving all three exact
    percentiles (plan-pinned single shuffle in tests/test_plans.py)."""
    lf = load(spark, sf_dir, "lineitem")
    return lf.groupBy("l_suppkey").agg(
        F.round(F.percentile("l_quantity", F.lit(0.1)), 6).alias("p10"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("p90"),
        F.count(F.lit(1)).alias("n_obs"),
    )


@register(
    "agg_winsorized_mean",
    oracle="""
        WITH ranked AS (
            SELECT event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS r,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ), bounds AS (
            SELECT event_type, value, n,
                   CAST(FLOOR(n / 20) AS BIGINT) AS k,
                   MAX(CASE WHEN r = CAST(FLOOR(n / 20) AS BIGINT) + 1
                            THEN value END)
                       OVER (PARTITION BY event_type) AS lo,
                   MAX(CASE WHEN r = n - CAST(FLOOR(n / 20) AS BIGINT)
                            THEN value END)
                       OVER (PARTITION BY event_type) AS hi
            FROM ranked
        )
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(MAX(k) AS BIGINT) AS k_clamped,
               MAX(lo) AS lo, MAX(hi) AS hi,
               CAST(CAST(CAST(ROUND((SUM(CAST(CAST(
                   GREATEST(lo, LEAST(hi, value))
               AS VARCHAR) AS DECIMAL(30,10)))), 6) AS DECIMAL(24,6))
                   * CAST(1000000 AS DECIMAL(8,0)) AS BIGINT) AS DOUBLE)
                   / 1000000.0 / MAX(n) AS wmean
        FROM bounds GROUP BY event_type
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2++: 5%-winsorized mean per event type — the robust-mean
    composite between plain mean (outlier-hostage) and median (throws
    everything away): the k = ⌊n/20⌋ smallest values are clamped up to
    the (k+1)-th order statistic and the k largest down to the (n−k)-th,
    then averaged.  EXACT order statistics (row_number ranks, no
    interpolation), so the clamp bounds are observed values and
    cross-engine identical; k uses FLOOR under the integer cast on both
    engines (the CAST-rounds trap).  Shape: ranks and both bounds are
    windows over ONE event-type partitioning (bounds via conditional
    window MAX at the two pinned ranks — no join-back branch); the
    clamped sum rides the decimal path.  One Exchange, no join."""
    from pyspark.sql import Window

    from ..functions.det import dec_cast, exact_double

    ev = load(spark, sf_dir, "events")
    w_all = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("value", "event_id"))
        .alias("r"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    k = F.floor(F.col("n") / 20).cast("long")
    bounds = ranked.select(
        "event_type",
        "value",
        "n",
        k.alias("k"),
        F.max(F.when(F.col("r") == k + 1, F.col("value"))).over(w_all).alias("lo"),
        F.max(F.when(F.col("r") == F.col("n") - k, F.col("value")))
        .over(w_all)
        .alias("hi"),
    )
    clamped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("value")))
    return bounds.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max("k").cast("long").alias("k_clamped"),
        F.max("lo").alias("lo"),
        F.max("hi").alias("hi"),
        (
            exact_double(F.sum(dec_cast(clamped))).cast("double") / F.max("n")
        ).alias("wmean"),
    )
