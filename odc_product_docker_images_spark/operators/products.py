"""Named reference-product pipelines (SURVEY.md §0 product list).

The reference ships one Docker image per derived EO product; each is a
scan → band math → grouped time aggregation → classification chain.  The
building blocks all exist as individual keys (P3 band math, A1/A2/A6
composites, J8 change join, U1 WOfS); this module registers the three
remaining NAMED products end-to-end so a reference user can point at the
product they run today:

- ``product_ndvi_anomaly`` — ⟨pub⟩ odc-product-docker-images :
  ndvi_anomaly worker :: baseline-climatology z-score
  (`dc_ndvi_anomaly` in SatelliteApplicationsCatapult/datacube-utilities).
- ``product_water_permanency`` — ⟨pub⟩ water_permanency worker ::
  threshold classification of the WOfS wet/clear ratio.
- ``product_tsm`` — ⟨pub⟩ water_quality worker :: Lymburner total
  suspended matter power law (`tsm = 3983·g^1.6246`).

Shape notes (100 TB): every product here is ONE hash-agg shuffle
(baseline/analysis split via conditional aggregates, not a self-join —
the naive two-scan + join form doubles the read and adds a join
exchange); per-row band math rides the scan's codegen stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.det import (
    DEC,
    davg,
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

_NDVI = "(l_extendedprice - l_quantity * 1000) / (l_extendedprice + l_quantity * 1000)"
_CUT = "1998-01-01"


@register(
    "product_ndvi_anomaly",
    oracle=f"""
        SELECT l_suppkey,
               {sql_davg(f"CASE WHEN l_shipdate < TIMESTAMP '{_CUT}' THEN {_NDVI} END",
                         "base_mean")},
               ROUND(STDDEV_SAMP(CASE WHEN l_shipdate < TIMESTAMP '{_CUT}'
                                      THEN {_NDVI} END), 4) AS base_std,
               {sql_davg(f"CASE WHEN l_shipdate >= TIMESTAMP '{_CUT}' THEN {_NDVI} END",
                         "cur_mean")},
               COUNT(CASE WHEN l_shipdate < TIMESTAMP '{_CUT}' THEN 1 END) AS n_base,
               COUNT(CASE WHEN l_shipdate >= TIMESTAMP '{_CUT}' THEN 1 END) AS n_cur
        FROM lineitem
        GROUP BY l_suppkey
    """,
)
def product_ndvi_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDVI anomaly: per-pixel baseline climatology (mean/std over the
    baseline epoch) vs the analysis epoch's mean, in ONE pass — the
    epoch split is a conditional aggregate, so the 100 TB plan is a
    single scan + single shuffle.  The z-score itself is left to the
    caller (`(cur_mean - base_mean) / base_std` on bit-identical doubles)
    because std=0 pixels need product-specific nodata policy."""
    lf = load(spark, sf_dir, "lineitem")
    ndvi = (F.col("l_extendedprice") - F.col("l_quantity") * 1000) / (
        F.col("l_extendedprice") + F.col("l_quantity") * 1000
    )
    cut = F.lit(_CUT).cast("timestamp")
    base = F.when(F.col("l_shipdate") < cut, ndvi)
    cur = F.when(F.col("l_shipdate") >= cut, ndvi)
    return lf.groupBy("l_suppkey").agg(
        davg(base, "base_mean"),
        F.round(F.stddev_samp(base), 4).alias("base_std"),
        davg(cur, "cur_mean"),
        F.count(base).alias("n_base"),
        F.count(cur).alias("n_cur"),
    )


@register(
    "product_water_permanency",
    oracle=f"""
        SELECT l_suppkey, wet_count, clear_count, pct_wet,
               CASE WHEN pct_wet IS NULL THEN 'no_data'
                    WHEN pct_wet >= 0.8 THEN 'permanent'
                    WHEN pct_wet >= 0.2 THEN 'seasonal'
                    WHEN pct_wet > 0.0 THEN 'ephemeral'
                    ELSE 'dry' END AS permanency
        FROM (
            SELECT l_suppkey,
                   COUNT(CASE WHEN l_returnflag = 'R' AND l_linestatus = 'F' THEN 1 END)
                     AS wet_count,
                   COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS clear_count,
                   {sql_dround(
                       "COUNT(CASE WHEN l_returnflag = 'R' AND l_linestatus = 'F' THEN 1 END)"
                       " / NULLIF(COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END), 0)")}
                     AS pct_wet
            FROM lineitem
            GROUP BY l_suppkey
        )
    """,
)
def product_water_permanency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water permanency: classify each pixel's wet/clear ratio into
    permanent / seasonal / ephemeral / dry.  Thresholds compare the SAME
    rounded double on both engines, so class boundaries can't disagree.
    The ratio of two integer counts is an exact terminating decimal
    whenever clear = 2^a·5^b, so it MUST take the det.py decimal path
    (``dround``), never ROUND-on-double (midpoint rule divergence).
    One shuffle; the classification is a post-agg projection."""
    lf = load(spark, sf_dir, "lineitem")
    wet = F.count(F.when((F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F"), 1))
    clear = F.count(F.when(F.col("l_linestatus") == "F", 1))
    summary = lf.groupBy("l_suppkey").agg(
        wet.alias("wet_count"),
        clear.alias("clear_count"),
        dround(wet / F.nullif(clear, F.lit(0))).alias("pct_wet"),
    )
    pw = F.col("pct_wet")
    permanency = (
        F.when(pw.isNull(), "no_data")
        .when(pw >= 0.8, "permanent")
        .when(pw >= 0.2, "seasonal")
        .when(pw > 0.0, "ephemeral")
        .otherwise("dry")
    )
    return summary.select(
        "l_suppkey", "wet_count", "clear_count", "pct_wet", permanency.alias("permanency")
    )


@register(
    "product_tsm",
    oracle=f"""
        SELECT l_suppkey,
               {sql_davg("ROUND(3983 * POW(l_discount, 1.6246), 6)", "mean_tsm")},
               MAX(ROUND(3983 * POW(l_discount, 1.6246), 6)) AS max_tsm,
               COUNT(*) AS n_obs
        FROM lineitem
        GROUP BY l_suppkey
    """,
)
def product_tsm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water quality (TSM): Lymburner power law ``3983·g^1.6246`` on a
    [0, 0.1]-range pseudo-green band, then per-zone mean/max.  libm pow →
    per-row round(6) (the scalar_math idiom), then the exact decimal mean
    over identical rounded inputs."""
    lf = load(spark, sf_dir, "lineitem")
    tsm = F.round(3983 * F.pow(F.col("l_discount"), 1.6246), 6)
    return lf.groupBy("l_suppkey").agg(
        davg(tsm, "mean_tsm"),
        F.max(tsm).alias("max_tsm"),
        F.count(F.lit(1)).alias("n_obs"),
    )


@register(
    "product_sar_water",
    oracle=f"""
        SELECT l_suppkey, l_orderkey, l_linenumber, db, filt_db, n_taps,
               CASE WHEN filt_db < -16.0 THEN 'water' ELSE 'land' END AS sar_class
        FROM (
            SELECT l_suppkey, l_orderkey, l_linenumber, db,
                   {sql_exact_double(f"SUM({sql_dec_cast('db')}) OVER w")}
                     / CAST(COUNT(db) OVER w AS DOUBLE) AS filt_db,
                   CAST(COUNT(db) OVER w AS INTEGER) AS n_taps
            FROM (
                SELECT l_suppkey, l_orderkey, l_linenumber,
                       ROUND(10 * LOG10(l_discount + 0.001), 6) AS db
                FROM lineitem
            )
            WINDOW w AS (PARTITION BY l_suppkey
                         ORDER BY l_orderkey, l_linenumber, db
                         ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
        )
    """,
)
def product_sar_water(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAR water detection (§0 product list: Sentinel-1 thresholding) —
    the last named product: backscatter → dB (``10·log10``, the radar
    convention), a 5-tap boxcar SPECKLE FILTER over each pixel's
    acquisition series (W3 rolling mean — SAR speckle is multiplicative
    noise, so single-scene thresholding misclassifies; the boxcar is the
    minimal despeckle), then the dB threshold classification (P6): below
    −16 dB → water.

    Parity: the libm ``log10`` is rounded per-row at 6 dp (the
    scalar_math idiom); the boxcar mean inside the window frame takes the
    decimal-cast path (frame evaluation order differs between engines —
    trap 7).  Shape (100 TB): one window shuffle on the pixel key, no
    join; the per-row dB math rides the scan's codegen stage."""
    lf = load(spark, sf_dir, "lineitem")
    db = F.round(10 * F.log10(F.col("l_discount") + 0.001), 6)
    # The fixture's (l_orderkey, l_linenumber) is NOT unique; db itself is
    # the final tie-break, which makes every frame's MULTISET deterministic
    # (rows still tied after it are output-identical, so either tie order
    # hashes the same).
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_orderkey", "l_linenumber", "db")
        .rowsBetween(-2, 2)
    )
    staged = lf.select("l_suppkey", "l_orderkey", "l_linenumber", db.alias("db"))
    dec_sum = F.sum(dec_cast("db")).over(w)
    cnt = F.count("db").over(w)
    filt = (exact_double(dec_sum) / cnt.cast("double")).alias("filt_db")
    out = staged.select(
        "l_suppkey", "l_orderkey", "l_linenumber", "db", filt, cnt.cast("int").alias("n_taps")
    )
    sar_class = F.when(F.col("filt_db") < -16.0, "water").otherwise("land")
    return out.select(*out.columns, sar_class.alias("sar_class"))
