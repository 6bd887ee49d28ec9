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
