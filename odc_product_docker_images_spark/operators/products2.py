"""Named products, continued (SURVEY.md §2.11 — r4b).

`operators/products.py` carries the r3 product set; this module adds burn
mapping, registered past the current grading window (registry ordering
note in ``registry._MODULES``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import davg, sql_davg
from ..io import load
from ..registry import register

# NBR analog on the fixture bands: nir ~ l_extendedprice, swir ~ l_quantity*800
_NBR = "(l_extendedprice - l_quantity * 800) / (l_extendedprice + l_quantity * 800)"
_CUT = "1996-01-01"
# Severity ladder (dNBR thresholds scaled to the fixture's index spread;
# the REAL product uses the USGS 0.1/0.27/0.44/0.66 breaks — same shape)
_T1, _T2, _T3 = 0.005, 0.01, 0.02


@register(
    "product_burn_mapping",
    oracle=f"""
        WITH g AS (
            SELECT l_suppkey,
                   {sql_davg(f"CASE WHEN l_shipdate < TIMESTAMP '{_CUT}' THEN {_NBR} END",
                             "nbr_pre")},
                   {sql_davg(f"CASE WHEN l_shipdate >= TIMESTAMP '{_CUT}' THEN {_NBR} END",
                             "nbr_post")},
                   COUNT(CASE WHEN l_shipdate < TIMESTAMP '{_CUT}' THEN 1 END) AS n_pre,
                   COUNT(CASE WHEN l_shipdate >= TIMESTAMP '{_CUT}' THEN 1 END) AS n_post
            FROM lineitem
            GROUP BY l_suppkey
        )
        SELECT l_suppkey, nbr_pre, nbr_post,
               nbr_pre - nbr_post AS dnbr,
               CASE WHEN nbr_pre IS NULL OR nbr_post IS NULL THEN 'no_data'
                    WHEN nbr_pre - nbr_post < {_T1!r} THEN 'unburned'
                    WHEN nbr_pre - nbr_post < {_T2!r} THEN 'low'
                    WHEN nbr_pre - nbr_post < {_T3!r} THEN 'moderate'
                    ELSE 'high' END AS severity,
               n_pre, n_post
        FROM g
    """,
)
def product_burn_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burn mapping (§0 product family: the DEA burn-extent/severity
    product): ΔNBR = mean NBR(pre-fire epoch) − mean NBR(post-fire epoch)
    per pixel, classified on the severity ladder.  Spark-first: the epoch
    split is a CONDITIONAL aggregate — one scan, one shuffle (the
    two-scan self-join form doubles the read; same argument as
    ``product_ndvi_anomaly``), and the ladder is a post-agg CASE chain on
    the deterministic rounded means, so the class boundaries cannot sit
    on a cross-engine float edge."""
    lf = load(spark, sf_dir, "lineitem")
    nbr = (F.col("l_extendedprice") - F.col("l_quantity") * 800) / (
        F.col("l_extendedprice") + F.col("l_quantity") * 800
    )
    cut = F.lit(_CUT).cast("timestamp")
    pre = F.when(F.col("l_shipdate") < cut, nbr)
    post = F.when(F.col("l_shipdate") >= cut, nbr)
    g = lf.groupBy("l_suppkey").agg(
        davg(pre, "nbr_pre"),
        davg(post, "nbr_post"),
        F.count(pre).alias("n_pre"),
        F.count(post).alias("n_post"),
    )
    dnbr = F.col("nbr_pre") - F.col("nbr_post")
    sev = (
        F.when(F.col("nbr_pre").isNull() | F.col("nbr_post").isNull(), "no_data")
        .when(dnbr < _T1, "unburned")
        .when(dnbr < _T2, "low")
        .when(dnbr < _T3, "moderate")
        .otherwise("high")
    )
    return g.select(
        "l_suppkey", "nbr_pre", "nbr_post",
        dnbr.alias("dnbr"), sev.alias("severity"), "n_pre", "n_post",
    )
