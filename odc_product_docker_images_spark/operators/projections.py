"""Per-row projections (SURVEY.md §2.2 P3-P6).

Reference analogs:
- P3 band math: NDVI/EVI-style per-pixel arithmetic
  (``data_cube_utilities/vegetation.py``) → pure Column expressions,
  IEEE-exact and whole-stage-codegen'd (no Python in the hot path).
- P4 QA bitmask: Landsat ``pixel_qa`` CFMask bitfield decode
  (``landsat_qa_clean_mask``) → bitwise ops on an integer column.
- P5 nodata: per-measurement sentinel → NULL masking (``Measurement.nodata``,
  ``odc-algo keep_good_np``) → ``when(col==sentinel, NULL)``; aggregates
  then skip NULLs natively, exactly like nan-aware numpy reducers.
- P6 conditional classification: xarray ``where`` chains →
  ``when().when().otherwise()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register
from ..schemas import NODATA


@register(
    "proj_band_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS disc_price,
               (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charge,
               (l_extendedprice - l_quantity * 1000)
                 / (l_extendedprice + l_quantity * 1000) AS ndvi_like
        FROM lineitem
    """,
)
def proj_band_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: per-pixel band arithmetic. ``ndvi_like`` mirrors the normalized
    difference form (nir-red)/(nir+red); per-row IEEE ops are bit-identical
    across engines so no rounding is needed."""
    lf = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    ndvi_like = (F.col("l_extendedprice") - F.col("l_quantity") * 1000) / (
        F.col("l_extendedprice") + F.col("l_quantity") * 1000
    )
    return lf.select(
        "l_orderkey",
        "l_linenumber",
        disc_price.alias("disc_price"),
        charge.alias("charge"),
        ndvi_like.alias("ndvi_like"),
    )


@register(
    "proj_nodata_null",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_discount = 0.0 THEN NULL ELSE l_discount END AS discount_masked,
               COALESCE(CASE WHEN l_discount = 0.0 THEN NULL ELSE l_discount END, 0.05)
                 AS discount_filled,
               CAST(l_discount = 0.0 AS INTEGER) AS is_nodata
        FROM lineitem
    """,
)
def proj_nodata_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: nodata sentinel → NULL (+ first-valid ``coalesce`` fill, the
    ``reproject_and_fuse`` fuser semantics)."""
    lf = load(spark, sf_dir, "lineitem")
    sentinel = NODATA["lineitem"]["l_discount"]
    masked = F.when(F.col("l_discount") == sentinel, None).otherwise(F.col("l_discount"))
    return lf.select(
        "l_orderkey",
        "l_linenumber",
        masked.alias("discount_masked"),
        F.coalesce(masked, F.lit(0.05)).alias("discount_filled"),
        (F.col("l_discount") == sentinel).cast("int").alias("is_nodata"),
    )


@register(
    "proj_case_when",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_quantity < 10 THEN 'low'
                    WHEN l_quantity < 30 THEN 'mid'
                    WHEN l_quantity < 45 THEN 'high'
                    ELSE 'extreme' END AS qty_class
        FROM lineitem
    """,
)
def proj_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: threshold classification chain (xarray ``where`` ladder)."""
    lf = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    cls = (
        F.when(q < 10, "low").when(q < 30, "mid").when(q < 45, "high").otherwise("extreme")
    )
    return lf.select("l_orderkey", "l_linenumber", cls.alias("qty_class"))


@register(
    "filter_bitmask",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(l_orderkey % 256 AS BIGINT) AS qa,
               CAST(((l_orderkey % 256) >> 3) & 1 AS BIGINT) AS cloud_bit
        FROM lineitem
        WHERE ((l_orderkey % 256) & 5) = 5
    """,
)
def filter_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: QA bitfield decode — synthesize a ``pixel_qa``-like field from the
    key, keep rows where bits 0 and 2 are set (clear-mask test), expose a
    shifted bit (the CFMask cloud-confidence pattern)."""
    lf = load(spark, sf_dir, "lineitem")
    qa = F.col("l_orderkey") % 256
    return (
        lf.where(qa.bitwiseAND(F.lit(5)) == 5)
        .select(
            "l_orderkey",
            "l_linenumber",
            qa.cast("bigint").alias("qa"),
            F.shiftright(qa, 3).bitwiseAND(F.lit(1)).cast("bigint").alias("cloud_bit"),
        )
    )


@register(
    "proj_unpivot_bands",
    oracle="""
        SELECT l_orderkey, l_linenumber, band, value FROM (
            SELECT l_orderkey, l_linenumber, 'quantity' AS band,
                   l_quantity AS value FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'discount', l_discount
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
        ) WHERE l_orderkey % 7 = 0
    """,
)
def proj_unpivot_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/r5f: wide→long band reshaping — the UNPIVOT/melt direction
    `agg_pivot` inverts.  The datacube's measurement columns become
    (key, band, value) rows, the layout every per-band groupBy/window
    in this engine consumes.  Spark-first: the native ``unpivot``
    (Expand node — one scan, zero shuffle, each input row fans out
    map-side); the oracle states the same reshape as the portable
    UNION ALL.  Values are raw stored doubles — no arithmetic, no
    rounding, nothing to diverge."""
    lf = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 7 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("extendedprice"),
            F.col("l_discount").alias("discount"),
            F.col("l_tax").alias("tax"),
        )
    )
    return lf.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "extendedprice", "discount", "tax"],
        "band",
        "value",
    )
