"""Scans with pushdown (SURVEY.md §2.1 S1/P1/P2).

Reference analog: ``Datacube.load(product, time=(t0,t1), lat/lon,
measurements=[...])`` — the Postgres index resolves the spatiotemporal
predicate (pushdown) and GDAL reads only the requested bands (column
pruning).  Spark-first: declare ``select`` + ``where`` on the parquet scan
and Catalyst pushes both into the reader — ``.explain`` shows
``PushedFilters`` and a pruned ``ReadSchema`` (asserted in
``plans/checks.py``).  At 100 TB the same plan prunes whole partitions
when the table is laid out ``partitionBy(time_key)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register


@register(
    "scan_pushdown",
    oracle="""
        SELECT l_orderkey, l_quantity, l_shipdate
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_quantity > 30
    """,
)
def scan_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/P1: band selection + time predicate, both pushed into the scan."""
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_shipdate")
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_quantity") > 30)
        )
    )


@register(
    "filter_range",
    oracle="""
        SELECT l_orderkey, l_partkey, l_suppkey, l_quantity
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_partkey BETWEEN 100 AND 500
    """,
)
def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: spatio-temporal bbox analog — time range + key range (the
    lat/lon bbox of ``datacube.api.query.Query``, re-expressed as sargable
    range predicates that reach the parquet row-group stats)."""
    lf = load(spark, sf_dir, "lineitem")
    return lf.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_partkey").between(100, 500)
    ).select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
