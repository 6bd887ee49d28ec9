"""Sorts, limits, set operations (SURVEY.md §2.6 O1-O5).

Reference analogs: time-ordered scene processing (``Datacube.group_datasets``
sorts by time), "latest N scenes", multi-platform collection stacking
(LS8 ∪ LS9 ∪ S2 harmonized in ``dc_load``), epoch validity intersection,
and index-vs-ledger diffs.

Scale notes: a global sort is a range-partitioned exchange (sampled
boundaries) — fine once per output, never inside a loop.  ``orderBy +
limit`` compiles to TakeOrdered (per-partition top-k then merge on the
driver: no full sort, no full shuffle).  Set ops are aggregations
underneath (one shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register


@register(
    "sort_limit",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 10
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2: global sort + top-k — "latest/priciest N scenes".  Total
    ordering via unique tie-breaks makes the selected SET deterministic;
    Spark compiles this to TakeOrdered (no full shuffle)."""
    lf = load(spark, sf_dir, "lineitem")
    return (
        lf.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
        .limit(10)
    )


@register(
    "set_union",
    oracle="""
        SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 9000
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: union — stack collections (multi-platform harmonized load).
    ``unionByName`` resolves by column name, the engine's default (positional
    ``union`` is a footgun once schemas evolve)."""
    cu = load(spark, sf_dir, "customer")
    a = cu.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_mktsegment")
    b = cu.where(F.col("c_acctbal") > 9000).select("c_custkey", "c_mktsegment")
    return a.unionByName(b)


@register(
    "set_intersect",
    oracle="""
        SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996
        INTERSECT
        SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1997
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: intersect (distinct) — pixels valid in both epochs."""
    od = load(spark, sf_dir, "orders")
    a = od.where(F.year("o_orderdate") == 1996).select("o_custkey")
    b = od.where(F.year("o_orderdate") == 1997).select("o_custkey")
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
        SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: except (distinct) — scenes indexed but never processed."""
    cu = load(spark, sf_dir, "customer")
    od = load(spark, sf_dir, "orders")
    return cu.select("c_custkey").subtract(od.select(F.col("o_custkey").alias("c_custkey")))
