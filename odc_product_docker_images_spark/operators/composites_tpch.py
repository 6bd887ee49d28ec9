"""Additional TPC-H-shaped composites (SURVEY.md §2.4/§2.3 composites).

``operators/composites.py`` carries the Q1/Q3/Q5 shapes; this module adds
the HAVING-semi-join shape (Q18, "large volume customers") — the pattern
where an aggregate over the fact table acts as an EXISTENCE FILTER for a
subsequent multi-way join.  It exercises a plan form nothing else in the
registry does: aggregate → filter on the aggregate → join back to the SAME
fact table's dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import dsum, sql_dsum
from ..io import load
from ..registry import register

_QTY = 250.0  # ~top few % of orders at every sf (qty ~ U(1,50), ~4 lines/order)


@register(
    "composite_q18_shape",
    oracle=f"""
        WITH big AS (
            SELECT l_orderkey, {sql_dsum("l_quantity", "sum_qty")}
            FROM lineitem
            GROUP BY l_orderkey
        )
        SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice, b.sum_qty
        FROM big b
        JOIN orders o ON o.o_orderkey = b.l_orderkey
        WHERE b.sum_qty > {_QTY!r}
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
)
def composite_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped: large-volume orders — per-order quantity rollup as
    an existence filter (HAVING sum > threshold), joined back to the order
    header, global top-100 by price.  Plan shape to want at 100 TB (and
    pinned in tests/test_plans.py): the rollup PARTIAL-aggregates map-side
    before its one shuffle; the filter on the aggregate runs BEFORE the
    join, so the join's left input is the few filtered orders, not the
    fact table; the top-100 is TakeOrderedAndProject (per-partition heaps
    + one driver merge), never a global sort.  Quantities are integral, so
    the deterministic decimal sum is exact and the `> 250` boundary cannot
    sit on a rounding edge."""
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "sum_qty"))
        .where(F.col("sum_qty") > _QTY)
    )
    return (
        big.join(od, big.l_orderkey == od.o_orderkey)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "composite_q10_shape",
    oracle=f"""
        WITH rev AS (
            SELECT o.o_custkey,
                   {sql_dsum(
                       "l.l_extendedprice * (1.0 - l.l_discount)", "revenue"
                   )}
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_returnflag = 'R'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY o.o_custkey
        )
        SELECT c.c_custkey, c.c_name, c.c_nationkey AS nation,
               c.c_acctbal, r.revenue
        FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
        ORDER BY r.revenue DESC, c.c_custkey ASC
        LIMIT 20
    """,
)
def composite_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — top-20 customers by returned-item revenue in a
    one-year window: the returned-merchandise loss report.  The classic
    star probe: the fact scan keeps only R-flag rows and the year window
    (both predicates PUSHED), joins the orders key bridge, aggregates
    once per customer, decorates from the broadcast customer dim, and
    finishes with a limit-20 TakeOrdered (revenue DESC, custkey
    tie-break) — never a global sort."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    od = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    rev = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "revenue",
            )
        )
    )
    cu = load(spark, sf_dir, "customer")
    return (
        rev.join(F.broadcast(cu), rev.o_custkey == cu.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("c_nationkey").cast("int").alias("nation"),
            "c_acctbal",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )
