"""The SQL front door (SURVEY.md §3 E1 / §2.4 composites — r4b).

Every other key declares its plan through the DataFrame API; this one
proves the engine's SECOND public surface — ``spark.sql`` over registered
views — produces the same Catalyst plans from raw ANSI text.  The query
below is written ONCE in the dialect intersection (ANSI joins, CASE,
HAVING, scalar functions both engines share) and submitted verbatim to
BOTH engines: the Spark side runs it through ``spark.sql`` on temp views,
the oracle IS the same string.  A user porting reference SQL reports gets
this contract: paste the query, get the answer, keep the pushdown (the
text form plans identically to the DataFrame form — same pushed filters,
same broadcast, pinned in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load
from ..registry import register

# One statement, both engines, verbatim: revenue by region for priority
# orders, only regions clearing a floor — join + filter + agg + HAVING +
# ORDER BY with a unique tie-break.  (Float determinism: quantities are
# integral doubles, so SUM is exact in both engines at this magnitude.)
_SQL = """
    SELECT r.r_name AS region,
           COUNT(*) AS n_items,
           CAST(SUM(l.l_quantity) AS BIGINT) AS total_qty
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY r.r_name
    HAVING COUNT(*) > 10
    ORDER BY total_qty DESC, region
"""


@register("sql_frontend", oracle=_SQL)
def sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1/SQL: the identical ANSI text runs on both engines — Spark gets
    it through ``spark.sql`` over temp views of the fixture tables (the
    views are metadata only; scans, pushdown, and join strategy come from
    Catalyst exactly as in the DataFrame keys).  The five-way join is the
    TPC-H denormalization spine; AQE broadcasts the three dim tables."""
    for t in ("lineitem", "orders", "customer", "nation", "region"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL)
