"""Hierarchy subtree rollup — recursion expressed two ways (X-graph+, r5g).

Warehouse hierarchies (BOM explosions, org charts, category trees) need
ancestor-closure rollups: every node's measure aggregated into every
ancestor's subtree total.  The part keys form a deterministic decimal
tree (parent(k) = ⌊k/10⌋, root 0, depth ≤ log10(maxkey)), which lets the
same closure be stated BOTH ways and hash-compared:

- the ORACLE walks it with a genuine ``WITH RECURSIVE`` ancestor CTE
  (UNION-dedup recursion, the warehouse-standard form DuckDB executes);
- the Spark side exploits the closed form: a node's ancestor set is its
  integer-division chain, one ``array_distinct`` + ``explode`` riding
  the scan — zero joins, zero iterations, one grouped shuffle.

That is the Spark-first lesson in miniature: when the hierarchy has
structure (fixed fan-out, bounded depth, or a materialized path — which
production dimension tables almost always carry), the recursion
COMPILES AWAY into per-row arithmetic; the recursive CTE remains the
semantics contract.  For an arbitrary edge-list hierarchy the engine's
iterative shape is `graph_pagerank_step`/`dedup_clusters` (loop of
relational steps); this key pins the closed-form end of that spectrum.

At 100 TB: the closure explode emits depth ≤ 7 rows per node (the tree
is decimal), all map-side; the only shuffle is the per-ancestor
aggregate with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import dsum, sql_dsum
from ..io import load
from ..registry import register

_LEVELS = 7  # ancestor-chain length bound: covers keys < 10^7


@register(
    "graph_subtree_rollup",
    oracle=f"""
        WITH RECURSIVE anc(node, ancestor) AS (
            SELECT p_partkey AS node, p_partkey AS ancestor FROM part
            UNION
            SELECT node, CAST(FLOOR(ancestor / 10) AS BIGINT)
            FROM anc WHERE ancestor > 0
        )
        SELECT a.ancestor,
               COUNT(*) AS n_subtree,
               {sql_dsum("p_retailprice", "subtree_price")}
        FROM anc a JOIN part p ON a.node = p.p_partkey
        WHERE a.ancestor < 100
        GROUP BY a.ancestor
    """,
)
def graph_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-graph+: ancestor-closure subtree totals over the decimal part
    tree — node count and exact-decimal retail-price sum per ancestor
    (ancestors < 100 keep the report head-sized).  The oracle recurses;
    the Spark plan computes each node's whole ancestor chain as integer
    divisions in the scan projection."""
    pt = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    chain = F.array_distinct(
        F.array(
            *[
                (F.col("p_partkey") / F.lit(10**i)).cast("bigint")
                for i in range(_LEVELS)
            ]
        )
    )
    return (
        pt.select(
            F.explode(chain).alias("ancestor"), "p_retailprice"
        )
        .where(F.col("ancestor") < 100)
        .groupBy("ancestor")
        .agg(
            F.count(F.lit(1)).alias("n_subtree"),
            dsum("p_retailprice", "subtree_price"),
        )
    )
