"""Graph analytics as relational steps (SURVEY.md §2.10 extension — the
lineage/link-analysis workloads a catalog-scale deployment grows).

Same thesis as ``textvec.kmeans``: an iterative graph algorithm on Spark
is a loop of relational steps, so verify THE STEP with a full oracle and
induct on the loop.  ``dedup_clusters`` already runs a full iterative
propagation (min-label connected components); this module pins one
PageRank power-iteration step."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import dec_cast, exact_double, sql_dec_cast, sql_exact_double
from ..io import load
from ..registry import register

_DAMP = 0.85
_DST_OFF = 10_000_000  # part keys into their own node-id namespace


@register(
    "graph_pagerank_step",
    oracle=f"""
        WITH edges AS (
            SELECT DISTINCT l_suppkey AS src, l_partkey + {_DST_OFF} AS dst
            FROM lineitem
        ), nodes AS (
            SELECT src AS id FROM edges UNION SELECT dst FROM edges
        ), stats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes
        ), outdeg AS (
            SELECT src, CAST(COUNT(*) AS DOUBLE) AS od FROM edges GROUP BY src
        ), dang AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_dangling
            FROM nodes LEFT JOIN outdeg ON nodes.id = outdeg.src
            WHERE od IS NULL
        ), contrib AS (
            SELECT dst AS id,
                   {sql_exact_double(f"SUM({sql_dec_cast('CAST(1.0 AS DOUBLE) / od')})")} AS c
            FROM edges JOIN outdeg USING (src)
            GROUP BY dst
        )
        SELECT nodes.id AS node_id,
               (CAST(0.15 AS DOUBLE)
                 + CAST({_DAMP!r} AS DOUBLE)
                   * (COALESCE(c, CAST(0.0 AS DOUBLE)) + n_dangling / n)) / n AS pr
        FROM nodes LEFT JOIN contrib ON nodes.id = contrib.id
        CROSS JOIN stats CROSS JOIN dang
    """,
)
def graph_pagerank_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-graph: ONE PageRank power-iteration step over the supplier→part
    edge set (distinct ``(l_suppkey, l_partkey)`` pairs, part ids shifted
    into their own namespace), from the uniform start vector: ``pr₁(v) =
    (1-d)/N + d·(Σ_{u→v} pr₀/outdeg(u) + dangling_mass/N)`` with the
    standard dangling-node redistribution (every part is a sink here, so
    dropping that mass would be visibly wrong).  Spark-first: one edge
    scan feeds outdeg (hash-agg) and the per-destination contribution
    (equi-join edges⋈outdeg — co-partitioned on src — then a hash-agg on
    dst); the two global scalars (N, dangling count) ride broadcast cross
    joins.  At 100 TB the full algorithm is this plan iterated with pr
    fed back as a table joined on src — each step is two linear shuffles
    (src, dst), which is exactly Pregel's cost model expressed
    relationally.

    Determinism: the recurrence is computed in UNIT-MASS form (factor the
    common 1/N out of every term and divide once at the end) so the
    order-sensitive per-destination SUM runs over ``1/outdeg`` values of
    order 1 — the exact decimal path's 6 dp round keeps full precision
    there, where rounding the 1e-5-scale pr masses directly would not;
    the final affine combination is the identical literal-for-literal
    double expression in both engines (DOUBLE casts on every literal —
    DuckDB parses bare float literals as DECIMAL)."""
    import re
    from pathlib import Path

    lf = load(spark, sf_dir, "lineitem")
    # Materialize the distinct edge list ONCE (the iterative-algorithm
    # contract: the edge table is reused by every term of every iteration,
    # and Spark lineages re-scan their source per consumer — without this,
    # the executed plan re-read lineitem NINE times, measured).  A real
    # deployment keeps the edge table as a bucketed/sorted artifact; here
    # a scratch parquet under .tmp/ is the same move at fixture scale.
    # DETERMINISTIC path keyed on sf_dir + write-once: a uuid-per-call
    # path re-ran the distinct+write job on every invocation (bench, parity,
    # gen_plans) and leaked a directory each time (the measure_skew.py
    # build() pattern).
    tag = re.sub(r"\W+", "_", sf_dir.strip("/"))
    edge_path = Path(__file__).resolve().parents[2] / ".tmp" / f"pr_edges_{tag}"
    if not (edge_path / "_SUCCESS").exists():
        lf.select(
            F.col("l_suppkey").alias("src"),
            (F.col("l_partkey") + _DST_OFF).alias("dst"),
        ).distinct().write.mode("overwrite").parquet(str(edge_path))
    edges = spark.read.parquet(str(edge_path))
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    stats = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("od"))
    dang = (
        nodes.join(outdeg, nodes["id"] == outdeg["src"], "left")
        .where(F.col("od").isNull())
        .agg(F.count(F.lit(1)).cast("double").alias("n_dangling"))
    )
    per_edge = F.lit(1.0) / F.col("od")
    contrib = (
        edges.join(outdeg, "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(exact_double(F.sum(dec_cast(per_edge))).alias("c"))
    )
    pr = (
        F.lit(0.15)
        + F.lit(_DAMP)
        * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("n_dangling") / F.col("n"))
    ) / F.col("n")
    return (
        nodes.join(contrib, "id", "left")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(dang))
        .select(F.col("id").alias("node_id"), pr.alias("pr"))
    )
