"""Polygon-zone tagging join — point-in-polygon against a polygon TABLE
(J12/r5c).

`filter_polygon` (operators/scans.py) bakes ONE area-of-interest into the
scan predicate — the ``dc.load(geopolygon=...)`` shape.  The other half
of the reference's spatial surface is zonal TAGGING: every point labeled
with the administrative/tile zone containing it, where the zones are
DATA, not literals (⟨pub⟩ datacube-stats zonal products; PostGIS
``ST_Contains`` join).  Here the zones live in an edge table (one row per
polygon edge), broadcast onto the point stream, and the even-odd ray
cast becomes a per-(point, zone) crossing-parity aggregate — the
classic relational decomposition of a spatial join.

Spark-first: the edge table is a LocalRelation broadcast
(BroadcastNestedLoopJoin — correct for a small zone set: every point
must test every zone's edges); crossing parity is one hash-agg keyed
(point, zone); the zone rollup is a second tiny agg.  At 100 TB the
points stream map-side against the broadcast edges — linear, no skew
(zone cardinality bounds the blow-up at |edges| per point).  For LARGE
zone sets the standard upgrade is a bbox-grid equi-join prefilter (the
`join_nearest_neighbor` blocking pattern) in front of the same parity
test; the exact kernel is unchanged.

Determinism: each edge test is one multiply + one divide + strict
compares on identical operand order (no horizontal edges by
construction, so the divide never sees a zero denominator); crossing
counts are exact integers; zone means take the dsum decimal path.  All
vertex literals CAST to DOUBLE on the DuckDB side (bare literals parse
as DECIMAL — the documented trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import davg, sql_davg
from ..io import fanout, load
from ..registry import register

# Disjoint zones over the (value, user_id) domain; NO horizontal edges
# (every edge has y1 != y2, so the ray-cast divide is always well-defined).
_ZONES: dict[str, list[tuple[float, float]]] = {
    "tri_low": [(20.5, 10.5), (180.5, 20.5), (100.5, 70.5)],
    "quad_mid": [(200.5, 30.5), (420.5, 40.5), (430.5, 100.5), (210.5, 90.5)],
    "arrow_high": [
        (30.5, 90.5),
        (170.5, 95.5),
        (180.5, 140.5),
        (100.5, 110.5),
        (40.5, 138.5),
    ],
}


def _edges() -> list[tuple[str, float, float, float, float]]:
    rows = []
    for zone, verts in _ZONES.items():
        n = len(verts)
        for i in range(n):
            (x1, y1), (x2, y2) = verts[i], verts[(i + 1) % n]
            rows.append((zone, x1, y1, x2, y2))
    return rows


def _edges_values_sql() -> str:
    return ", ".join(
        "({})".format(
            ", ".join(
                [f"'{z}'"]
                + [f"CAST({v!r} AS DOUBLE)" for v in (x1, y1, x2, y2)]
            )
        )
        for z, x1, y1, x2, y2 in _edges()
    )


@register(
    "join_polygon_zone",
    oracle=f"""
        WITH edges(zone_id, x1, y1, x2, y2) AS (VALUES {_edges_values_sql()}),
        pts AS (
            SELECT event_id, value AS px, CAST(user_id AS DOUBLE) AS py, value
            FROM events
        ), cr AS (
            SELECT p.event_id, e.zone_id, p.value,
                   SUM(CASE WHEN ((e.y1 > p.py) <> (e.y2 > p.py))
                             AND p.px < (e.x2 - e.x1) * (p.py - e.y1)
                                        / (e.y2 - e.y1) + e.x1
                        THEN 1 ELSE 0 END) AS crossings
            FROM pts p CROSS JOIN edges e
            GROUP BY 1, 2, 3
        )
        SELECT zone_id,
               COUNT(*) AS n_points,
               {sql_davg("value", "avg_value")},
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM cr WHERE crossings % 2 = 1
        GROUP BY zone_id
    """,
)
def join_polygon_zone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: zonal tagging — broadcast the polygon edge table onto the
    event stream, count ray crossings per (point, zone), keep odd parity,
    roll up per-zone stats.  The data-driven sibling of the literal
    `filter_polygon` predicate."""
    # repartition before the broadcast fan-out: the single-file fixture
    # is one partition, and the 11-edge multiply + parity partials would
    # otherwise run in a single serialized task (CLAUDE.md rule)
    ev = load(spark, sf_dir, "events").repartition(fanout(spark)).select(
        "event_id", F.col("value").alias("px"),
        F.col("user_id").cast("double").alias("py"), "value",
    )
    edges = spark.createDataFrame(
        _edges(), "zone_id string, x1 double, y1 double, x2 double, y2 double"
    )
    cross = (
        ((F.col("y1") > F.col("py")) != (F.col("y2") > F.col("py")))
        & (
            F.col("px")
            < (F.col("x2") - F.col("x1"))
            * (F.col("py") - F.col("y1"))
            / (F.col("y2") - F.col("y1"))
            + F.col("x1")
        )
    ).cast("int")
    parity = (
        ev.crossJoin(F.broadcast(edges))
        .select("event_id", "zone_id", "value", cross.alias("c"))
        .groupBy("event_id", "zone_id", "value")
        .agg(F.sum("c").alias("crossings"))
        .where(F.col("crossings") % 2 == 1)
    )
    return parity.groupBy("zone_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        davg("value", "avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
