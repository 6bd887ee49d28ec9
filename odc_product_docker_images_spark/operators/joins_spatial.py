"""Nearest-neighbor spatial join (SURVEY.md §2.3 extension).

Reference analog: "attach each observation to its nearest ground station /
validation site" — the point-to-point NN join EO validation pipelines run
(the vector twin of the raster ``agg_zonal_stats``).

Spark-first shape: the candidates-then-verify pattern at its purest.  A
naive NN join is a cross product (|points| × |stations|); the scalable
form blocks both sides onto a square grid and probes only the 5×5
neighborhood of each point's cell.  The 5×5 radius is not a heuristic —
it is EXACT under a density precondition the station layout guarantees by
construction: every grid cell holds ≥ 1 station, so the true nearest
station is at most one cell diagonal (C·√2) away, while any station
outside the 5×5 block is ≥ 2C away and 2C > C·√2.  Candidates-per-point
is a small constant, shuffle volume is linear in points + 25× stations
(cells are near-uniform, no skew key), and the argmin is an ordinary
min-of-struct aggregate — no window over the full candidate set needed.

The DuckDB oracle runs the BRUTE-FORCE cross product and picks the same
argmin — proving blocked == exhaustive, same as the zonal-stats key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_C = 25.0  # square cell size (the 5x5 exactness argument needs square)
_NX, _NCELLS = 20, 120  # 20 x 6 grid over (value, user_id) space
_MIX = 2654435761  # Knuth multiplicative hash constant (public)


def _stations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize one station per customer, ≥1 per grid cell by
    construction (c_custkey mod 120 covers every cell at every sf; jitter
    from a multiplicative hash places it inside the cell)."""
    cu = load(spark, sf_dir, "customer")
    cell = F.col("c_custkey").cast("long") % _NCELLS
    fx = (F.col("c_custkey").cast("long") * _MIX % 1000) / F.lit(1000.0)
    fy = (F.col("c_custkey").cast("long") * 40503 % 1000) / F.lit(1000.0)
    return cu.select(
        F.col("c_custkey").cast("long").alias("st_id"),
        ((cell % _NX).cast("double") + fx) * F.lit(_C),
        (F.expr(f"(CAST(c_custkey AS BIGINT) % {_NCELLS}) div {_NX}").cast("double") + fy)
        * F.lit(_C),
    ).toDF("st_id", "sx", "sy")


_SQL_STATIONS = f"""
            SELECT CAST(c_custkey AS BIGINT) AS st_id,
                   (CAST((CAST(c_custkey AS BIGINT) % {_NCELLS}) % {_NX} AS DOUBLE)
                    + (CAST(c_custkey AS BIGINT) * {_MIX} % 1000) / 1000.0) * {_C!r} AS sx,
                   (CAST((CAST(c_custkey AS BIGINT) % {_NCELLS}) // {_NX} AS DOUBLE)
                    + (CAST(c_custkey AS BIGINT) * 40503 % 1000) / 1000.0) * {_C!r} AS sy
            FROM customer
"""


@register(
    "join_nearest_neighbor",
    oracle=f"""
        WITH stations AS ({_SQL_STATIONS}),
        pts AS (
            SELECT event_id, value AS px, CAST(user_id AS DOUBLE) AS py
            FROM events WHERE event_id % 10 = 0
        ),
        cand AS (
            SELECT p.event_id, s.st_id,
                   (p.px - s.sx) * (p.px - s.sx) + (p.py - s.sy) * (p.py - s.sy) AS d2
            FROM pts p CROSS JOIN stations s
        ),
        ranked AS (
            SELECT event_id, st_id AS nearest_id, d2,
                   ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY d2, st_id) AS rk
            FROM cand
        )
        SELECT event_id, nearest_id, d2 FROM ranked WHERE rk = 1
    """,
)
def join_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-spatial: exact nearest station per point via the grid-blocked 5×5
    probe.  Points key to their cell; stations carry theirs; the equi-join
    on (point cell + offset) = station cell yields ≤ 25 cells of
    candidates per point; one min-of-struct aggregate picks the argmin
    (d2 first, station id as the unique tie-break).  Distance stays
    unrounded: the identical ``(px−sx)²+(py−sy)²`` expression tree is
    bit-deterministic IEEE arithmetic in both engines (per-row, no
    summation-order dependence)."""
    st = _stations(spark, sf_dir).withColumns(
        {
            "scx": F.floor(F.col("sx") / _C).cast("long"),
            "scy": F.floor(F.col("sy") / _C).cast("long"),
        }
    )
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("event_id") % 10 == 0)
        # single-file input -> one partition; repartition BEFORE the 25x
        # explode so candidate generation and the argmin agg parallelize
        .repartition(32, "event_id")
    )
    off = F.array(*[F.lit(i) for i in range(-2, 3)])
    pts = (
        ev.select(
            "event_id",
            F.col("value").alias("px"),
            F.col("user_id").cast("double").alias("py"),
        )
        .withColumn("dx", F.explode(off))
        .withColumn("dy", F.explode(off))
        .select(
            "event_id",
            "px",
            "py",
            (F.floor(F.col("px") / _C).cast("long") + F.col("dx")).alias("scx"),
            (F.floor(F.col("py") / _C).cast("long") + F.col("dy")).alias("scy"),
        )
    )
    d2 = (F.col("px") - F.col("sx")) * (F.col("px") - F.col("sx")) + (
        F.col("py") - F.col("sy")
    ) * (F.col("py") - F.col("sy"))
    cand = pts.join(st, ["scx", "scy"]).select(
        "event_id", d2.alias("d2"), "st_id"
    )
    m = (
        cand.groupBy("event_id")
        .agg(F.min(F.struct(F.col("d2"), F.col("st_id"))).alias("m"))
    )
    return m.select(
        "event_id",
        F.col("m.st_id").alias("nearest_id"),
        F.col("m.d2").alias("d2"),
    )
