"""Zonal statistics via a grid-blocked spatial join (SURVEY.md §2.4/§2.3
extension — the reference stack's polygon-drill / ``zonal_stats`` product).

The EO workload: per-region summaries of a raster band ("mean NDVI per
administrative district").  The scalable relational shape is a SPATIAL
JOIN, and the scale pattern is the same candidates-then-verify design the
textvec dedup family uses: block both sides onto coarse grid cells (each
point belongs to exactly ONE cell; each zone explodes to the few cells its
bounding box covers), equi-join on the cell key, then run the exact
geometric test only on co-celled candidates.  Shuffle volume is linear in
points + zone-cell fanout — never |points| × |zones|, which is what the
naive theta join costs (and exactly what the DuckDB oracle runs, proving
blocked == brute force)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import davg, sql_davg
from ..io import load
from ..registry import register

# Zone geometry: one diamond (L1 ball) per nation row, centers laid out on
# a 5×5 grid over the (value, user_id) plane, semi-axes rx/ry sized to
# OVERLAP neighbours slightly (a point near a tip can belong to two zones
# — zonal stats over overlapping zones counts it in both, like overlapping
# admin boundaries).  The inside test |dx|·ry + |dy|·rx < rx·ry is pure
# IEEE arithmetic — no trig, no ray cast — so both engines agree bitwise.
_RX, _RY = 55.0, 16.0
_CELL_X, _CELL_Y = 100.0, 30.0  # blocking grid ≥ zone bbox ⇒ ≤ 2 cells/axis


@register(
    "agg_zonal_stats",
    oracle=f"""
        WITH zones AS (
            SELECT n_nationkey AS zone_id,
                   CAST(n_nationkey % 5 AS DOUBLE) * 100.0 + 50.0 AS cx,
                   CAST(n_nationkey // 5 AS DOUBLE) * 30.0 + 15.0 AS cy
            FROM nation
        )
        SELECT zone_id,
               COUNT(value) AS n_points,
               {sql_davg("value", "mean_value")}
        FROM zones LEFT JOIN events
          ON ABS(value - cx) * {_RY!r} + ABS(CAST(user_id AS DOUBLE) - cy) * {_RX!r}
             < {_RX * _RY!r}
        GROUP BY zone_id
    """,
)
def agg_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal statistics (mean band value + support per zone) through the
    GRID-BLOCKED spatial join.  Points (events in the (value, user_id)
    plane) key themselves to their single covering grid cell; zones
    (diamonds derived arithmetically from the nation table) explode to
    every cell their bbox touches (≤4 here, via ``sequence``); the
    cell-key equi-join produces co-located candidates and the exact
    L1-ball test keeps true members.  Empty zones survive via the final
    left join (n_points = 0, mean NULL).

    The ORACLE runs the naive |zones| × |points| theta join — the blocked
    plan must be indistinguishable from brute force, which holds because
    a point's cell always appears in the covering-cell set of every zone
    whose bbox contains the point (grid pitch ≥ zone bbox by
    construction).  At 100 TB: zone-cell fanout rides a broadcast (admin
    boundaries are small); a planetary zone TABLE instead shuffles both
    sides on the cell key — either way nothing is quadratic, while the
    oracle's cross-join shape would be.  Determinism: centers/extents are
    exact decimal-literal arithmetic on both sides, the inside test is
    identical-order IEEE multiply-adds with a strict compare, and the
    zonal mean takes the exact decimal path (det.davg)."""
    nat = load(spark, sf_dir, "nation")
    zones = nat.select(
        F.col("n_nationkey").alias("zone_id"),
        ((F.col("n_nationkey") % 5).cast("double") * 100.0 + 50.0).alias("cx"),
        (F.expr("n_nationkey div 5").cast("double") * 30.0 + 15.0).alias("cy"),
    )
    zone_cells = zones.select(
        "zone_id",
        "cx",
        "cy",
        F.explode(
            F.sequence(
                F.floor((F.col("cx") - _RX) / _CELL_X),
                F.floor((F.col("cx") + _RX) / _CELL_X),
            )
        ).alias("cell_x"),
    ).select(
        "zone_id",
        "cx",
        "cy",
        "cell_x",
        F.explode(
            F.sequence(
                F.floor((F.col("cy") - _RY) / _CELL_Y),
                F.floor((F.col("cy") + _RY) / _CELL_Y),
            )
        ).alias("cell_y"),
    )

    pts = load(spark, sf_dir, "events").select(
        F.col("value"),
        F.col("user_id").cast("double").alias("py"),
        F.floor(F.col("value") / _CELL_X).alias("cell_x"),
        F.floor(F.col("user_id").cast("double") / _CELL_Y).alias("cell_y"),
    )
    inside = (
        F.abs(F.col("value") - F.col("cx")) * F.lit(_RY)
        + F.abs(F.col("py") - F.col("cy")) * F.lit(_RX)
        < F.lit(_RX * _RY)
    )
    matched = (
        pts.join(F.broadcast(zone_cells), ["cell_x", "cell_y"])
        .where(inside)
        .groupBy("zone_id")
        .agg(F.count("value").alias("n"), davg("value", "mean_value"))
    )
    return zones.join(matched, "zone_id", "left").select(
        "zone_id",
        F.coalesce("n", F.lit(0).cast("long")).alias("n_points"),
        "mean_value",
    )
