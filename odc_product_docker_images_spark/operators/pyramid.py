"""Overview pyramid: multi-resolution composites in ONE pass (§2.1 S6+).

Reference analog: COG overviews / tile pyramids — every serving stack
precomputes the same composite at 2×, 4×, 8× coarser grids so zoomed-out
requests read the small level.  The naive build is one grouped pass PER
LEVEL (re-scanning the source each time); the Spark-first build is a
single ``groupingSets`` aggregate over the precomputed cell ids of every
level — Catalyst's one Expand operator fans each row into its levels and
ONE partial-aggregated shuffle builds the whole pyramid.  Scan count: 1,
regardless of pyramid depth (plan-pinned); the oracle IS the naive
level-at-a-time build (UNION ALL of 4 grouped passes), proving
fused == sequential.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import davg, sql_davg
from ..io import load
from ..registry import register

_BASE = 25.0  # level-0 cell size over (value, user_id); levels double it
_LEVELS = 4


def _sql_level(level: int) -> str:
    c = _BASE * (2**level)
    return f"""
        SELECT CAST({level} AS INTEGER) AS level,
               CAST(FLOOR(value / {c!r}) AS BIGINT) AS cell_x,
               CAST(FLOOR(user_id / {c!r}) AS BIGINT) AS cell_y,
               COUNT(*) AS n_obs,
               {sql_davg("value", "mean_value")}
        FROM events
        GROUP BY 2, 3
    """


@register(
    "regrid_pyramid",
    oracle=" UNION ALL ".join(_sql_level(lv) for lv in range(_LEVELS)),
)
def regrid_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6+: the 4-level overview pyramid in ONE grouped pass — each row
    precomputes its cell id per level, ``groupingSets`` expands it into
    its 4 level memberships, and a single hash aggregate (partial
    map-side, one Exchange) emits every level.  ``grouping()`` flags
    decode the level id; ``coalesce`` across the per-level cell columns
    recovers the cell (non-grouped columns are NULLed by the expand)."""
    ev = load(spark, sf_dir, "events")
    cells = ev.select(
        "value",
        *[
            F.floor(F.col("value") / (_BASE * 2**lv)).cast("long").alias(f"x{lv}")
            for lv in range(_LEVELS)
        ],
        *[
            F.floor(F.col("user_id") / (_BASE * 2**lv)).cast("long").alias(f"y{lv}")
            for lv in range(_LEVELS)
        ],
    )
    gcols = [F.col(f"x{lv}") for lv in range(_LEVELS)] + [
        F.col(f"y{lv}") for lv in range(_LEVELS)
    ]
    sets = [[F.col(f"x{lv}"), F.col(f"y{lv}")] for lv in range(_LEVELS)]
    level = F.lit(None).cast("int")
    for lv in range(_LEVELS - 1, -1, -1):
        level = F.when(F.grouping(f"x{lv}") == 0, lv).otherwise(level)
    agg = cells.groupingSets(sets, *gcols).agg(
        level.cast("int").alias("level"),
        F.count(F.lit(1)).alias("n_obs"),
        davg("value", "mean_value"),
    )
    return agg.select(
        "level",
        F.coalesce(*[F.col(f"x{lv}") for lv in range(_LEVELS)]).alias("cell_x"),
        F.coalesce(*[F.col(f"y{lv}") for lv in range(_LEVELS)]).alias("cell_y"),
        "n_obs",
        "mean_value",
    )
