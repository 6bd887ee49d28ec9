"""Inverse Transverse Mercator + round-trip closure (S6+++, r5c).

`proj_crs_curvilinear` (operators/scans.py) is the forward
geographic→projected leg of ``reproject_and_fuse``.  Real load paths run
BOTH directions — the index stores projected extents, products are
queried in lat/lon — so this module adds Snyder's ellipsoidal inverse
series (⟨pub⟩ Snyder 1987, "Map Projections: A Working Manual",
eqs. 8-18..8-25: footpoint latitude via the rectifying series, then the
D-polynomial corrections) and registers the full ROUND TRIP: forward
project, round to the 4-dp artifact grid (what the sink stores), invert,
and gate per cell on closure back to the source coordinates within 5 mm.

The closure gate is the load-bearing check: forward and inverse are
INDEPENDENT series, so an error in either leg (a wrong coefficient, a
flipped sign, a mis-ordered term) breaks inverse(forward(x)) ≈ x by
meters, not millimetres.  The 5 mm tolerance sits ~6 orders above the
cross-engine libm ulp noise and ~1 order above the 0.1 mm artifact
rounding — no boundary exposure.

Spark-first: both legs are one codegen'd expression chain riding the
scan (no UDF, no extra pass); the only shuffle is the cell composite.
Determinism: shared expression TEXT on both engines (every constant CAST
to DOUBLE), recovered coordinates rounded at 6 dp (≈0.1 m grid, far
above ulp noise) before the davg decimal path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import davg, dround, sql_davg, sql_dround
from ..io import load
from ..registry import register
from .scans import _TM, _TM_STEPS, _tm_c

# Rectifying-series coefficients for the footpoint latitude (Snyder 8-19):
# e1 = (1 - sqrt(1-e2)) / (1 + sqrt(1-e2)); powers precomputed in Python so
# both engines see identical double literals.
_E1 = (1.0 - math.sqrt(1.0 - _TM["e2"])) / (1.0 + math.sqrt(1.0 - _TM["e2"]))
_J2 = 3.0 * _E1 / 2.0 - 27.0 * _E1**3 / 32.0
_J4 = 21.0 * _E1**2 / 16.0 - 55.0 * _E1**4 / 32.0
_J6 = 151.0 * _E1**3 / 96.0
_J8 = 1097.0 * _E1**4 / 512.0

# ordered (name, expr) inverse steps; consume easting_r/northing_r (the
# ROUNDED artifact coordinates — you invert what the sink stored).
_TM_INV_STEPS: list[tuple[str, str]] = [
    ("xx", f"easting_r - {_tm_c(500000.0)}"),
    ("mu", f"(northing_r / {_tm_c(_TM['k0'])}) / ({_tm_c(_TM['a'])} * {_tm_c(_TM['m0'])})"),
    (
        "phi1",
        f"mu + {_tm_c(_J2)} * SIN({_tm_c(2.0)} * mu)"
        f" + {_tm_c(_J4)} * SIN({_tm_c(4.0)} * mu)"
        f" + {_tm_c(_J6)} * SIN({_tm_c(6.0)} * mu)"
        f" + {_tm_c(_J8)} * SIN({_tm_c(8.0)} * mu)",
    ),
    ("sphi1", "SIN(phi1)"),
    ("cphi1", "COS(phi1)"),
    ("tphi1", "TAN(phi1)"),
    ("c1", f"{_tm_c(_TM['ep2'])} * cphi1 * cphi1"),
    ("t1", "tphi1 * tphi1"),
    ("n1", f"{_tm_c(_TM['a'])} / SQRT({_tm_c(1.0)} - {_tm_c(_TM['e2'])} * sphi1 * sphi1)"),
    (
        "r1",
        f"{_tm_c(_TM['a'])} * ({_tm_c(1.0)} - {_tm_c(_TM['e2'])})"
        f" / POW({_tm_c(1.0)} - {_tm_c(_TM['e2'])} * sphi1 * sphi1, {_tm_c(1.5)})",
    ),
    ("dd", f"xx / (n1 * {_tm_c(_TM['k0'])})"),
    (
        "phi_back",
        "phi1 - (n1 * tphi1 / r1) * (dd * dd / " + _tm_c(2.0)
        + f" - ({_tm_c(5.0)} + {_tm_c(3.0)} * t1 + {_tm_c(10.0)} * c1"
        f" - {_tm_c(4.0)} * c1 * c1 - {_tm_c(9.0)} * {_tm_c(_TM['ep2'])})"
        f" * dd * dd * dd * dd / {_tm_c(24.0)}"
        f" + ({_tm_c(61.0)} + {_tm_c(90.0)} * t1 + {_tm_c(298.0)} * c1"
        f" + {_tm_c(45.0)} * t1 * t1 - {_tm_c(252.0)} * {_tm_c(_TM['ep2'])}"
        f" - {_tm_c(3.0)} * c1 * c1)"
        f" * dd * dd * dd * dd * dd * dd / {_tm_c(720.0)})",
    ),
    (
        "dlam_back",
        f"(dd - ({_tm_c(1.0)} + {_tm_c(2.0)} * t1 + c1) * dd * dd * dd / {_tm_c(6.0)}"
        f" + ({_tm_c(5.0)} - {_tm_c(2.0)} * c1 + {_tm_c(28.0)} * t1"
        f" - {_tm_c(3.0)} * c1 * c1 + {_tm_c(8.0)} * {_tm_c(_TM['ep2'])}"
        f" + {_tm_c(24.0)} * t1 * t1)"
        f" * dd * dd * dd * dd * dd / {_tm_c(120.0)}) / cphi1",
    ),
    # closure errors in metres (small-angle arc length; exact enough for a
    # gate 6 orders above the noise floor)
    ("err_lat_m", f"ABS(phi_back - phi) * {_tm_c(_TM['a'])}"),
    ("err_lon_m", f"ABS(dlam_back - dlam) * {_tm_c(_TM['a'])} * cphi"),
    ("lat_back_deg", f"phi_back / {_tm_c(_TM['deg'])}"),
    ("dlam_back_deg", f"dlam_back / {_tm_c(_TM['deg'])}"),
]

_TOL_M = 0.005


def _roundtrip_oracle() -> str:
    inner = "SELECT event_id, user_id, value FROM events"
    for name, txt in _TM_STEPS:
        inner = f"SELECT *, {txt} AS {name} FROM ({inner})"
    inner = (
        f"SELECT *, {sql_dround('easting', 4)} AS easting_r,"
        f" {sql_dround('northing', 4)} AS northing_r FROM ({inner})"
    )
    for name, txt in _TM_INV_STEPS:
        inner = f"SELECT *, {txt} AS {name} FROM ({inner})"
    inner = (
        f"SELECT *, {sql_dround('lat_back_deg', 6)} AS lat_back_r,"
        f" {sql_dround('dlam_back_deg', 6)} AS dlam_back_r FROM ({inner})"
    )
    return f"""
        SELECT CAST(FLOOR(easting_r / 512.0) AS BIGINT) AS cell_e,
               CAST(FLOOR(northing_r / 512.0) AS BIGINT) AS cell_n,
               COUNT(*) AS n_obs,
               CAST(MAX(GREATEST(err_lat_m, err_lon_m)) < {_TOL_M!r} AS INTEGER)
                 AS closes_within_5mm,
               {sql_davg("lat_back_r", "mean_lat_back")},
               {sql_davg("dlam_back_r", "mean_dlam_back")}
        FROM ({inner})
        GROUP BY 1, 2
    """


@register("proj_crs_roundtrip", oracle=_roundtrip_oracle())
def proj_crs_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6+++: TM forward → 4-dp artifact grid → Snyder inverse series →
    per-cell closure gate (max coordinate error < 5 mm) + recovered
    lat/Δλ means.  Forward and inverse are independent series, so the
    closure flag catches a defect in either leg; both legs ride one
    codegen'd projection with the cell composite as the only shuffle."""
    df = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    for name, txt in _TM_STEPS:
        df = df.withColumn(name, F.expr(txt))
    df = df.withColumn("easting_r", dround("easting", 4)).withColumn(
        "northing_r", dround("northing", 4)
    )
    for name, txt in _TM_INV_STEPS:
        df = df.withColumn(name, F.expr(txt))
    df = df.withColumn("lat_back_r", dround("lat_back_deg", 6)).withColumn(
        "dlam_back_r", dround("dlam_back_deg", 6)
    )
    return df.groupBy(
        F.floor(F.col("easting_r") / F.lit(512.0)).cast("bigint").alias("cell_e"),
        F.floor(F.col("northing_r") / F.lit(512.0)).cast("bigint").alias("cell_n"),
    ).agg(
        F.count(F.lit(1)).alias("n_obs"),
        (F.max(F.greatest("err_lat_m", "err_lon_m")) < F.lit(_TOL_M))
        .cast("int")
        .alias("closes_within_5mm"),
        davg("lat_back_r", "mean_lat_back"),
        davg("dlam_back_r", "mean_dlam_back"),
    )
