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

from ..functions.det import (
    dec_cast,
    dround,
    exact_double,
    sql_dec_cast,
    sql_dround,
    sql_exact_double,
)
from ..io import fanout, load
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
    (d2 first, station id as the unique tie-break).

    COVERAGE PRECONDITION: blocked NN is exact only while every point has
    some station within ±2 grid cells — on real deployments you size _C
    to the station density.  A fixture that stretches the point domain
    while pinning the station table (the 10x replica: user_id coordinates
    grow 10x, dims stay 1x) starves the probe and uncovered points DROP
    from the output (inner join) — the r9c 10x parity sweep measured
    1306/100000 answered there; the exhaustive oracle answers all.
    Expanding-ring fallback is the scale-correct extension if uncovered
    points must be answered rather than flagged.  Distance stays
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
        .repartition(fanout(spark), "event_id")
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


_EARTH_KM = 6371.0
_RADIUS_KM = 50.0  # search radius; 1-degree cells stay exact to |lat|<=60
_MIX2 = 40503


def _ll(key: str):
    """Deterministic lat/lon synthesis: |lat| <= 60 (keeps 1 deg of
    longitude >= 55.6 km > radius), lon in [-170, 170) (no antimeridian
    wrap, so cell adjacency is exact)."""
    k = F.col(key).cast("long")
    lat = (k * _MIX % 120000) / F.lit(1000.0) - F.lit(60.0)
    lon = (k * _MIX2 % 340000) / F.lit(1000.0) - F.lit(170.0)
    return lat, lon


def _ll_sql(key: str) -> tuple[str, str]:
    k = f"CAST({key} AS BIGINT)"
    return (
        f"({k} * {_MIX} % 120000) / 1000.0 - 60.0",
        f"({k} * {_MIX2} % 340000) / 1000.0 - 170.0",
    )


@register(
    "join_haversine_radius",
    oracle=f"""
        WITH c AS (
            SELECT CAST(c_custkey AS BIGINT) AS cid,
                   {_ll_sql('c_custkey')[0]} AS clat,
                   {_ll_sql('c_custkey')[1]} AS clon
            FROM customer
        ), s AS (
            SELECT CAST(s_suppkey AS BIGINT) AS sid,
                   {_ll_sql('s_suppkey')[0]} AS slat,
                   {_ll_sql('s_suppkey')[1]} AS slon
            FROM supplier
        ), pairs AS (
            SELECT cid, sid,
                   ROUND(2.0 * {_EARTH_KM!r} * ASIN(SQRT(
                       SIN(RADIANS(slat - clat) / 2.0)
                         * SIN(RADIANS(slat - clat) / 2.0)
                       + COS(RADIANS(clat)) * COS(RADIANS(slat))
                         * SIN(RADIANS(slon - clon) / 2.0)
                         * SIN(RADIANS(slon - clon) / 2.0))), 6) AS dist_km
            FROM c CROSS JOIN s
        )
        SELECT cid, sid, dist_km
        FROM pairs WHERE dist_km <= {_RADIUS_KM!r}
    """,
)
def join_haversine_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: geodesic radius join — every (customer, supplier) point pair
    within {_RADIUS_KM} km great-circle distance, via 1°-cell blocking:
    the small side replicates into its 3×3 cell neighborhood, candidates
    meet on a CELL EQUI-JOIN, and only co-blocked pairs pay the
    haversine.  Blocking is EXACT by construction: |lat| ≤ 60° keeps one
    longitude degree ≥ 55.6 km > R and one latitude degree ≥ 111 km > R,
    so a qualifying pair can differ by at most one cell per axis; lon
    stays inside [-170, 170) so no antimeridian wrap escapes adjacency.
    The oracle runs the BRUTE-FORCE cross product — blocked == exhaustive,
    the ``join_nearest_neighbor`` proof pattern.

    At scale: shuffle is points + 9× the small side on near-uniform cell
    keys — never |A|×|B|; the haversine is codegen'd libm, its distance
    ROUNDED 6 dp on both engines before the threshold compare so the
    cut never sits on a cross-engine ulp."""
    clat, clon = _ll("c_custkey")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("cid"),
        clat.alias("clat"),
        clon.alias("clon"),
        F.floor(clon).cast("long").alias("cx"),
        F.floor(clat).cast("long").alias("cy"),
    )
    slat, slon = _ll("s_suppkey")
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("sid"),
        slat.alias("slat"),
        slon.alias("slon"),
        F.floor(slon).cast("long").alias("sx"),
        F.floor(slat).cast("long").alias("sy"),
    )
    s9 = (
        s.select("*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dx"))
        .select("*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dy"))
        .select(
            "sid", "slat", "slon",
            (F.col("sx") + F.col("dx")).alias("cx"),
            (F.col("sy") + F.col("dy")).alias("cy"),
        )
    )
    half_dlat = F.radians(F.col("slat") - F.col("clat")) / 2.0
    half_dlon = F.radians(F.col("slon") - F.col("clon")) / 2.0
    dist = F.round(
        2.0
        * _EARTH_KM
        * F.asin(
            F.sqrt(
                F.sin(half_dlat) * F.sin(half_dlat)
                + F.cos(F.radians("clat"))
                * F.cos(F.radians("slat"))
                * F.sin(half_dlon) * F.sin(half_dlon)
            )
        ),
        6,
    )
    return (
        c.join(s9, ["cx", "cy"])
        .select("cid", "sid", dist.alias("dist_km"))
        .where(F.col("dist_km") <= _RADIUS_KM)
    )


_DBSCAN_MIN_PTS = 3  # neighbors (excluding self) for a core point


def _ll_dense(key: str):
    """Denser synthesis for the density keys: lat in [-5, 5), lon in
    [-10, 10) — mean spacing ~40 km at the fixture sizes, so 50 km
    neighborhoods are populated while 1° cells stay exact (lon degree
    ≥ 110.7 km at |lat| ≤ 5)."""
    k = F.col(key).cast("long")
    lat = (k * _MIX % 10000) / F.lit(1000.0) - F.lit(5.0)
    lon = (k * _MIX2 % 20000) / F.lit(1000.0) - F.lit(10.0)
    return lat, lon


def _ll_dense_sql(key: str) -> tuple[str, str]:
    k = f"CAST({key} AS BIGINT)"
    return (
        f"({k} * {_MIX} % 10000) / 1000.0 - 5.0",
        f"({k} * {_MIX2} % 20000) / 1000.0 - 10.0",
    )


@register(
    "geo_dbscan_core",
    oracle=f"""
        WITH c AS (
            SELECT CAST(c_custkey AS BIGINT) AS cid,
                   {_ll_dense_sql('c_custkey')[0]} AS lat,
                   {_ll_dense_sql('c_custkey')[1]} AS lon
            FROM customer
        ), pairs AS (
            SELECT a.cid AS cid,
                   ROUND(2.0 * {_EARTH_KM!r} * ASIN(SQRT(
                       SIN(RADIANS(b.lat - a.lat) / 2.0)
                         * SIN(RADIANS(b.lat - a.lat) / 2.0)
                       + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
                         * SIN(RADIANS(b.lon - a.lon) / 2.0)
                         * SIN(RADIANS(b.lon - a.lon) / 2.0))), 6) AS d
            FROM c a CROSS JOIN c b
            WHERE a.cid <> b.cid
        ), deg AS (
            SELECT cid, COUNT(CASE WHEN d <= {_RADIUS_KM!r} THEN 1 END)
                       AS n_neighbors
            FROM pairs GROUP BY cid
        )
        SELECT cid, n_neighbors,
               CAST(n_neighbors >= {_DBSCAN_MIN_PTS} AS INTEGER) AS is_core
        FROM deg WHERE n_neighbors > 0
    """,
)
def geo_dbscan_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12+: DBSCAN core-point detection — each point's ε-neighborhood
    count ({_RADIUS_KM} km haversine) and the ≥{_DBSCAN_MIN_PTS}-neighbor
    core flag, the first (and only shuffling) stage of density
    clustering: cores + ε-edges feed the same min-label propagation
    ``dedup_clusters`` already runs, so this key completes the DBSCAN
    decomposition into verified relational steps.

    Same exact 3×3 cell blocking as ``join_haversine_radius`` (|lat| ≤
    60° keeps both axes' degree > ε): the self-join candidates meet on a
    CELL EQUI-JOIN and only co-blocked pairs pay the haversine; the
    neighbor count is one grouped agg.  Oracle = brute-force all-pairs:
    blocked == exhaustive.  Points with zero in-radius neighbors drop on
    both sides (noise tier)."""
    lat, lon = _ll_dense("c_custkey")
    # 0.5-degree cells: still >= eps on both axes at |lat| <= 5
    # (0.5 deg lon = 55.4 km, 0.5 deg lat = 55.6 km, eps = 50 km), and
    # quartering cell area quarters the candidate-pair volume
    pts = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("cid"),
        lat.alias("lat"),
        lon.alias("lon"),
        F.floor(lon * 2).cast("long").alias("cx"),
        F.floor(lat * 2).cast("long").alias("cy"),
    )
    probe = pts.select(
        F.col("cid").alias("bid"),
        F.col("lat").alias("blat"),
        F.col("lon").alias("blon"),
        "cx",
        "cy",
    )
    b9 = (
        probe.select("*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dx"))
        .select("*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dy"))
        .select(
            "bid", "blat", "blon",
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    half_dlat = F.radians(F.col("blat") - F.col("lat")) / 2.0
    half_dlon = F.radians(F.col("blon") - F.col("lon")) / 2.0
    d = F.round(
        2.0
        * _EARTH_KM
        * F.asin(
            F.sqrt(
                F.sin(half_dlat) * F.sin(half_dlat)
                + F.cos(F.radians("lat"))
                * F.cos(F.radians("blat"))
                * F.sin(half_dlon) * F.sin(half_dlon)
            )
        ),
        6,
    )
    deg = (
        pts.join(b9, ["cx", "cy"])
        .where(F.col("cid") != F.col("bid"))
        .groupBy("cid")
        .agg(F.count(F.when(d <= _RADIUS_KM, 1)).alias("n_neighbors"))
    )
    return deg.where(F.col("n_neighbors") > 0).select(
        "cid",
        "n_neighbors",
        (F.col("n_neighbors") >= _DBSCAN_MIN_PTS).cast("int").alias("is_core"),
    )


_IDW_CELL = 10.0  # degrees; 10-deg of lon >= 556 km at |lat|<=60 >= radius
_IDW_RADIUS_KM = 500.0


@register(
    "geo_idw_interpolate",
    oracle=f"""
        WITH c AS (
            SELECT CAST(c_custkey AS BIGINT) AS cid,
                   {_ll_sql('c_custkey')[0]} AS clat,
                   {_ll_sql('c_custkey')[1]} AS clon
            FROM customer
        ), s AS (
            SELECT s_acctbal AS v,
                   {_ll_sql('s_suppkey')[0]} AS slat,
                   {_ll_sql('s_suppkey')[1]} AS slon
            FROM supplier
        ), pairs AS (
            SELECT cid, v,
                   ROUND(2.0 * {_EARTH_KM!r} * ASIN(SQRT(
                       SIN(RADIANS(slat - clat) / 2.0)
                         * SIN(RADIANS(slat - clat) / 2.0)
                       + COS(RADIANS(clat)) * COS(RADIANS(slat))
                         * SIN(RADIANS(slon - clon) / 2.0)
                         * SIN(RADIANS(slon - clon) / 2.0))), 6) AS d
            FROM c CROSS JOIN s
        ), wgt AS (
            SELECT cid, v, d,
                   CASE WHEN d > 0.0
                        THEN CAST(1000000.0 AS DOUBLE) / (d * d) END AS w
            FROM pairs WHERE d <= {_IDW_RADIUS_KM!r}
        )
        SELECT cid,
               CAST(COUNT(*) AS BIGINT) AS n_stations,
               CASE WHEN MAX(CAST(d = 0.0 AS INTEGER)) = 1
                    THEN MIN(CASE WHEN d = 0.0 THEN v END)
                    ELSE {sql_dround(
                        "(" + sql_exact_double("SUM(" + sql_dec_cast("w * v") + ")")
                        + ") / ("
                        + sql_exact_double("SUM(" + sql_dec_cast("w") + ")") + ")"
                    )} END AS idw_value
        FROM wgt GROUP BY cid
    """,
)
def geo_idw_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-distance-weighted interpolation — estimate the supplier
    field (acctbal) at every customer location from stations within
    {_IDW_RADIUS_KM} km: the gap-filling step of station-based EO
    ancillary layers (rain gauges, AOT, surface pressure).
    v̂(t) = Σ wᵢvᵢ / Σ wᵢ with w = 1/d²; a COINCIDENT station (d = 0)
    short-circuits to its exact value (the standard IDW singularity
    rule; ties take the smallest value).

    Same exact cell blocking as ``join_haversine_radius`` scaled up:
    10° cells keep one cell ≥ 556 km ≥ R at |lat| ≤ 60, so 3×3
    adjacency is exhaustive — the brute-force oracle is the proof.
    Distances round 6 dp before the radius cut and the weights, both
    weighted sums ride the decimal path, the ratio rounds 6 dp.
    Shuffle is points + 9× stations on near-uniform cell keys; the
    interpolate is one hash agg per target."""
    clat, clon = _ll("c_custkey")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("cid"),
        clat.alias("clat"),
        clon.alias("clon"),
        F.floor(clon / _IDW_CELL).cast("long").alias("cx"),
        F.floor(clat / _IDW_CELL).cast("long").alias("cy"),
    )
    slat, slon = _ll("s_suppkey")
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_acctbal").alias("v"),
        slat.alias("slat"),
        slon.alias("slon"),
        F.floor(slon / _IDW_CELL).cast("long").alias("sx"),
        F.floor(slat / _IDW_CELL).cast("long").alias("sy"),
    )
    s9 = (
        s.select("*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dx"))
        .select("*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dy"))
        .select(
            "v", "slat", "slon",
            (F.col("sx") + F.col("dx")).alias("cx"),
            (F.col("sy") + F.col("dy")).alias("cy"),
        )
    )
    half_dlat = F.radians(F.col("slat") - F.col("clat")) / 2.0
    half_dlon = F.radians(F.col("slon") - F.col("clon")) / 2.0
    d = F.round(
        F.lit(2.0)
        * _EARTH_KM
        * F.asin(
            F.sqrt(
                F.sin(half_dlat) * F.sin(half_dlat)
                + F.cos(F.radians("clat"))
                * F.cos(F.radians("slat"))
                * F.sin(half_dlon)
                * F.sin(half_dlon)
            )
        ),
        6,
    )
    wgt = (
        c.join(F.broadcast(s9), ["cx", "cy"])
        .select("cid", "v", d.alias("d"))
        .where(F.col("d") <= _IDW_RADIUS_KM)
        .select(
            "cid",
            "v",
            "d",
            # scaled 1e6/d^2 (scale cancels in the ratio): keeps the
            # 6 dp-rounded decimal sums at ~7 significant digits even for
            # far stations instead of collapsing 1/d^2 ~ 4e-6 onto the grid
            F.when(
                F.col("d") > 0.0, F.lit(1000000.0) / (F.col("d") * F.col("d"))
            ).alias("w"),
        )
    )
    return wgt.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_stations"),
        F.when(
            F.max((F.col("d") == 0.0).cast("int")) == 1,
            F.min(F.when(F.col("d") == 0.0, F.col("v"))),
        )
        .otherwise(
            dround(
                exact_double(F.sum(dec_cast(F.col("w") * F.col("v"))))
                / exact_double(F.sum(dec_cast("w")))
            )
        )
        .alias("idw_value"),
    )
