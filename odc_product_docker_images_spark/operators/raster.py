"""Focal (neighborhood) raster ops (SURVEY.md §2.2/§2.4 extension).

Reference analog: the kernel/convolution passes EO pipelines run after
compositing — focal mean smoothing, morphological cleanup of water masks
(``odc-algo``'s ``mask_cleanup`` dilation/erosion), speckle filtering.
``product_sar_water`` already does a 1-D window-frame speckle mean; this
module is the TRUE 2-D neighborhood form.

Spark-first shape for a sparse raster laid out as (cell_x, cell_y, value)
rows: a convolution is an EXPLODE-SHIFT-REGROUP — each cell scatters its
value to the 9 (dx, dy) neighbor positions it contributes to (``explode``
over a constant offset array, pure codegen fan-out), then one hash
aggregation per target cell collects the neighborhood mean.  Shuffle
volume is kernel_size × raster rows — linear, skew-free (cell keys are
near-uniform), and the whole fan-out stays in whole-stage codegen; no UDF,
no driver-side stencil loop.  At 100 TB the same plan holds: the scatter
is map-side, the single Exchange carries 9×rows, and tiling the grid into
stored buckets would co-locate it entirely (the geomedian-bucketed
pattern).  A windowed form over a dense row-major raster would need a 2-D
frame Spark lacks; the scatter-gather form needs nothing exotic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.det import (
    davg,
    dec_cast,
    dround,
    dsum,
    exact_double,
    sql_davg,
    sql_dec_cast,
    sql_dround,
    sql_dsum,
    sql_exact_double,
)
from ..io import load
from ..registry import register

# Grid: 20 × 11 cells over (value, user_id) — ~45 events/cell at sf0.01.
_CX, _CY = 25.0, 15.0


def _raster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin events into the cell grid: the composite the focal pass reads."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            F.floor(F.col("value") / _CX).cast("long").alias("cell_x"),
            F.floor(F.col("user_id") / _CY).cast("long").alias("cell_y"),
            F.col("value"),
        )
        .groupBy("cell_x", "cell_y")
        .agg(davg("value", "v"))
    )


_SQL_RASTER = f"""
        SELECT CAST(FLOOR(value / {_CX!r}) AS BIGINT) AS cell_x,
               CAST(FLOOR(user_id / {_CY!r}) AS BIGINT) AS cell_y,
               {sql_davg("value", "v")}
        FROM events GROUP BY 1, 2
"""


@register(
    "raster_focal_mean",
    oracle=f"""
        WITH raster AS ({_SQL_RASTER}),
        scatter AS (
            SELECT r.cell_x + dx.o AS tx, r.cell_y + dy.o AS ty, r.v,
                   CASE WHEN dx.o = 0 AND dy.o = 0 THEN 1 ELSE 0 END AS self
            FROM raster r
            CROSS JOIN (VALUES (-1), (0), (1)) dx(o)
            CROSS JOIN (VALUES (-1), (0), (1)) dy(o)
        )
        SELECT tx AS cell_x, ty AS cell_y,
               {sql_davg("v", "focal_mean")},
               COUNT(*) AS n_nbrs
        FROM scatter
        GROUP BY tx, ty
        HAVING SUM(self) >= 1
    """,
)
def raster_focal_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D focal mean (3×3 kernel) over the binned composite, as
    explode-shift-regroup.  Each cell scatters to its 9 neighbor targets;
    one hash agg per target collects mean + support.  Edge/sparse handling
    is the standard focal convention: the mean runs over the neighbors
    that EXIST (n_nbrs ≤ 9).  Targets that aren't real raster cells (the
    one-cell halo the scatter invents around the grid edge) are dropped
    WITHOUT a join-back: a cell is real iff its own (0,0) contribution
    arrived, so ``HAVING sum(self) ≥ 1`` filters inside the same
    aggregate — the plan is scan → scatter → ONE Exchange → agg, pinned in
    tests/test_plans.py."""
    r = _raster(spark, sf_dir)
    off = F.array(F.lit(-1), F.lit(0), F.lit(1))
    scattered = r.select(
        "v",
        F.explode(off).alias("dx"),
        F.col("cell_x"),
        F.col("cell_y"),
    ).select(
        "v",
        "dx",
        F.explode(off).alias("dy"),
        "cell_x",
        "cell_y",
    ).select(
        (F.col("cell_x") + F.col("dx")).alias("tx"),
        (F.col("cell_y") + F.col("dy")).alias("ty"),
        "v",
        ((F.col("dx") == 0) & (F.col("dy") == 0)).cast("int").alias("self"),
    )
    return (
        scattered.groupBy(F.col("tx").alias("cell_x"), F.col("ty").alias("cell_y"))
        .agg(
            davg("v", "focal_mean"),
            F.count(F.lit(1)).alias("n_nbrs"),
            F.sum("self").alias("_self"),
        )
        .where(F.col("_self") >= 1)
        .drop("_self")
    )


@register(
    "raster_morph_close",
    oracle=f"""
        WITH raster AS ({_SQL_RASTER}),
        mask AS (
            SELECT cell_x, cell_y, CASE WHEN v >= 245.0 THEN 1 ELSE 0 END AS wet
            FROM raster
        ),
        dilate AS (
            SELECT m.cell_x + dx.o AS tx, m.cell_y + dy.o AS ty,
                   MAX(m.wet) AS wet_d,
                   MAX(CASE WHEN dx.o = 0 AND dy.o = 0 THEN 1 ELSE 0 END) AS real_cell
            FROM mask m
            CROSS JOIN (VALUES (-1), (0), (1)) dx(o)
            CROSS JOIN (VALUES (-1), (0), (1)) dy(o)
            GROUP BY 1, 2
        ),
        erode AS (
            SELECT d.tx + dx.o AS ex, d.ty + dy.o AS ey,
                   MIN(d.wet_d) AS wet_closed,
                   MAX(CASE WHEN dx.o = 0 AND dy.o = 0 THEN d.real_cell ELSE 0 END)
                       AS real_cell
            FROM dilate d
            CROSS JOIN (VALUES (-1), (0), (1)) dx(o)
            CROSS JOIN (VALUES (-1), (0), (1)) dy(o)
            GROUP BY 1, 2
        )
        SELECT ex AS cell_x, ey AS cell_y, wet_closed
        FROM erode WHERE real_cell = 1
    """,
)
def raster_morph_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morphological CLOSE (dilate-then-erode, 3×3 structuring element) on a
    thresholded water mask — the reference's ``mask_cleanup`` pass that
    fills pinhole gaps in classified rasters.  Both stages are the same
    scatter-regroup as the focal mean with MAX/MIN in place of the mean
    (dilation = neighborhood max, erosion = neighborhood min over the
    dilated mask).  The erode stage evaluates the min over the FULL dilated
    field (which covers every neighbor of every real cell, so no
    missing-neighbor bias), then keeps only real raster cells — carried as
    a flag through both stages, again no join-back.  Two linear shuffles
    total; morphology never touches Python."""
    r = _raster(spark, sf_dir)
    off = F.array(F.lit(-1), F.lit(0), F.lit(1))

    def scatter(df: DataFrame, xc: str, yc: str, cols: list) -> DataFrame:
        return (
            df.select(*cols, xc, yc, F.explode(off).alias("dx"))
            .select(*cols, xc, yc, "dx", F.explode(off).alias("dy"))
            .select(
                (F.col(xc) + F.col("dx")).alias("tx"),
                (F.col(yc) + F.col("dy")).alias("ty"),
                ((F.col("dx") == 0) & (F.col("dy") == 0)).cast("int").alias("at_center"),
                *cols,
            )
        )

    mask = r.select(
        "cell_x", "cell_y", (F.col("v") >= 245.0).cast("int").alias("wet")
    )
    dilate = (
        scatter(mask, "cell_x", "cell_y", ["wet"])
        .groupBy("tx", "ty")
        .agg(
            F.max("wet").alias("wet_d"),
            F.max("at_center").alias("real_cell"),
        )
    )
    erode = (
        scatter(dilate, "tx", "ty", ["wet_d", "real_cell"])
        .withColumn("rc", F.when(F.col("at_center") == 1, F.col("real_cell")).otherwise(F.lit(0)))
        .groupBy(F.col("tx").alias("cell_x"), F.col("ty").alias("cell_y"))
        .agg(F.min("wet_d").alias("wet_closed"), F.max("rc").alias("real_cell"))
    )
    return erode.where(F.col("real_cell") == 1).select("cell_x", "cell_y", "wet_closed")


# Conservative-resample grids: source 25x15 cells -> target 40x24 cells
# (non-integer 1.6x scale, so cells genuinely SPLIT across targets).
_TX, _TY = 40.0, 24.0


@register(
    "regrid_conservative",
    oracle=f"""
        WITH raster AS ({_SQL_RASTER}),
        fx AS (
            SELECT v, cell_x, cell_y,
                   UNNEST(RANGE(
                       CAST(FLOOR(cell_x * {_CX!r} / {_TX!r}) AS BIGINT),
                       CAST(FLOOR(((cell_x + 1) * {_CX!r} - 1e-9) / {_TX!r})
                            AS BIGINT) + 1)) AS tcell_x
            FROM raster
        ), fy AS (
            SELECT v, cell_x, cell_y, tcell_x,
                   UNNEST(RANGE(
                       CAST(FLOOR(cell_y * {_CY!r} / {_TY!r}) AS BIGINT),
                       CAST(FLOOR(((cell_y + 1) * {_CY!r} - 1e-9) / {_TY!r})
                            AS BIGINT) + 1)) AS tcell_y
            FROM fx
        ), frags AS (
            SELECT v, tcell_x, tcell_y,
                   (LEAST((cell_x + 1) * {_CX!r}, (tcell_x + 1) * {_TX!r})
                    - GREATEST(cell_x * {_CX!r}, tcell_x * {_TX!r}))
                 * (LEAST((cell_y + 1) * {_CY!r}, (tcell_y + 1) * {_TY!r})
                    - GREATEST(cell_y * {_CY!r}, tcell_y * {_TY!r})) AS w
            FROM fy
        )
        SELECT tcell_x, tcell_y,
               {sql_dsum("v * w", "wsum")},
               {sql_dsum("w", "area")},
               COUNT(*) AS n_frags
        FROM frags
        GROUP BY tcell_x, tcell_y
    """,
)
def regrid_conservative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6++: CONSERVATIVE (area-weighted) resampling — the third classic
    regrid mode next to nearest (`regrid_bin`) and bilinear
    (`regrid_bilinear`), and the one flux-preserving science products
    require: each source cell contributes to every overlapping target
    cell in proportion to the EXACT overlap area, so the target grid
    integrates to the same total as the source.  Spark-first shape: each
    source cell explodes to the ≤4 target cells its box intersects
    (``sequence`` over the covered target-id range — the zonal-stats
    bbox-explode pattern), the overlap weight is pure
    ``least/greatest`` arithmetic (grid bounds are exact .0 doubles, so
    the weights are binary-exact on both engines), and one hash agg per
    target collects Σv·w and Σw.  Two linear shuffles (bin, regather);
    the weighted mean is the caller's one exact division of the two
    emitted deterministic sums (`wsum/area`), left unrounded here so the
    oracle pins the conservative invariant itself."""
    r = _raster(spark, sf_dir)
    sx0, sy0 = F.col("cell_x") * _CX, F.col("cell_y") * _CY
    tx_lo = F.floor(sx0 / _TX).cast("long")
    tx_hi = F.floor(((F.col("cell_x") + 1) * _CX - F.lit(1e-9)) / _TX).cast("long")
    ty_lo = F.floor(sy0 / _TY).cast("long")
    ty_hi = F.floor(((F.col("cell_y") + 1) * _CY - F.lit(1e-9)) / _TY).cast("long")
    frags = (
        r.select(
            "v",
            "cell_x",
            "cell_y",
            F.explode(F.sequence(tx_lo, tx_hi)).alias("tcell_x"),
            ty_lo.alias("_ty_lo"),
            ty_hi.alias("_ty_hi"),
        )
        .select(
            "v",
            "cell_x",
            "cell_y",
            "tcell_x",
            F.explode(F.sequence(F.col("_ty_lo"), F.col("_ty_hi"))).alias("tcell_y"),
        )
        .select(
            "v",
            "tcell_x",
            "tcell_y",
            (
                (
                    F.least((F.col("cell_x") + 1) * _CX, (F.col("tcell_x") + 1) * _TX)
                    - F.greatest(F.col("cell_x") * _CX, F.col("tcell_x") * _TX)
                )
                * (
                    F.least((F.col("cell_y") + 1) * _CY, (F.col("tcell_y") + 1) * _TY)
                    - F.greatest(F.col("cell_y") * _CY, F.col("tcell_y") * _TY)
                )
            ).alias("w"),
        )
    )
    from ..functions.det import dsum

    return frags.groupBy("tcell_x", "tcell_y").agg(
        dsum(F.col("v") * F.col("w"), "wsum"),
        dsum("w", "area"),
        F.count(F.lit(1)).alias("n_frags"),
    )


_RAD2DEG_R = 57.29577951308232


@register(
    "raster_slope_aspect",
    oracle=f"""
        WITH raster AS ({_SQL_RASTER}),
        scatter AS (
            SELECT r.cell_x + dx.o AS tx, r.cell_y + dy.o AS ty, r.v,
                   (-dx.o) * (2 - ABS(dy.o)) AS wx,
                   (-dy.o) * (2 - ABS(dx.o)) AS wy
            FROM raster r
            CROSS JOIN (VALUES (-1), (0), (1)) dx(o)
            CROSS JOIN (VALUES (-1), (0), (1)) dy(o)
        ), grads AS (
            SELECT tx AS cell_x, ty AS cell_y,
                   {sql_dsum("v * wx", "gx8")},
                   {sql_dsum("v * wy", "gy8")},
                   COUNT(*) AS support
            FROM scatter GROUP BY tx, ty
        )
        SELECT cell_x, cell_y,
               {sql_dround(
                   "ATAN(SQRT(gx8 * gx8 + gy8 * gy8)"
                   " / CAST(8.0 AS DOUBLE))"
                   f" * CAST({_RAD2DEG_R!r} AS DOUBLE)"
               )} AS slope_deg,
               CASE WHEN gx8 = CAST(0.0 AS DOUBLE)
                     AND gy8 = CAST(0.0 AS DOUBLE)
                    THEN CAST(-1.0 AS DOUBLE)
                    ELSE {sql_dround(
                        "ATAN2(gy8, -gx8)"
                        f" * CAST({_RAD2DEG_R!r} AS DOUBLE)"
                    )} END AS aspect_deg
        FROM grads WHERE support = 9
    """,
)
def raster_slope_aspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terrain slope/aspect by Horn's 3×3 method over the binned
    composite (the DEM-derivative pass of every EO terrain product).
    Same explode-shift-regroup as the focal mean, but each source cell
    carries WEIGHTED contributions: seen from target t, a source at
    relative offset (rx, ry) = −(dx, dy) contributes v·rx·(2−|ry|) to
    the x-gradient and v·ry·(2−|rx|) to the y-gradient — exactly Horn's
    (1,2,1) stencils, as two decimal-path sums in ONE hash aggregate.
    Interior-only (support = 9) so the stencil is never truncated.
    Determinism: v is the 6 dp composite, weights are small ints, the
    gradient sums ride the decimal path, and the atan/atan2/sqrt finals
    round 6 dp; flat cells (both gradients exactly 0) pin aspect to −1
    instead of feeding atan2's ±0 branch.  One corpus agg + one 9×
    scatter shuffle — the focal-mean scale shape."""
    r = _raster(spark, sf_dir)
    off = F.array(F.lit(-1), F.lit(0), F.lit(1))
    scattered = (
        r.select("v", "cell_x", "cell_y", F.explode(off).alias("dx"))
        .select("v", "cell_x", "cell_y", "dx", F.explode(off).alias("dy"))
        .select(
            (F.col("cell_x") + F.col("dx")).alias("tx"),
            (F.col("cell_y") + F.col("dy")).alias("ty"),
            (F.col("v") * (-F.col("dx")) * (2 - F.abs("dy"))).alias("vwx"),
            (F.col("v") * (-F.col("dy")) * (2 - F.abs("dx"))).alias("vwy"),
        )
    )
    grads = scattered.groupBy(
        F.col("tx").alias("cell_x"), F.col("ty").alias("cell_y")
    ).agg(
        dsum("vwx", "gx8"),
        dsum("vwy", "gy8"),
        F.count(F.lit(1)).alias("support"),
    )
    return grads.where(F.col("support") == 9).select(
        "cell_x",
        "cell_y",
        dround(
            F.atan(
                F.sqrt(F.col("gx8") * F.col("gx8") + F.col("gy8") * F.col("gy8"))
                / F.lit(8.0)
            )
            * F.lit(_RAD2DEG_R)
        ).alias("slope_deg"),
        F.when(
            (F.col("gx8") == 0.0) & (F.col("gy8") == 0.0), F.lit(-1.0)
        )
        .otherwise(dround(F.atan2(F.col("gy8"), -F.col("gx8")) * F.lit(_RAD2DEG_R)))
        .alias("aspect_deg"),
    )


@register(
    "agg_medoid_composite",
    oracle=f"""
        WITH cells AS (
            SELECT CAST(FLOOR(value / {_CX!r}) AS BIGINT) AS cell_x,
                   CAST(FLOOR(user_id / {_CY!r}) AS BIGINT) AS cell_y,
                   value, event_id
            FROM events
        ), ranked AS (
            SELECT cell_x, cell_y, value,
                   ROW_NUMBER() OVER w AS r,
                   {sql_exact_double(
                       "SUM(" + sql_dec_cast("value") + ") OVER w"
                   )} AS pre,
                   {sql_exact_double(
                       "SUM(" + sql_dec_cast("value") + ") OVER "
                       "(PARTITION BY cell_x, cell_y)"
                   )} AS tot,
                   COUNT(*) OVER (PARTITION BY cell_x, cell_y) AS n
            FROM cells
            WINDOW w AS (PARTITION BY cell_x, cell_y ORDER BY value, event_id
                         ROWS UNBOUNDED PRECEDING)
        ), costs AS (
            SELECT cell_x, cell_y, value, n,
                   {sql_dround(
                       "(r * value - pre) + ((tot - pre) - (n - r) * value)"
                   )} AS cost,
                   MIN({sql_dround(
                       "(r * value - pre) + ((tot - pre) - (n - r) * value)"
                   )}) OVER (PARTITION BY cell_x, cell_y) AS min_cost
            FROM ranked
        )
        SELECT cell_x, cell_y,
               CAST(MAX(n) AS BIGINT) AS n,
               MIN(value) AS medoid_value,
               MIN(min_cost) AS cost
        FROM costs
        WHERE cost = min_cost
        GROUP BY cell_x, cell_y
    """,
)
def agg_medoid_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Medoid composite per grid cell — the pixel that minimizes total
    absolute deviation to its cell-mates: the standard Landsat
    best-pixel compositing alternative to the geomedian that returns an
    OBSERVED value instead of a synthetic one.  The naive form is an
    O(n²) per-cell self-join; here Σ|vᵢ−vⱼ| collapses to the sorted
    prefix-sum identity cost(i) = (r·vᵢ − preᵢ) + ((tot − preᵢ) −
    (n−r)·vᵢ), so EVERYTHING is windows over one (cell) partitioning —
    one Exchange, no join, O(n log n).  Determinism: prefix/total sums
    ride the decimal path (DuckDB's segment-tree window summation would
    otherwise re-associate float adds), costs round 6 dp, ties resolve
    to the smallest value; argmin is a same-window MIN + filter, not a
    join-back."""
    ev = load(spark, sf_dir, "events")
    cells = ev.select(
        F.floor(F.col("value") / _CX).cast("long").alias("cell_x"),
        F.floor(F.col("user_id") / _CY).cast("long").alias("cell_y"),
        "value",
        "event_id",
    )
    part = ["cell_x", "cell_y"]
    w_ord = (
        Window.partitionBy(*part)
        .orderBy("value", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*part)
    ranked = cells.select(
        *part,
        "value",
        F.row_number().over(Window.partitionBy(*part).orderBy("value", "event_id")).alias("r"),
        exact_double(F.sum(dec_cast("value")).over(w_ord)).alias("pre"),
        exact_double(F.sum(dec_cast("value")).over(w_all)).alias("tot"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    cost = dround(
        (F.col("r") * F.col("value") - F.col("pre"))
        + ((F.col("tot") - F.col("pre")) - (F.col("n") - F.col("r")) * F.col("value"))
    )
    costs = ranked.select(
        *part,
        "value",
        "n",
        cost.alias("cost"),
        F.min(cost).over(w_all).alias("min_cost"),
    )
    return (
        costs.where(F.col("cost") == F.col("min_cost"))
        .groupBy(*part)
        .agg(
            F.max("n").cast("long").alias("n"),
            F.min("value").alias("medoid_value"),
            F.min("min_cost").alias("cost"),
        )
    )


# D8 neighbor codes: 0=E 1=SE 2=S 3=SW 4=W 5=NW 6=N 7=NE (x east, y north)
_SQRT2 = 1.4142135623730951


@register(
    "raster_flow_direction",
    oracle=f"""
        WITH raster AS ({_SQL_RASTER}),
        scatter AS (
            SELECT r.cell_x + dx.o AS tx, r.cell_y + dy.o AS ty, r.v,
                   -dx.o AS rx, -dy.o AS ry,
                   CASE WHEN dx.o = 0 AND dy.o = 0 THEN 1 ELSE 0 END AS self
            FROM raster r
            CROSS JOIN (VALUES (-1), (0), (1)) dx(o)
            CROSS JOIN (VALUES (-1), (0), (1)) dy(o)
        ), centered AS (
            SELECT tx, ty, v, rx, ry, self,
                   MAX(CASE WHEN self = 1 THEN v END)
                       OVER (PARTITION BY tx, ty) AS v0,
                   COUNT(*) OVER (PARTITION BY tx, ty) AS support
            FROM scatter
        ), drops AS (
            SELECT tx, ty, support,
                   CASE WHEN rx = 1 AND ry = 0 THEN 0
                        WHEN rx = 1 AND ry = -1 THEN 1
                        WHEN rx = 0 AND ry = -1 THEN 2
                        WHEN rx = -1 AND ry = -1 THEN 3
                        WHEN rx = -1 AND ry = 0 THEN 4
                        WHEN rx = -1 AND ry = 1 THEN 5
                        WHEN rx = 0 AND ry = 1 THEN 6
                        ELSE 7 END AS code,
                   {sql_dround(
                       "(v0 - v) / CASE WHEN rx * ry = 0"
                       f" THEN CAST(1.0 AS DOUBLE)"
                       f" ELSE CAST({_SQRT2!r} AS DOUBLE) END"
                   )} AS drop
            FROM centered WHERE self = 0 AND v0 IS NOT NULL
        ), ranked AS (
            SELECT tx, ty, support, code, drop,
                   ROW_NUMBER() OVER (PARTITION BY tx, ty
                                      ORDER BY drop DESC, code ASC) AS rn
            FROM drops
        )
        SELECT tx AS cell_x, ty AS cell_y,
               CASE WHEN drop > 0.0 THEN code ELSE -1 END AS dir_code,
               CASE WHEN drop > 0.0 THEN drop
                    ELSE CAST(0.0 AS DOUBLE) END AS max_drop
        FROM ranked WHERE rn = 1 AND support = 9
    """,
)
def raster_flow_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 flow direction over the binned composite — each interior cell
    points at its steepest-descent neighbor (drop/distance, diagonals
    pay √2), the first derivative of every hydrology product (flow
    accumulation, watershed delineation).  Pits/flats (no positive
    drop) code −1, the standard sink convention.

    Same scatter shape as the focal/Horn keys, but the comparison
    against the CENTER value rides a conditional window MAX over the
    target partitioning (v0 = the self-contribution), so drops, the
    argmax (row_number over drop DESC with the code tie-break), and the
    support gate all share ONE (tx, ty) clustering — scatter Exchange,
    windows, filter; no join-back, no second scan.  Drops round 6 dp
    before ranking so the winner can't flip on a cross-engine ulp."""
    r = _raster(spark, sf_dir)
    off = F.array(F.lit(-1), F.lit(0), F.lit(1))
    scattered = (
        r.select("v", "cell_x", "cell_y", F.explode(off).alias("dx"))
        .select("v", "cell_x", "cell_y", "dx", F.explode(off).alias("dy"))
        .select(
            (F.col("cell_x") + F.col("dx")).alias("tx"),
            (F.col("cell_y") + F.col("dy")).alias("ty"),
            "v",
            (-F.col("dx")).alias("rx"),
            (-F.col("dy")).alias("ry"),
            ((F.col("dx") == 0) & (F.col("dy") == 0)).cast("int").alias("self"),
        )
    )
    w_t = Window.partitionBy("tx", "ty")
    centered = scattered.select(
        "tx",
        "ty",
        "v",
        "rx",
        "ry",
        "self",
        F.max(F.when(F.col("self") == 1, F.col("v"))).over(w_t).alias("v0"),
        F.count(F.lit(1)).over(w_t).alias("support"),
    )
    code = (
        F.when((F.col("rx") == 1) & (F.col("ry") == 0), 0)
        .when((F.col("rx") == 1) & (F.col("ry") == -1), 1)
        .when((F.col("rx") == 0) & (F.col("ry") == -1), 2)
        .when((F.col("rx") == -1) & (F.col("ry") == -1), 3)
        .when((F.col("rx") == -1) & (F.col("ry") == 0), 4)
        .when((F.col("rx") == -1) & (F.col("ry") == 1), 5)
        .when((F.col("rx") == 0) & (F.col("ry") == 1), 6)
        .otherwise(7)
    )
    dist = F.when(F.col("rx") * F.col("ry") == 0, F.lit(1.0)).otherwise(
        F.lit(_SQRT2)
    )
    drops = centered.where(
        (F.col("self") == 0) & F.col("v0").isNotNull()
    ).select(
        "tx",
        "ty",
        "support",
        code.alias("code"),
        dround((F.col("v0") - F.col("v")) / dist).alias("drop"),
    )
    ranked = drops.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("tx", "ty").orderBy(
                F.col("drop").desc(), F.col("code").asc()
            )
        ),
    )
    return ranked.where((F.col("rn") == 1) & (F.col("support") == 9)).select(
        F.col("tx").alias("cell_x"),
        F.col("ty").alias("cell_y"),
        F.when(F.col("drop") > 0.0, F.col("code")).otherwise(F.lit(-1)).alias(
            "dir_code"
        ),
        F.when(F.col("drop") > 0.0, F.col("drop"))
        .otherwise(F.lit(0.0))
        .alias("max_drop"),
    )


_HS_ZENITH = 0.7853981633974483  # 45° sun altitude
_HS_AZIMUTH = 5.497787143782138  # 315° (NW sun), radians


@register(
    "raster_hillshade",
    oracle=f"""
        WITH raster AS ({_SQL_RASTER}),
        scatter AS (
            SELECT r.cell_x + dx.o AS tx, r.cell_y + dy.o AS ty, r.v,
                   (-dx.o) * (2 - ABS(dy.o)) AS wx,
                   (-dy.o) * (2 - ABS(dx.o)) AS wy
            FROM raster r
            CROSS JOIN (VALUES (-1), (0), (1)) dx(o)
            CROSS JOIN (VALUES (-1), (0), (1)) dy(o)
        ), grads AS (
            SELECT tx AS cell_x, ty AS cell_y,
                   {sql_dsum("v * wx", "gx8")},
                   {sql_dsum("v * wy", "gy8")},
                   COUNT(*) AS support
            FROM scatter GROUP BY tx, ty
        )
        SELECT cell_x, cell_y,
               {sql_dround(
                   f"GREATEST(CAST(0.0 AS DOUBLE),"
                   f" COS(CAST({_HS_ZENITH!r} AS DOUBLE))"
                   " * COS(ATAN(SQRT(gx8 * gx8 + gy8 * gy8)"
                   " / CAST(8.0 AS DOUBLE)))"
                   f" + SIN(CAST({_HS_ZENITH!r} AS DOUBLE))"
                   " * SIN(ATAN(SQRT(gx8 * gx8 + gy8 * gy8)"
                   " / CAST(8.0 AS DOUBLE)))"
                   f" * COS(CAST({_HS_AZIMUTH!r} AS DOUBLE)"
                   " - ATAN2(gy8, -gx8)))"
               )} AS shade
        FROM grads WHERE support = 9
    """,
)
def raster_hillshade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytical hillshade (45° sun, NW azimuth) from the same Horn
    gradients as ``raster_slope_aspect`` — the rendering pass of every
    terrain product: shade = cos z·cos s + sin z·sin s·cos(az − aspect),
    clamped at 0 (self-shadowed faces).  Flat cells reduce to cos z
    exactly (the sin s = 0 term kills the aspect factor, so atan2's ±0
    branch can't leak).  One scatter + one hash agg, codegen'd libm,
    final rounds 6 dp."""
    r = _raster(spark, sf_dir)
    off = F.array(F.lit(-1), F.lit(0), F.lit(1))
    scattered = (
        r.select("v", "cell_x", "cell_y", F.explode(off).alias("dx"))
        .select("v", "cell_x", "cell_y", "dx", F.explode(off).alias("dy"))
        .select(
            (F.col("cell_x") + F.col("dx")).alias("tx"),
            (F.col("cell_y") + F.col("dy")).alias("ty"),
            (F.col("v") * (-F.col("dx")) * (2 - F.abs("dy"))).alias("vwx"),
            (F.col("v") * (-F.col("dy")) * (2 - F.abs("dx"))).alias("vwy"),
        )
    )
    grads = scattered.groupBy(
        F.col("tx").alias("cell_x"), F.col("ty").alias("cell_y")
    ).agg(
        dsum("vwx", "gx8"),
        dsum("vwy", "gy8"),
        F.count(F.lit(1)).alias("support"),
    )
    slope = F.atan(
        F.sqrt(F.col("gx8") * F.col("gx8") + F.col("gy8") * F.col("gy8")) / F.lit(8.0)
    )
    aspect = F.atan2(F.col("gy8"), -F.col("gx8"))
    shade = (
        F.cos(F.lit(_HS_ZENITH)) * F.cos(slope)
        + F.sin(F.lit(_HS_ZENITH)) * F.sin(slope) * F.cos(F.lit(_HS_AZIMUTH) - aspect)
    )
    return grads.where(F.col("support") == 9).select(
        "cell_x",
        "cell_y",
        dround(F.greatest(F.lit(0.0), shade)).alias("shade"),
    )


@register(
    "agg_spatial_moran",
    oracle=f"""
        WITH raster AS ({_SQL_RASTER}),
        zc1 AS (
            SELECT cell_x, cell_y,
                   v - CAST(CAST(CAST(ROUND(((SUM(CAST(CAST((CASE WHEN ABS((v)) < 5e-11 THEN CAST(0.0 AS DOUBLE) ELSE (v) END) AS VARCHAR) AS DECIMAL(30,10))) OVER ())), 6) AS DECIMAL(24,6)) * CAST(1000000 AS DECIMAL(8,0)) AS BIGINT) AS DOUBLE) / 1000000.0 / (COUNT(*) OVER ()) AS z,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM raster
        ), zc AS (
            SELECT cell_x, cell_y, z, n,
                   CAST(CAST(CAST(ROUND((SUM(CAST(CAST((CASE WHEN ABS((z * z)) < 5e-11 THEN CAST(0.0 AS DOUBLE) ELSE (z * z) END) AS VARCHAR) AS DECIMAL(30,10))) OVER ()), 6) AS DECIMAL(24,6)) * CAST(1000000 AS DECIMAL(8,0)) AS BIGINT) AS DOUBLE) / 1000000.0 AS den
            FROM zc1
        ), scatter AS (
            SELECT zc.cell_x + dx.o AS tx, zc.cell_y + dy.o AS ty,
                   zc.z, zc.n, zc.den,
                   CASE WHEN dx.o = 0 AND dy.o = 0 THEN 1 ELSE 0 END AS self
            FROM zc
            CROSS JOIN (VALUES (-1), (0), (1)) dx(o)
            CROSS JOIN (VALUES (-1), (0), (1)) dy(o)
        ), gathered AS (
            SELECT tx, ty,
                   MAX(CASE WHEN self = 1 THEN z END) AS z_t,
                   {sql_exact_double(
                       "SUM(CASE WHEN self = 0 THEN "
                       + sql_dec_cast("z") + " END)"
                   )} AS nsum,
                   CAST(SUM(1 - self) AS BIGINT) AS n_nbrs,
                   MAX(self) AS real_cell,
                   MAX(n) AS n, MAX(den) AS den
            FROM scatter GROUP BY tx, ty
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_cells,
               CAST(SUM(CASE WHEN real_cell = 1 THEN n_nbrs ELSE 0 END)
                    AS BIGINT) AS w_pairs,
               {sql_dround(
                   "(CAST(MAX(n) AS DOUBLE)"
                   " / NULLIF(CAST(SUM(CASE WHEN real_cell = 1"
                   " THEN n_nbrs ELSE 0 END) AS DOUBLE),"
                   " CAST(0.0 AS DOUBLE)))"
                   " * ("
                   + sql_exact_double(
                       "SUM(CASE WHEN real_cell = 1 THEN "
                       + sql_dec_cast("z_t * COALESCE(nsum, 0.0)")
                       + " END)"
                   )
                   + ") / NULLIF(MAX(den), CAST(0.0 AS DOUBLE))"
               )} AS moran_i
        FROM gathered
    """,
)
def agg_spatial_moran(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I spatial autocorrelation of the binned composite under
    queen (8-neighbor, binary) weights — THE canonical "is this raster
    spatially structured or noise" screen before any interpolation or
    trend product.  I = (n/W)·Σᵢ zᵢ·(Σⱼ∈nbr zⱼ) / Σ zᵢ² with z the
    mean-centered composite.

    Shape: the double sum collapses to ONE scatter-gather — each cell's
    z scatters to its 9 targets, the gather takes the neighbor sum and
    the center z in the SAME hash aggregate (self-flag trick, as in the
    focal keys), and the final reduction is a 1-row aggregate.  Edge
    cells contribute their true (smaller) neighbor counts to W — the
    standard non-toroidal convention.  Mean/denominator ride wall
    windows over the cell table (the post-agg composite, not the
    corpus); neighbor and product sums take the decimal path; the final
    statistic rounds 6 dp."""
    r = _raster(spark, sf_dir)
    wall = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    mean = exact_double(F.sum(dec_cast("v")).over(wall)) / F.count(F.lit(1)).over(
        wall
    )
    zc = r.select(
        "cell_x",
        "cell_y",
        (F.col("v") - mean).alias("z"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n"),
    )
    zc = zc.select(
        "cell_x",
        "cell_y",
        "z",
        "n",
        exact_double(F.sum(dec_cast(F.col("z") * F.col("z"))).over(wall)).alias(
            "den"
        ),
    )
    off = F.array(F.lit(-1), F.lit(0), F.lit(1))
    scattered = (
        zc.select("z", "n", "den", "cell_x", "cell_y", F.explode(off).alias("dx"))
        .select("z", "n", "den", "cell_x", "cell_y", "dx", F.explode(off).alias("dy"))
        .select(
            (F.col("cell_x") + F.col("dx")).alias("tx"),
            (F.col("cell_y") + F.col("dy")).alias("ty"),
            "z",
            "n",
            "den",
            ((F.col("dx") == 0) & (F.col("dy") == 0)).cast("int").alias("self"),
        )
    )
    gathered = scattered.groupBy("tx", "ty").agg(
        F.max(F.when(F.col("self") == 1, F.col("z"))).alias("z_t"),
        exact_double(
            F.sum(F.when(F.col("self") == 0, dec_cast("z")))
        ).alias("nsum"),
        F.sum(1 - F.col("self")).cast("long").alias("n_nbrs"),
        F.max("self").alias("real_cell"),
        F.max("n").alias("n"),
        F.max("den").alias("den"),
    )
    w_pairs = F.sum(F.when(F.col("real_cell") == 1, F.col("n_nbrs")).otherwise(0))
    num = exact_double(
        F.sum(
            F.when(
                F.col("real_cell") == 1,
                dec_cast(F.col("z_t") * F.coalesce(F.col("nsum"), F.lit(0.0))),
            )
        )
    )
    return gathered.agg(
        F.max("n").cast("long").alias("n_cells"),
        w_pairs.cast("long").alias("w_pairs"),
        dround(
            (F.max("n").cast("double") / F.nullif(w_pairs.cast("double"), F.lit(0.0)))
            * num
            / F.nullif(F.max("den"), F.lit(0.0))
        ).alias("moran_i"),
    )
