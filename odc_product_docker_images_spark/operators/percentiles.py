"""Percentile composites (SURVEY.md §2.4 extension — A2's general form).

Reference analog: the DEA/odc-stats PERCENTILE products — per-pixel 10th /
50th / 90th percentile composites of an index over a year (e.g. the
``ga_ls_tc_pc_cyear`` tasseled-cap percentiles): the low percentile shows
the dry/bare state, the high one the peak-green/wet state, the median the
typical state.  The median mosaic (``agg_median``) is the p50 special
case; this key computes all three in ONE grouped pass.

Spark mapping: ``percentile(col, p)`` is exact linear-interpolation
(holistic — per-group sort), and all three percentiles share the single
sorted pass inside one hash aggregate: one shuffle, three outputs.  The
100 TB tier is ``agg_approx_percentile`` (mergeable KLL-style sketch);
this exact form is the oracle-able baseline, same split as
median/approx-median.

Determinism: DuckDB ``quantile_cont`` uses the same linear interpolation;
both engines land within an ulp, rounded to the 6-dp grid per the
multi-pass-stats convention (same policy as ``agg_geomedian_1d``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register


@register(
    "agg_percentile_composite",
    oracle="""
        SELECT l_suppkey,
               ROUND(QUANTILE_CONT(l_quantity, 0.1), 6) AS p10,
               ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) AS p50,
               ROUND(QUANTILE_CONT(l_quantity, 0.9), 6) AS p90,
               COUNT(*) AS n_obs
        FROM lineitem GROUP BY l_suppkey
    """,
)
def agg_percentile_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+: per-pixel p10/p50/p90 percentile composite in one grouped
    pass — one Exchange, one per-group sort serving all three exact
    percentiles (plan-pinned single shuffle in tests/test_plans.py)."""
    lf = load(spark, sf_dir, "lineitem")
    return lf.groupBy("l_suppkey").agg(
        F.round(F.percentile("l_quantity", F.lit(0.1)), 6).alias("p10"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("p90"),
        F.count(F.lit(1)).alias("n_obs"),
    )


@register(
    "agg_winsorized_mean",
    oracle="""
        WITH ranked AS (
            SELECT event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS r,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ), bounds AS (
            SELECT event_type, value, n,
                   CAST(FLOOR(n / 20) AS BIGINT) AS k,
                   MAX(CASE WHEN r = CAST(FLOOR(n / 20) AS BIGINT) + 1
                            THEN value END)
                       OVER (PARTITION BY event_type) AS lo,
                   MAX(CASE WHEN r = n - CAST(FLOOR(n / 20) AS BIGINT)
                            THEN value END)
                       OVER (PARTITION BY event_type) AS hi
            FROM ranked
        )
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(MAX(k) AS BIGINT) AS k_clamped,
               MAX(lo) AS lo, MAX(hi) AS hi,
               CAST(CAST(CAST(ROUND((SUM(CAST(CAST(
                   GREATEST(lo, LEAST(hi, value))
               AS VARCHAR) AS DECIMAL(30,10)))), 6) AS DECIMAL(24,6))
                   * CAST(1000000 AS DECIMAL(8,0)) AS BIGINT) AS DOUBLE)
                   / 1000000.0 / MAX(n) AS wmean
        FROM bounds GROUP BY event_type
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2++: 5%-winsorized mean per event type — the robust-mean
    composite between plain mean (outlier-hostage) and median (throws
    everything away): the k = ⌊n/20⌋ smallest values are clamped up to
    the (k+1)-th order statistic and the k largest down to the (n−k)-th,
    then averaged.  EXACT order statistics (row_number ranks, no
    interpolation), so the clamp bounds are observed values and
    cross-engine identical; k uses FLOOR under the integer cast on both
    engines (the CAST-rounds trap).  Shape: ranks and both bounds are
    windows over ONE event-type partitioning (bounds via conditional
    window MAX at the two pinned ranks — no join-back branch); the
    clamped sum rides the decimal path.  One Exchange, no join."""
    from pyspark.sql import Window

    from ..functions.det import dec_cast, exact_double

    ev = load(spark, sf_dir, "events")
    w_all = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("value", "event_id"))
        .alias("r"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    k = F.floor(F.col("n") / 20).cast("long")
    bounds = ranked.select(
        "event_type",
        "value",
        "n",
        k.alias("k"),
        F.max(F.when(F.col("r") == k + 1, F.col("value"))).over(w_all).alias("lo"),
        F.max(F.when(F.col("r") == F.col("n") - k, F.col("value")))
        .over(w_all)
        .alias("hi"),
    )
    clamped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("value")))
    return bounds.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max("k").cast("long").alias("k_clamped"),
        F.max("lo").alias("lo"),
        F.max("hi").alias("hi"),
        (
            exact_double(F.sum(dec_cast(clamped))).cast("double") / F.max("n")
        ).alias("wmean"),
    )


_SQG_ACC = 10000  # percentile_approx accuracy: rank error <= n/accuracy
_SQG_PQ = [2500, 5000, 7500, 9500]  # p*accuracy as EXACT integers


@register(
    "sketch_quantile_gate",
    oracle="""
        SELECT l_returnflag, COUNT(*) AS n, TRUE AS gate_met
        FROM lineitem GROUP BY l_returnflag
    """,
)
def sketch_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 sketch-quality gate — the ``sketch_error_gates`` pattern applied
    to the ⊘rows-only ``agg_approx_percentile`` sketch, closing the
    "quantile-sketch regression stays invisible" blind spot: per group,
    ``percentile_approx``'s DOCUMENTED rank guarantee (returned value's
    rank within target ± n/accuracy) is verified against EXACT ranks,
    and the oracle pins the boolean TRUE plus the exact group count.

    Check, all-integer (no float rank arithmetic): for each p with
    pq = p·accuracy ∈ {2500, 5000, 7500, 9500}, the approx value's rank
    interval [r_lo, r_hi] (strictly-below / at-or-below counts — ties
    give the value a rank RANGE) must intersect
    [pq·n − n − acc, pq·n + n + acc] in accuracy-scaled units, the ±1
    slack absorbing the floor/ceil convention at interval ends.  Products
    stay < 2^63 up to n ≈ 9e14 rows per group.

    Shape: one sketch pass (mergeable partial agg), then ONE broadcast of
    the 12-row (group × quantile) panel back over the base scan and a
    map-side-combined conditional-count agg — the exact-rank audit is
    linear, no per-group sort (the sort-free audit is the point: the
    sketch exists to avoid the holistic sort, and so does its auditor).
    At 100 TB the audit can ride a sampled slice while the sketch runs
    on the corpus (the ``sim_ann_recall`` precedent)."""
    lf = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    probs = [x / _SQG_ACC for x in _SQG_PQ]
    approx = lf.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", probs, _SQG_ACC).alias("avs")
    )
    aq = approx.select(
        "l_returnflag", F.posexplode("avs").alias("qi", "av")
    )
    ranks = (
        lf.join(F.broadcast(aq), "l_returnflag")
        .groupBy("l_returnflag", "qi", "av")
        .agg(
            F.sum(
                F.when(F.col("l_quantity") < F.col("av"), 1).otherwise(0)
            ).cast("long").alias("r_lo"),
            F.sum(
                F.when(F.col("l_quantity") <= F.col("av"), 1).otherwise(0)
            ).cast("long").alias("r_hi"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    pq = F.element_at(
        F.array(*[F.lit(x) for x in _SQG_PQ]), F.col("qi") + 1
    ).cast("long")
    acc = F.lit(_SQG_ACC).cast("long")
    n = F.col("n")
    ok = (F.col("r_hi") * acc >= pq * n - n - acc) & (
        F.col("r_lo") * acc <= pq * n + n + acc
    )
    return ranks.groupBy("l_returnflag").agg(
        F.max("n").cast("long").alias("n"),
        (F.sum(F.when(ok, 0).otherwise(1)) == 0).alias("gate_met"),
    )
