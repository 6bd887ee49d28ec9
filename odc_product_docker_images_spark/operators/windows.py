"""Window functions (SURVEY.md §2.5 W1-W6).

Reference analogs: per-pixel time-series ops — pick best-N clearest
observations (ranking), Δband between consecutive obs (change detection),
xarray ``rolling(time=k).mean()`` smoothing, cumulative clear-obs counts,
and the percentile contrast stretch in ``odc-algo to_rgba``.

Determinism: every ordering includes a unique tie-break column
(``event_id``); windowed float sums go through the decimal cast so frame
evaluation order (running-sum vs segment-tree) can't change the result.

Scale notes: a window = one shuffle on partition key + per-partition sort.
Partition keys here (user_id / pixel id) are high-cardinality, so
partitions stay small; never window over an empty ``partitionBy`` at scale
(single-task sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.det import dec_cast, exact_double, sql_dec_cast, sql_exact_double
from ..io import load
from ..registry import register



@register(
    "window_rank",
    oracle="""
        SELECT * FROM (
            SELECT user_id, event_id, value,
                   ROW_NUMBER() OVER w AS rn,
                   RANK() OVER w AS rnk,
                   DENSE_RANK() OVER w AS drnk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
        ) WHERE rn <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: ranking — best-3 clearest obs per pixel."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.select(
            "user_id",
            "event_id",
            "value",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "window_lag_delta",
    oracle="""
        SELECT event_id, user_id, ts, value,
               LAG(value) OVER w AS prev_value,
               value - LAG(value) OVER w AS delta
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: lag/lead delta — Δband between consecutive observations
    (two-epoch change generalized to every step).  Per-row subtraction is
    IEEE-exact, no rounding needed."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        prev.alias("prev_value"),
        (F.col("value") - prev).alias("delta"),
    )


@register(
    "window_rolling",
    oracle=f"""
        SELECT event_id, user_id, ts,
               {sql_exact_double(f"SUM({sql_dec_cast('value')}) OVER w")}
                 / CAST(COUNT(value) OVER w AS DOUBLE) AS rolling_avg,
               COUNT(value) OVER w AS n_in_frame
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def window_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: rolling mean over the last 5 obs — xarray ``rolling(time=5)``
    smoothing.  Framed decimal sum through the exact-cast path (det.py),
    then one IEEE division — engine-independent regardless of whether the
    frame is evaluated running-sum or segment-tree style."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    dec_sum = F.sum(dec_cast("value")).over(w)
    cnt = F.count("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (exact_double(dec_sum) / cnt.cast("double")).alias("rolling_avg"),
        cnt.alias("n_in_frame"),
    )


@register(
    "window_cumsum",
    oracle=f"""
        SELECT event_id, user_id, ts,
               {sql_exact_double(f"SUM({sql_dec_cast('value')}) OVER w")} AS cum_value,
               COUNT(*) OVER w AS cum_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: running total — cumulative clear-obs count over the time axis."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        exact_double(F.sum(dec_cast("value")).over(w)).alias("cum_value"),
        F.count(F.lit(1)).over(w).alias("cum_n"),
    )


@register(
    "window_topk_group",
    oracle="""
        SELECT event_id, user_id, ts, event_type FROM (
            SELECT event_id, user_id, ts, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn <= 2
    """,
)
def window_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: top-k per group — the k most-recent scenes per tile."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("event_id", "user_id", "ts", "event_type")
    )


@register(
    "window_ntile",
    oracle="""
        SELECT event_id, event_type, value,
               NTILE(4) OVER w AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume,
               NTH_VALUE(value, 1) OVER (PARTITION BY event_type
                                         ORDER BY value, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING) AS min_value
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: distribution functions — percentile stretch for visualization
    (``odc-algo to_rgba`` contrast stretch).  percent_rank/cume_dist are
    exact integer ratios → engine-identical doubles."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("value", 1).over(wfull).alias("min_value"),
    )


@register(
    "window_range_time",
    oracle=f"""
        SELECT event_id, user_id, ts,
               {sql_exact_double(f"SUM({sql_dec_cast('value')}) OVER w")}
                 / CAST(COUNT(value) OVER w AS DOUBLE) AS rolling_30m_avg,
               COUNT(value) OVER w AS n_in_frame
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY EPOCH_US(ts)
                     RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3+: TIME-range frame — rolling 30-minute mean per pixel, the
    "all observations within the last N days" composite (xarray
    ``rolling`` is row-based; real cadence gaps need a RANGE frame).
    Both engines order by integer epoch-MICROSECONDS with a numeric RANGE
    bound, so frame membership is decided on identical int64 values —
    no timestamp-precision or interval-arithmetic divergence.  Frame sums
    go through the decimal exact-cast path; RANGE peers (equal ts) are
    frame-identical by construction, so no tie-break is needed.

    Scale: same one-shuffle-one-sort shape as any window; the frame is
    bounded by the time span, not row count, so skewed-cadence keys can't
    blow up the frame state (it's a pointer range over the sorted run)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-1_800_000_000, Window.currentRow)
    )
    dec_sum = F.sum(dec_cast("value")).over(w)
    cnt = F.count("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (exact_double(dec_sum) / cnt.cast("double")).alias("rolling_30m_avg"),
        cnt.alias("n_in_frame"),
    )


@register(
    "window_gap_fill",
    oracle="""
        SELECT event_id, user_id, ts, masked_value,
               LAST_VALUE(masked_value IGNORE NULLS) OVER w AS filled_value,
               CASE WHEN masked_value IS NULL THEN 1 ELSE 0 END AS was_filled
        FROM (
            SELECT event_id, user_id, ts,
                   CASE WHEN event_type = 'error' THEN NULL ELSE value END
                     AS masked_value
            FROM events
        )
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2+: temporal gap-fill — mask invalid observations (the cloudy-pixel
    analog) to NULL, then forward-fill each pixel's series with the most
    recent valid value (``xr.DataArray.ffill('time')`` /
    ``odc-algo keep_good_np`` + fill).  ``last(ignorenulls=True)`` over a
    running frame is the distributed forward-fill: one shuffle + sort per
    pixel key, values pass through untouched (no float math at all)."""
    ev = load(spark, sf_dir, "events")
    masked = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.withColumn("masked_value", masked).select(
        "event_id",
        "user_id",
        "ts",
        "masked_value",
        F.last("masked_value", ignorenulls=True).over(w).alias("filled_value"),
        F.when(F.col("masked_value").isNull(), 1).otherwise(0).alias("was_filled"),
    )


# window_ewma's kernel: K taps of decay d, weights d^k as Python-computed
# double literals — both engines parse the identical shortest-repr values,
# so no libm pow ever runs at query time.
_EWMA_DECAY = 0.7
_EWMA_TAPS = 6


@register(
    "window_ewma",
    oracle=f"""
        SELECT event_id, user_id, ts, value,
               ({" + ".join(
                   f"COALESCE(LAG(value, {k}) OVER w"
                   f" * CAST({(_EWMA_DECAY ** k)!r} AS DOUBLE), 0.0)"
                   for k in range(_EWMA_TAPS)
               )})
               / ({" + ".join(
                   f"CASE WHEN LAG(value, {k}) OVER w IS NOT NULL"
                   f" THEN CAST({(_EWMA_DECAY ** k)!r} AS DOUBLE)"
                   f" ELSE CAST(0.0 AS DOUBLE) END"
                   for k in range(_EWMA_TAPS)
               )}) AS ewma
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3++: exponentially-weighted moving average over each pixel's last
    ``_EWMA_TAPS`` observations — the finite-window form of xarray/pandas
    ``ewm(alpha=0.3).mean()`` smoothing (recent scenes dominate, cloudy
    gaps decay away), renormalized over the taps actually present at the
    series head.  The infinite-recurrence EWMA is inherently sequential;
    truncating at K taps (0.7^6 < 12% residual weight) turns it into a
    FIXED-ORDER linear combination of ``lag`` columns — one shuffle + one
    sort per pixel key serves all K taps (a single window spec), identical
    to the plan any single lag would need, and nothing sequential survives.

    Determinism: the tap weights are Python-computed double literals (no
    runtime pow), each tap contributes ``lag_k · w_k`` or literal 0.0, and
    both engines evaluate the same left-to-right add chain and one final
    IEEE divide — per-row arithmetic, left unrounded per det.py policy."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    den = None
    for k in range(_EWMA_TAPS):
        lag_k = F.lag("value", k).over(w)
        wk = F.lit(_EWMA_DECAY**k)
        term = F.coalesce(lag_k * wk, F.lit(0.0))
        mask = F.when(lag_k.isNotNull(), wk).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = mask if den is None else den + mask
    return ev.select(
        "event_id", "user_id", "ts", "value", (num / den).alias("ewma")
    )
