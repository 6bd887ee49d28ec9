"""Holt double-exponential smoothing per series (SURVEY.md §2.5/§2.10 —
the forecasting step past `window_ewma`'s single smoother).

A coupled two-state recursion (level, trend) is not expressible as a
window frame, so the Spark side runs an Arrow-batched grouped kernel
(`applyInPandas` — one shuffle on the series key, the geomedian
contract) while the oracle runs the SAME recursion as a DuckDB
``WITH RECURSIVE`` CTE (the `graph_subtree_rollup` precedent: the
recursion lives in the oracle, the engine side compiles it away — here
into a per-group sequential kernel).

Determinism without rounding: the smoothing constants are EXACT BINARY
fractions (α=0.5, β=0.25), and both sides evaluate the recurrence with
the identical operation order — so every intermediate double is
bit-identical across numpy and DuckDB and the outputs hash unrounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.det import davg, dround, sql_davg, sql_dround
from ..io import load
from ..registry import register

_ALPHA = 0.5  # level gain  (exact binary)
_BETA = 0.25  # trend gain  (exact binary)


def _series_order(tbl):
    """np.lexsort permutation of an Arrow group table by (ts, event_id).

    Identical to the pandas ``sort_values(["ts", "event_id"])`` the r6
    kernels used — the key pair is unique per series, so the permutation
    (and every float chain downstream) is unchanged.  Factored out for
    the r12 ``applyInArrow`` forms: the per-group pandas conversion was
    ~75% of each forecast key's wall time (a NO-OP applyInPandas over
    the same 1500-group fixture measured 3.0 s vs 1.3 s for the Arrow
    form — guide §4.1/§4.2: hand whole batches to numpy, skip the
    per-group pandas frame)."""
    import numpy as np

    return np.lexsort(
        (tbl.column("event_id").to_numpy(), tbl.column("ts").to_numpy())
    )


@register(
    "forecast_holt",
    oracle=f"""
        WITH RECURSIVE seq AS (
            SELECT user_id, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS i
            FROM events
        ), n AS (
            SELECT user_id, MAX(i) AS n FROM seq GROUP BY user_id
        ), rec AS (
            SELECT user_id, 1 AS i, value AS level,
                   CAST(0.0 AS DOUBLE) AS trend
            FROM seq WHERE i = 1
            UNION ALL
            SELECT r.user_id, r.i + 1,
                   CAST({_ALPHA!r} AS DOUBLE) * s.value
                     + CAST({1 - _ALPHA!r} AS DOUBLE) * (r.level + r.trend),
                   CAST({_BETA!r} AS DOUBLE)
                     * ((CAST({_ALPHA!r} AS DOUBLE) * s.value
                         + CAST({1 - _ALPHA!r} AS DOUBLE) * (r.level + r.trend))
                        - r.level)
                     + CAST({1 - _BETA!r} AS DOUBLE) * r.trend
            FROM rec r
            JOIN seq s ON s.user_id = r.user_id AND s.i = r.i + 1
        )
        SELECT rec.user_id,
               CAST(n.n AS BIGINT) AS n_obs,
               rec.level AS level,
               rec.trend AS trend,
               rec.level + rec.trend AS forecast_1
        FROM rec JOIN n ON rec.user_id = n.user_id
        WHERE rec.i = n.n
    """,
)
def forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W15: Holt linear-trend smoothing over each user's value series —
    level_t = α·x_t + (1−α)(level+trend), trend_t = β·Δlevel + (1−β)·trend,
    initialized (level₁=x₁, trend₁=0); emits each series' final state and
    one-step forecast.  One shuffle on the series key, then an
    Arrow-batched per-group kernel (numpy scalar loop — the recursion IS
    sequential per series; parallelism comes from series count, which is
    the 100 TB axis).  The oracle replays the recursion as a recursive
    CTE; α and β are exact binary fractions and the operation order is
    written identically on both sides, so the chain is bit-identical with
    NO rounding anywhere.  r12: ``applyInArrow`` + the shared lexsort
    helper replace the per-group pandas frame (same permutation, same
    float chain — see ``_series_order``); measured 3.98 s → 0.99 s warm
    min at sf0.1 (the family twins all moved 3.4-3.7 s → ≤1.0 s)."""
    import pyarrow as pa

    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")

    def fit(tbl: pa.Table) -> pa.Table:
        xs = tbl.column("value").to_numpy()[_series_order(tbl)]
        level = float(xs[0])
        trend = 0.0
        for x in xs[1:]:
            new_level = _ALPHA * float(x) + (1 - _ALPHA) * (level + trend)
            trend = _BETA * (new_level - level) + (1 - _BETA) * trend
            level = new_level
        return pa.table(
            {
                "user_id": pa.array([tbl.column("user_id")[0].as_py()], pa.int64()),
                "n_obs": pa.array([len(xs)], pa.int64()),
                "level": pa.array([level], pa.float64()),
                "trend": pa.array([trend], pa.float64()),
                "forecast_1": pa.array([level + trend], pa.float64()),
            }
        )

    return ev.groupBy("user_id").applyInArrow(
        fit, "user_id LONG, n_obs LONG, level DOUBLE, trend DOUBLE, forecast_1 DOUBLE"
    )


_GAMMA = 0.25  # seasonal gain (exact binary)
_PERIOD = 7  # seasonal period (observation index modulo, additive form)


@register(
    "forecast_holt_winters",
    oracle=f"""
        WITH RECURSIVE seq AS (
            SELECT user_id, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS i
            FROM events
        ), n AS (
            SELECT user_id, MAX(i) AS n FROM seq GROUP BY user_id
        ), rec AS (
            SELECT user_id, 1 AS i, value AS level,
                   CAST(0.0 AS DOUBLE) AS trend,
                   LIST_TRANSFORM(RANGE(1, {_PERIOD + 1}),
                                  j -> CAST(0.0 AS DOUBLE)) AS season
            FROM seq WHERE i = 1
            UNION ALL
            SELECT r.user_id, r.i + 1,
                   CAST({_ALPHA!r} AS DOUBLE)
                     * (s.value - r.season[((r.i) % {_PERIOD}) + 1])
                     + CAST({1 - _ALPHA!r} AS DOUBLE) * (r.level + r.trend),
                   CAST({_BETA!r} AS DOUBLE)
                     * ((CAST({_ALPHA!r} AS DOUBLE)
                         * (s.value - r.season[((r.i) % {_PERIOD}) + 1])
                         + CAST({1 - _ALPHA!r} AS DOUBLE) * (r.level + r.trend))
                        - r.level)
                     + CAST({1 - _BETA!r} AS DOUBLE) * r.trend,
                   LIST_TRANSFORM(RANGE(1, {_PERIOD + 1}), j ->
                       CASE WHEN j = ((r.i) % {_PERIOD}) + 1
                            THEN CAST({_GAMMA!r} AS DOUBLE)
                                 * (s.value
                                    - (CAST({_ALPHA!r} AS DOUBLE)
                                       * (s.value
                                          - r.season[((r.i) % {_PERIOD}) + 1])
                                       + CAST({1 - _ALPHA!r} AS DOUBLE)
                                         * (r.level + r.trend)))
                                 + CAST({1 - _GAMMA!r} AS DOUBLE)
                                   * r.season[((r.i) % {_PERIOD}) + 1]
                            ELSE r.season[j] END)
            FROM rec r
            JOIN seq s ON s.user_id = r.user_id AND s.i = r.i + 1
        )
        SELECT rec.user_id,
               CAST(n.n AS BIGINT) AS n_obs,
               rec.level AS level,
               rec.trend AS trend,
               rec.season[((n.n) % {_PERIOD}) + 1] AS season_next,
               rec.level + rec.trend
                 + rec.season[((n.n) % {_PERIOD}) + 1] AS forecast_1
        FROM rec JOIN n ON rec.user_id = n.user_id
        WHERE rec.i = n.n
    """,
)
def forecast_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W15+: additive Holt-Winters triple smoothing per series — the
    seasonal step past ``forecast_holt``: level/trend as before plus a
    {_PERIOD}-slot seasonal state updated at index (i−1) mod {_PERIOD}
    (level_t = α(x−s_old)+(1−α)(level+trend); s_new = γ(x−level_t)+
    (1−γ)s_old), initialized level₁=x₁, trend=0, s≡0.  Emits the final
    state, the next slot's seasonal, and the one-step forecast
    level+trend+s_next.

    Same execution contract as the Holt key: ONE shuffle on the series
    key into an Arrow-batched per-group kernel (the recursion is
    inherently sequential per series; the 100 TB axis is series count).
    The oracle replays the identical recursion as a recursive CTE
    carrying the seasonal VECTOR as a list column.  α, β, γ are exact
    binary fractions and the operation order matches term for term, so
    every state double is bit-identical across numpy and DuckDB —
    unrounded.  r12: ``applyInArrow`` + shared lexsort (same permutation,
    same float chain — ``_series_order``)."""
    import pyarrow as pa

    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")

    def fit(tbl: pa.Table) -> pa.Table:
        xs = tbl.column("value").to_numpy()[_series_order(tbl)]
        level = float(xs[0])
        trend = 0.0
        season = [0.0] * _PERIOD
        i = 1  # 1-based index of the last consumed observation
        for x in xs[1:]:
            slot = i % _PERIOD  # 0-based slot of observation i+1
            s_old = season[slot]
            new_level = _ALPHA * (float(x) - s_old) + (1 - _ALPHA) * (
                level + trend
            )
            trend = _BETA * (new_level - level) + (1 - _BETA) * trend
            season[slot] = _GAMMA * (float(x) - new_level) + (1 - _GAMMA) * s_old
            level = new_level
            i += 1
        s_next = season[i % _PERIOD]
        return pa.table(
            {
                "user_id": pa.array([tbl.column("user_id")[0].as_py()], pa.int64()),
                "n_obs": pa.array([len(xs)], pa.int64()),
                "level": pa.array([level], pa.float64()),
                "trend": pa.array([trend], pa.float64()),
                "season_next": pa.array([s_next], pa.float64()),
                "forecast_1": pa.array([level + trend + s_next], pa.float64()),
            }
        )

    return ev.groupBy("user_id").applyInArrow(
        fit,
        "user_id LONG, n_obs LONG, level DOUBLE, trend DOUBLE, "
        "season_next DOUBLE, forecast_1 DOUBLE",
    )


_KF_Q = 0.25  # process variance (exact binary)
_KF_R = 1.0  # measurement variance (exact binary)


@register(
    "forecast_kalman_1d",
    oracle=f"""
        WITH RECURSIVE seq AS (
            SELECT user_id, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS i
            FROM events
        ), n AS (
            SELECT user_id, MAX(i) AS n FROM seq GROUP BY user_id
        ), rec AS (
            SELECT user_id, 1 AS i, value AS x,
                   CAST(1.0 AS DOUBLE) AS p,
                   CAST(0.0 AS DOUBLE) AS k
            FROM seq WHERE i = 1
            UNION ALL
            SELECT r.user_id, r.i + 1,
                   r.x + ((r.p + CAST({_KF_Q!r} AS DOUBLE))
                          / ((r.p + CAST({_KF_Q!r} AS DOUBLE))
                             + CAST({_KF_R!r} AS DOUBLE)))
                         * (s.value - r.x),
                   (CAST(1.0 AS DOUBLE)
                    - (r.p + CAST({_KF_Q!r} AS DOUBLE))
                      / ((r.p + CAST({_KF_Q!r} AS DOUBLE))
                         + CAST({_KF_R!r} AS DOUBLE)))
                     * (r.p + CAST({_KF_Q!r} AS DOUBLE)),
                   (r.p + CAST({_KF_Q!r} AS DOUBLE))
                     / ((r.p + CAST({_KF_Q!r} AS DOUBLE))
                        + CAST({_KF_R!r} AS DOUBLE))
            FROM rec r
            JOIN seq s ON s.user_id = r.user_id AND s.i = r.i + 1
        )
        SELECT rec.user_id,
               CAST(n.n AS BIGINT) AS n_obs,
               rec.x AS estimate,
               rec.p AS variance,
               rec.k AS gain
        FROM rec JOIN n ON rec.user_id = n.user_id
        WHERE rec.i = n.n
    """,
)
def forecast_kalman_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W15++: 1-D Kalman filter per series (random-walk state model) —
    the optimal-gain denoiser beside the fixed-gain smoothers
    (EWMA/Holt/Holt-Winters).  Per step: predict p⁺ = p + q; gain
    k = p⁺/(p⁺ + r); update x ← x + k(z − x), p ← (1−k)p⁺; initialized
    x₁ = z₁, p₁ = 1.  Emits the final estimate, posterior variance, and
    last gain.

    Same contract as the smoothing keys: one series-key shuffle into an
    Arrow grouped kernel; the oracle replays the identical recursion as
    a recursive CTE.  q and r are exact binary fractions and each state
    update is written with the SAME operation order on both sides —
    bit-identical, unrounded.  r12: ``applyInArrow`` + shared lexsort
    (same permutation, same float chain — ``_series_order``)."""
    import pyarrow as pa

    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")

    def fit(tbl: pa.Table) -> pa.Table:
        zs = tbl.column("value").to_numpy()[_series_order(tbl)]
        x = float(zs[0])
        p = 1.0
        k = 0.0
        for z in zs[1:]:
            pp = p + _KF_Q
            k = pp / (pp + _KF_R)
            x = x + k * (float(z) - x)
            p = (1.0 - k) * pp
        return pa.table(
            {
                "user_id": pa.array([tbl.column("user_id")[0].as_py()], pa.int64()),
                "n_obs": pa.array([len(zs)], pa.int64()),
                "estimate": pa.array([x], pa.float64()),
                "variance": pa.array([p], pa.float64()),
                "gain": pa.array([k], pa.float64()),
            }
        )

    return ev.groupBy("user_id").applyInArrow(
        fit,
        "user_id LONG, n_obs LONG, estimate DOUBLE, variance DOUBLE, gain DOUBLE",
    )


@register(
    "forecast_backtest_metrics",
    oracle=f"""
        WITH e AS (
            SELECT user_id, value,
                   LAG(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev,
                   CAST({_ALPHA!r} AS DOUBLE) AS alpha
            FROM events
        ), s AS (
            SELECT user_id, value, prev,
                   ABS(value - prev) AS ae
            FROM e WHERE prev IS NOT NULL
        )
        SELECT user_id,
               COUNT(*) AS n_forecasts,
               {sql_davg('ae', 'mae_naive')},
               {sql_davg(
                   'CASE WHEN ABS(value) + ABS(prev) > 0.0 THEN '
                   + sql_dround(
                       '200.0 * ABS(value - prev) / (ABS(value) + ABS(prev))'
                   )
                   + ' ELSE 0.0 END',
                   'smape_naive',
               )}
        FROM s GROUP BY user_id
    """,
)
def forecast_backtest_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W15+++: rolling-origin backtest metrics for the naive (last-value)
    forecaster — per series: MAE and sMAPE of the one-step-ahead naive
    prediction.  This is the BASELINE row of every forecast evaluation
    (MASE normalizes against exactly this MAE), closing the loop on the
    smoothing-kernel family: fit keys produce forecasts, this key
    produces the yardstick.

    One lag window + one grouped agg on the same series partitioning —
    single Exchange.  sMAPE's per-row ratio is libm-free but multi-op,
    rounded 6 dp per term before the decimal mean (the survival-curve
    policy); MAE rides the decimal mean directly."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .withColumn("prev", F.lag("value").over(w))
        .where(F.col("prev").isNotNull())
    )
    ae = F.abs(F.col("value") - F.col("prev"))
    denom = F.abs("value") + F.abs("prev")
    smape_term = F.when(
        denom > 0.0, dround(F.lit(200.0) * ae / denom)
    ).otherwise(F.lit(0.0))
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_forecasts"),
        davg(ae, "mae_naive"),
        davg(smape_term, "smape_naive"),
    )


_CR_ALPHA = 0.5  # Croston gain (exact binary)


@register(
    "forecast_croston",
    oracle=f"""
        WITH RECURSIVE seq AS (
            SELECT user_id, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS i,
                   CASE WHEN event_type = 'purchase' THEN value
                        ELSE CAST(0.0 AS DOUBLE) END AS demand
            FROM events
        ), nz AS (
            SELECT user_id, demand, i,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY i) AS j,
                   CAST(COALESCE(
                       i - LAG(i) OVER (PARTITION BY user_id ORDER BY i), i
                   ) AS DOUBLE) AS q
            FROM seq WHERE demand > 0.0
        ), m AS (
            SELECT user_id, MAX(j) AS nj FROM nz GROUP BY user_id
        ), rec AS (
            SELECT user_id, 1 AS j, demand AS z, q AS p
            FROM nz WHERE j = 1
            UNION ALL
            SELECT r.user_id, r.j + 1,
                   CAST({_CR_ALPHA!r} AS DOUBLE) * s.demand
                     + CAST({1 - _CR_ALPHA!r} AS DOUBLE) * r.z,
                   CAST({_CR_ALPHA!r} AS DOUBLE) * s.q
                     + CAST({1 - _CR_ALPHA!r} AS DOUBLE) * r.p
            FROM rec r
            JOIN nz s ON s.user_id = r.user_id AND s.j = r.j + 1
        )
        SELECT rec.user_id,
               CAST(m.nj AS BIGINT) AS n_demands,
               rec.z AS size_level,
               rec.p AS interval_level,
               rec.z / rec.p AS croston_forecast
        FROM rec JOIN m ON rec.user_id = m.user_id
        WHERE rec.j = m.nj
    """,
)
def forecast_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W16: Croston intermittent-demand forecasting per user — the
    spare-parts/sparse-SKU method plain exponential smoothing biases on
    zero-heavy series: smooth the nonzero demand SIZES (z) and the
    inter-demand INTERVALS (p) separately at demand epochs only;
    forecast per period = z/p.  Demand = purchase value, zero otherwise;
    init z₁ = first demand, p₁ = its arrival index.

    Same contract as ``forecast_holt``: one shuffle on the series key →
    Arrow-batched per-group kernel (the recursion is sequential per
    series; series count is the 100 TB axis), oracle replays it as a
    recursive CTE over the nonzero subsequence.  α = 0.5 is an exact
    binary fraction and both sides share the operation order — the
    whole chain is bit-identical, NO rounding anywhere.  r12:
    ``applyInArrow`` + shared lexsort (same permutation, same float
    chain — ``_series_order``)."""
    import pyarrow as pa

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .otherwise(F.lit(0.0))
        .alias("demand"),
    )

    def fit(tbl: pa.Table) -> pa.Table:
        d = tbl.column("demand").to_numpy()[_series_order(tbl)]
        idx = [i + 1 for i in range(len(d)) if d[i] > 0.0]
        if not idx:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_demands": pa.array([], pa.int64()),
                    "size_level": pa.array([], pa.float64()),
                    "interval_level": pa.array([], pa.float64()),
                    "croston_forecast": pa.array([], pa.float64()),
                }
            )
        z = float(d[idx[0] - 1])
        p = float(idx[0])
        prev = idx[0]
        for i in idx[1:]:
            z = _CR_ALPHA * float(d[i - 1]) + (1 - _CR_ALPHA) * z
            p = _CR_ALPHA * float(i - prev) + (1 - _CR_ALPHA) * p
            prev = i
        return pa.table(
            {
                "user_id": pa.array([tbl.column("user_id")[0].as_py()], pa.int64()),
                "n_demands": pa.array([len(idx)], pa.int64()),
                "size_level": pa.array([z], pa.float64()),
                "interval_level": pa.array([p], pa.float64()),
                "croston_forecast": pa.array([z / p], pa.float64()),
            }
        )

    return ev.groupBy("user_id").applyInArrow(
        fit,
        "user_id LONG, n_demands LONG, size_level DOUBLE,"
        " interval_level DOUBLE, croston_forecast DOUBLE",
    )
