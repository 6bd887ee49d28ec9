"""Gaps-and-islands: consecutive-run analytics (SURVEY.md §2.5 — r4b).

The EO question behind it: "longest consecutive wet spell per pixel" /
"longest cloud-free run" — WOfS-style hydrology summaries need RUN
LENGTHS over the time axis, not just counts.  The classic relational
solution (no recursion, no UDF, no per-row loop) is the two-row_number
trick: within each series ordered by time, ``rn_all − rn_flagged`` is
CONSTANT across each unbroken run of flagged rows, so it is the island
id; run lengths are then one grouped count and the per-series summary one
more aggregate.

Scale shape: both window functions share ONE partition spec (one
Exchange on the series key + one sort serves them together), and the two
follow-up aggregates hash on prefixes of the same key — Catalyst reuses
the partitioning, so the whole operator costs a single shuffle of the
observation table (pinned in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import fanout, load
from ..registry import register

_WET = 245.0  # same threshold family as the raster mask keys


@register(
    "window_streak",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, value >= {_WET!r} AS wet,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn_all,
                   ROW_NUMBER() OVER (PARTITION BY user_id, value >= {_WET!r}
                                      ORDER BY ts, event_id) AS rn_flag
            FROM events
        ), islands AS (
            SELECT user_id, COUNT(*) AS run_len
            FROM flagged WHERE wet
            GROUP BY user_id, rn_all - rn_flag
        )
        SELECT user_id,
               MAX(run_len) AS longest_wet_run,
               COUNT(*) AS n_wet_runs,
               CAST(SUM(run_len) AS BIGINT) AS n_wet_total
        FROM islands
        GROUP BY user_id
    """,
)
def window_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10: longest consecutive wet run per series via gaps-and-islands —
    ``rn_all − rn_flag`` labels each unbroken flagged run, one grouped
    count measures the runs, one more grouped aggregate summarizes the
    series.  Series with zero wet observations drop out (standard
    islands semantics; left-join against the key universe to keep them).
    Both row_numbers ride one window Exchange; the island/summary aggs
    reuse that partitioning — single-shuffle total."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", (F.col("value") >= _WET).alias("wet")
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_flag = Window.partitionBy("user_id", "wet").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "wet",
        (F.row_number().over(w_all) - F.row_number().over(w_flag)).alias("island"),
    )
    islands = (
        flagged.where("wet")
        .groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return islands.groupBy("user_id").agg(
        F.max("run_len").alias("longest_wet_run"),
        F.count(F.lit(1)).alias("n_wet_runs"),
        F.sum("run_len").alias("n_wet_total"),
    )


@register(
    "window_despike",
    oracle="""
        WITH med AS (
            SELECT event_id, user_id, value,
                   ROUND(MEDIAN(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 6) AS rolling_med,
                   ROUND(MEDIAN(value) OVER (PARTITION BY user_id), 6) AS series_med
            FROM events
        ), mad AS (
            SELECT *,
                   ROUND(MEDIAN(ABS(value - series_med))
                         OVER (PARTITION BY user_id), 6) AS series_mad
            FROM med
        )
        SELECT event_id, user_id, rolling_med, series_mad,
               CASE WHEN ABS(value - rolling_med) > 3.0 * series_mad
                    THEN 1 ELSE 0 END AS is_spike
        FROM mad
    """,
)
def window_despike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11: Hampel-style despike — flag observations whose deviation from
    the 5-frame ROLLING median exceeds 3× the series' median absolute
    deviation (the robust outlier filter EO time series run before
    compositing: cloud shadows and SLC artifacts spike single scenes and
    a mean-based filter chases its own outliers).

    Spark forbids holistic aggregates (median) as WINDOW functions
    ([INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC]), so the rolling median
    is built the Spark-first way: the 5 frame values as lag/lead columns
    → ``array_compact`` (ragged series edges) → ``array_sort`` → exact
    middle-element arithmetic — all codegen, one window Exchange + sort.
    The series-level median/MAD come from the two-pass grouped form
    (``agg_mad_1d``'s shape) joined back broadcast.  The DuckDB oracle
    states the SAME semantics in its native windowed-MEDIAN form, so the
    parity gate proves lag/lead-sort == true frame median.  Medians round
    6 dp before the spike compare so the threshold never sits on a
    cross-engine ulp."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = F.array_sort(
        F.array_compact(
            F.array(
                F.lag("value", 2).over(w),
                F.lag("value", 1).over(w),
                F.col("value"),
                F.lead("value", 1).over(w),
                F.lead("value", 2).over(w),
            )
        )
    )
    n = F.size(frame)
    rolling_med = F.round(
        F.when(
            n % 2 == 1, F.element_at(frame, ((n + 1) / 2).cast("int"))
        ).otherwise(
            (
                F.element_at(frame, (n / 2).cast("int"))
                + F.element_at(frame, (n / 2).cast("int") + 1)
            )
            / 2.0
        ),
        6,
    )
    med = ev.select("event_id", "user_id", "value", rolling_med.alias("rolling_med"))
    smed = ev.groupBy("user_id").agg(F.round(F.median("value"), 6).alias("series_med"))
    smad = (
        ev.join(F.broadcast(smed), "user_id")
        .groupBy("user_id")
        .agg(
            F.round(
                F.median(F.abs(F.col("value") - F.col("series_med"))), 6
            ).alias("series_mad")
        )
    )
    return med.join(F.broadcast(smad), "user_id").select(
        "event_id",
        "user_id",
        "rolling_med",
        "series_mad",
        (F.abs(F.col("value") - F.col("rolling_med")) > 3.0 * F.col("series_mad"))
        .cast("int")
        .alias("is_spike"),
    )


@register(
    "window_interpolate_linear",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id,
                   CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS sec,
                   event_type,
                   CASE WHEN event_type <> 'error' THEN value END AS v,
                   CASE WHEN event_type <> 'error'
                        THEN CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT)
                   END AS vt
            FROM events
        ), w AS (
            SELECT user_id, event_id, sec, event_type,
                   LAST_VALUE(v IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY sec, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS pv,
                   LAST_VALUE(vt IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY sec, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS pt,
                   FIRST_VALUE(v IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY sec, event_id
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
                   ) AS nv,
                   FIRST_VALUE(vt IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY sec, event_id
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
                   ) AS nt
            FROM e
        )
        SELECT user_id, event_id,
               CASE WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                        pv + (nv - pv) * (CAST(sec - pt AS DOUBLE)
                                          / CAST(nt - pt AS DOUBLE))
                    WHEN pv IS NOT NULL THEN pv
                    ELSE nv END AS value_filled,
               CASE WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
                    WHEN pv IS NOT NULL THEN 'ffill'
                    WHEN nv IS NOT NULL THEN 'bfill'
                    ELSE 'empty' END AS fill_kind
        FROM w WHERE event_type = 'error'
    """,
)
def window_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W16: time-weighted linear interpolation of missing observations —
    the `xr.DataArray.interpolate_na('time')` analog one step past
    ``window_gap_fill``'s carry-forward.  Rows flagged invalid (the
    'error' event type stands in for the cloud-masked observation) take
    v_prev + (v_next − v_prev)·(t − t_prev)/(t_next − t_prev) from the
    nearest valid neighbors in the (ts, event_id) series order; a missing
    side degrades to forward/backward fill, an empty series to NULL.

    Scale shape: all four neighbor lookups are IGNORE-NULLS window
    functions sharing ONE (user) partition spec and sort — a single
    Exchange of the observation table, no self-join, no corpus re-scan
    (pinned).  Determinism: neighbor values/epochs are carried exactly;
    the blend is a fixed-order IEEE chain on bit-identical operands —
    left unrounded."""
    valid = F.col("event_type") != "error"
    e = (
        load(spark, sf_dir, "events")
        .repartition(fanout(spark), "user_id")  # single-file input: parallelize the window
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_timestamp("ts").alias("sec"),
            F.when(valid, F.col("value")).alias("v"),
            F.when(valid, F.unix_timestamp("ts")).alias("vt"),
        )
    )
    order = Window.partitionBy("user_id").orderBy("sec", "event_id")
    wprev = order.rowsBetween(Window.unboundedPreceding, -1)
    wnext = order.rowsBetween(1, Window.unboundedFollowing)
    w = e.select(
        "user_id",
        "event_id",
        "sec",
        "event_type",
        F.last("v", ignorenulls=True).over(wprev).alias("pv"),
        F.last("vt", ignorenulls=True).over(wprev).alias("pt"),
        F.first("v", ignorenulls=True).over(wnext).alias("nv"),
        F.first("vt", ignorenulls=True).over(wnext).alias("nt"),
    )
    both = F.col("pv").isNotNull() & F.col("nv").isNotNull()
    blend = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("sec") - F.col("pt")).cast("double")
        / (F.col("nt") - F.col("pt")).cast("double")
    )
    return w.where(F.col("event_type") == "error").select(
        "user_id",
        "event_id",
        F.when(both, blend)
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
        .alias("value_filled"),
        F.when(both, "interp")
        .when(F.col("pv").isNotNull(), "ffill")
        .when(F.col("nv").isNotNull(), "bfill")
        .otherwise("empty")
        .alias("fill_kind"),
    )


@register(
    "window_rolling_median",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id,
                   CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS sec,
                   value
            FROM events
        ), w AS (
            SELECT user_id, event_id,
                   list_sort(LIST(value) OVER (
                       PARTITION BY user_id ORDER BY sec, event_id
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
                   )) AS arr
            FROM e
        )
        SELECT user_id, event_id,
               CAST(LEN(arr) AS INTEGER) AS n_window,
               list_extract(arr,
                   CAST(FLOOR(CAST(LEN(arr) + 1 AS DOUBLE) / 2) AS INTEGER))
                   AS med,
               list_extract(arr,
                   CAST(FLOOR(CAST(9 * LEN(arr) + 9 AS DOUBLE) / 10)
                        AS INTEGER)) AS p90
        FROM w
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W17: rolling exact quantiles — lower median and discrete p90 of
    each series' trailing 7 observations, the robust companion to
    ``window_rolling``'s mean (a rolling median is what despike/denoise
    pipelines actually subtract).  Quantiles don't decompose into frame
    aggregates, so the frame is collected (≤7 values), sorted, and
    indexed: med = element ⌊(n+1)/2⌋, p90 = element ⌈9n/10⌉ — explicit
    discrete selection, identical on both engines regardless of their
    quantile interpolation conventions.

    Scale shape: ONE user-partition window Exchange+Sort carries both
    quantiles (plan-pinned); per-row state is the 7-element frame, so
    memory is O(frame), not O(series).  Determinism: selected elements
    are carried bit-exact — no arithmetic, no rounding; the only float
    op is an exact small-integer divide under FLOOR."""
    e = (
        load(spark, sf_dir, "events")
        .repartition(fanout(spark), "user_id")  # single-file input: parallelize the window
        .select(
            "user_id",
            "event_id",
            F.unix_timestamp("ts").alias("sec"),
            "value",
        )
    )
    frame = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    w = e.select(
        "user_id",
        "event_id",
        F.array_sort(F.collect_list("value").over(frame)).alias("arr"),
    )
    n = F.size("arr")
    return w.select(
        "user_id",
        "event_id",
        n.cast("int").alias("n_window"),
        F.element_at(
            "arr", F.floor((n + 1).cast("double") / 2).cast("int")
        ).alias("med"),
        F.element_at(
            "arr", F.floor((9 * n + 9).cast("double") / 10).cast("int")
        ).alias("p90"),
    )


_SESSION_GAP = 1800  # 30-minute inactivity gap


@register(
    "agg_sessionize",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_id, event_type,
                   CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS sec
            FROM events
        ), g AS (
            SELECT user_id, event_id, event_type, sec,
                   CASE WHEN LAG(sec) OVER w IS NULL
                             OR sec - LAG(sec) OVER w > {_SESSION_GAP}
                        THEN 1 ELSE 0 END AS is_start
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
        ), s AS (
            SELECT user_id, event_id, event_type, sec,
                   CAST(SUM(is_start) OVER (
                       PARTITION BY user_id ORDER BY sec, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_idx
            FROM g
        )
        SELECT user_id, session_idx,
               MIN(sec) AS start_sec,
               MAX(sec) AS end_sec,
               MAX(sec) - MIN(sec) AS duration_sec,
               COUNT(*) AS n_events,
               CAST(CASE WHEN COUNT(*) = 1 THEN 1 ELSE 0 END AS INTEGER)
                   AS is_bounce,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases
        FROM s GROUP BY user_id, session_idx
    """,
)
def agg_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W18: batch sessionization ledger — split each user's event stream
    at >{_SESSION_GAP}s inactivity gaps (the classic gaps-and-islands
    form) and emit one row PER SESSION: bounds, duration, event count,
    bounce flag, purchase count.  The per-session LEDGER is the artifact
    product analytics joins everything else against — distinct from
    ``stream_session``'s windowed aggregate view of the same semantics.

    Scale shape: the gap flag (lag) and the running session index
    (cumulative sum) are two window passes over ONE (user) partition
    spec and sort, and the session rollup groups on (user, session_idx)
    — a superset of the window's hash key, so Spark reuses the same
    Exchange: one corpus shuffle total (pinned).  Whole-second integer
    arithmetic end to end."""
    e = (
        load(spark, sf_dir, "events")
        .repartition(fanout(spark), "user_id")  # single-file input: parallelize the window
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_timestamp("ts").alias("sec"),
        )
    )
    order = Window.partitionBy("user_id").orderBy("sec", "event_id")
    cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("sec").over(order)
    g = e.withColumn(
        "is_start",
        F.when(
            prev.isNull() | (F.col("sec") - prev > _SESSION_GAP), 1
        ).otherwise(0),
    )
    s = g.withColumn(
        "session_idx", F.sum("is_start").over(cum).cast("bigint")
    )
    return s.groupBy("user_id", "session_idx").agg(
        F.min("sec").alias("start_sec"),
        F.max("sec").alias("end_sec"),
        (F.max("sec") - F.min("sec")).alias("duration_sec"),
        F.count(F.lit(1)).alias("n_events"),
        (F.count(F.lit(1)) == 1).cast("int").alias("is_bounce"),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
    )


_TS_K = 7  # trailing window width for the Theil-Sen slope


def _ts_pairs_sql() -> str:
    """The 21 pairwise-slope CASE expressions over lag columns t0..t6 /
    y0..y6 (0 = current row, 6 = oldest) — identical operand order to the
    Spark side."""
    terms = []
    for i in range(_TS_K - 1, 0, -1):  # older point
        for j in range(i - 1, -1, -1):  # newer point
            terms.append(
                f"CASE WHEN t{j} IS NOT NULL AND t{i} IS NOT NULL"
                f" AND t{j} <> t{i}"
                f" THEN (y{j} - y{i}) / CAST(t{j} - t{i} AS DOUBLE) END"
            )
    return ", ".join(terms)


@register(
    "window_theil_sen",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_id,
                   CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS sec,
                   value
            FROM events
        ), lagged AS (
            SELECT user_id, event_id,
                   {", ".join(
                       f"LAG(sec, {k}) OVER w AS t{k}, "
                       f"LAG(value, {k}) OVER w AS y{k}"
                       for k in range(_TS_K)
                   )}
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
        ), slopes AS (
            SELECT user_id, event_id,
                   list_sort(list_filter([{_ts_pairs_sql()}],
                                         x -> x IS NOT NULL)) AS sl
            FROM lagged
        )
        SELECT user_id, event_id,
               CAST(LEN(sl) AS INTEGER) AS n_pairs,
               CASE WHEN LEN(sl) > 0 THEN list_extract(sl,
                   CAST(FLOOR(CAST(LEN(sl) + 1 AS DOUBLE) / 2) AS INTEGER))
               END AS ts_slope
        FROM slopes
    """,
)
def window_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W19: rolling Theil-Sen slope — the lower median of all pairwise
    slopes among each series' trailing {_TS_K} observations, the ROBUST
    trend companion to ``window_rolling_slope``'s least squares (one
    spike corrupts OLS; Theil-Sen tolerates ~29% outliers) and the slope
    twin of ``agg_mann_kendall``'s trend test.

    Spark-first: the {_TS_K} frame points arrive as lag columns off ONE
    window spec (the window_ewma tap pattern — same single Exchange+Sort
    any one lag needs); the C({_TS_K},2)=21 pairwise slopes are a fixed
    codegen'd expression array → compact → sort → explicit lower-median
    selection.  Equal-timestamp pairs are excluded (slope undefined);
    series heads yield fewer pairs, never NULL-poisoned ones.
    Determinism: each slope is one IEEE subtract-divide on exactly
    carried operands; the median element is carried bit-exact."""
    e = (
        load(spark, sf_dir, "events")
        .repartition(fanout(spark), "user_id")  # single-file input: parallelize the window
        .select(
            "user_id",
            "event_id",
            F.unix_timestamp("ts").alias("sec"),
            "value",
        )
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    lagged = e.select(
        "user_id",
        "event_id",
        *[F.lag("sec", k).over(w).alias(f"t{k}") for k in range(_TS_K)],
        *[F.lag("value", k).over(w).alias(f"y{k}") for k in range(_TS_K)],
    )
    slope_exprs = []
    for i in range(_TS_K - 1, 0, -1):
        for j in range(i - 1, -1, -1):
            ti, tj = F.col(f"t{i}"), F.col(f"t{j}")
            yi, yj = F.col(f"y{i}"), F.col(f"y{j}")
            slope_exprs.append(
                F.when(
                    ti.isNotNull() & tj.isNotNull() & (tj != ti),
                    (yj - yi) / (tj - ti).cast("double"),
                )
            )
    sl = F.array_sort(F.array_compact(F.array(*slope_exprs)))
    n = F.size(sl)
    return lagged.select(
        "user_id",
        "event_id",
        n.cast("int").alias("n_pairs"),
        F.when(
            n > 0,
            F.element_at(sl, F.floor((n + 1).cast("double") / 2).cast("int")),
        ).alias("ts_slope"),
    )


@register(
    "window_drawdown",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id,
                   CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS sec,
                   value
            FROM events
        ), cum AS (
            SELECT user_id, event_id, value,
                   MAX(value) OVER (
                       PARTITION BY user_id ORDER BY sec, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS peak
            FROM e
        ), dd AS (
            SELECT user_id, value, peak,
                   (peak - value) / peak AS drawdown
            FROM cum
        )
        SELECT user_id,
               MAX(peak) AS max_value,
               MAX(drawdown) AS max_drawdown,
               CAST(COUNT(CASE WHEN drawdown = 0.0 THEN 1 END) AS BIGINT)
                   AS n_at_peak
        FROM dd GROUP BY user_id
    """,
)
def window_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W20: maximum drawdown per series — the running-peak-to-trough
    loss ((peak − x)/peak over the cumulative max), the risk summary
    every monitoring/financial series report carries alongside trend.

    Shape: the running peak is a cumulative MAX window; the per-series
    rollup groups on the window's own partition key, so the whole
    operator is ONE Exchange (reuse pinned).  value > 0 in the fixture,
    so the ratio is well-defined; drawdown == 0 counts the at-peak
    observations.  Determinism: cumulative max carries values bit-exact;
    the ratio is one IEEE subtract-divide — unrounded."""
    e = (
        load(spark, sf_dir, "events")
        .repartition(fanout(spark), "user_id")  # single-file input: parallelize the window
        .select(
            "user_id",
            "event_id",
            F.unix_timestamp("ts").alias("sec"),
            "value",
        )
    )
    cum = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = e.select(
        "user_id",
        "value",
        F.max("value").over(cum).alias("peak"),
    ).select(
        "user_id",
        "peak",
        ((F.col("peak") - F.col("value")) / F.col("peak")).alias("drawdown"),
    )
    return dd.groupBy("user_id").agg(
        F.max("peak").alias("max_value"),
        F.max("drawdown").alias("max_drawdown"),
        F.count(F.when(F.col("drawdown") == 0.0, 1)).cast("bigint").alias(
            "n_at_peak"
        ),
    )


@register(
    "agg_spc_rules",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id,
                   CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS sec,
                   value
            FROM events
        ), lim AS (
            SELECT user_id, event_id, sec, value,
                   AVG(value) OVER (PARTITION BY user_id) AS mu,
                   STDDEV_SAMP(value) OVER (PARTITION BY user_id) AS sd
            FROM e
        ), z AS (
            SELECT user_id, event_id, sec,
                   ROUND((value - mu) / NULLIF(sd, CAST(0.0 AS DOUBLE)), 6) AS zr
            FROM lim
        ), flags AS (
            SELECT user_id, event_id,
                   CAST(ABS(zr) > 3.0 AS INTEGER) AS r1,
                   CAST(zr > 2.0 AS INTEGER
                        ) + CAST(LAG(zr > 2.0) OVER w AS INTEGER
                        ) + CAST(LAG(zr > 2.0, 2) OVER w AS INTEGER) AS hi2,
                   CAST(zr < -2.0 AS INTEGER
                        ) + CAST(LAG(zr < -2.0) OVER w AS INTEGER
                        ) + CAST(LAG(zr < -2.0, 2) OVER w AS INTEGER) AS lo2
            FROM z
            WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
        )
        SELECT user_id,
               CAST(SUM(r1) AS BIGINT) AS n_rule1,
               CAST(SUM(CASE WHEN hi2 >= 2 OR lo2 >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_rule2,
               COUNT(*) AS n_obs
        FROM flags GROUP BY user_id
    """,
)
def agg_spc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W21: statistical-process-control screen (Western Electric rules 1
    and 2) per series — Rule 1: a point beyond ±3σ; Rule 2: ≥2 of 3
    consecutive points beyond the same 2σ limit.  The monitoring rule
    battery quality pipelines run on sensor/metric streams.

    Spark forbids nothing here: control limits (μ, σ) are per-series
    windows; z-scores round 6 dp BEFORE the limit compares (multi-pass
    stats policy — the compare must not sit on a cross-engine ulp); the
    2-of-3 runs are lag-flag sums on the SAME ordered window spec; the
    rollup reuses the user partitioning — one Exchange total (pinned)."""
    e = (
        load(spark, sf_dir, "events")
        .repartition(fanout(spark), "user_id")  # single-file input: parallelize windows
        .select(
            "user_id",
            "event_id",
            F.unix_timestamp("ts").alias("sec"),
            "value",
        )
    )
    wp = Window.partitionBy("user_id")
    z = e.select(
        "user_id",
        "event_id",
        "sec",
        F.round(
            (F.col("value") - F.avg("value").over(wp))
            / F.nullif(F.stddev_samp("value").over(wp), F.lit(0.0)),
            6,
        ).alias("zr"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    hi = (F.col("zr") > 2.0).cast("int")
    lo = (F.col("zr") < -2.0).cast("int")
    flags = z.select(
        "user_id",
        "event_id",
        (F.abs("zr") > 3.0).cast("int").alias("r1"),
        (hi + F.lag(hi).over(w) + F.lag(hi, 2).over(w)).alias("hi2"),
        (lo + F.lag(lo).over(w) + F.lag(lo, 2).over(w)).alias("lo2"),
    )
    return flags.groupBy("user_id").agg(
        F.sum("r1").cast("bigint").alias("n_rule1"),
        F.sum(
            F.when((F.col("hi2") >= 2) | (F.col("lo2") >= 2), 1).otherwise(0)
        ).cast("bigint").alias("n_rule2"),
        F.count(F.lit(1)).alias("n_obs"),
    )
