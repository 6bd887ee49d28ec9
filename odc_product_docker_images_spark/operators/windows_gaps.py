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

from ..io import load
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
