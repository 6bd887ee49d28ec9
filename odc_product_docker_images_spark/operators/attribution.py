"""Marketing-touch attribution (SURVEY.md §2.4/§2.10 extension — the
revenue-credit rollup every event-analytics deployment runs next to the
funnel and retention keys).

Each purchase distributes credit to the marketing touches (view/click)
that preceded it within a lookback window, under two standard models at
once: LAST-TOUCH (the most recent touch takes everything) and LINEAR
(every in-window touch takes value/n equally).  The scalable shape is ONE
(purchase, touch) pair stream — built with the same grid-cell bucketing
as ``join_range_bucket`` so the time-window pairing is an equi-join, not
a nested loop — and one purchase-partitioned window deriving both models
from the same pairs: no second scan, no join-back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.det import dsum_fast, sql_dsum
from ..io import load
from ..registry import register

_LOOKBACK_DAYS = 3  # attribution window AND grid-cell width
_TOUCH_TYPES = ("view", "click")


@register(
    "agg_attribution",
    oracle=f"""
        WITH pairs AS (
            SELECT p.event_id AS pid, p.value AS pvalue,
                   t.event_type AS channel, t.ts AS tts, t.event_id AS tid
            FROM events p
            JOIN events t
              ON t.user_id = p.user_id
             AND t.event_type IN {_TOUCH_TYPES!r}
             AND t.ts < p.ts
             AND t.ts >= p.ts - INTERVAL {_LOOKBACK_DAYS} DAY
            WHERE p.event_type = 'purchase'
        ), credited AS (
            SELECT channel, pvalue,
                   CAST(COUNT(*) OVER (PARTITION BY pid) AS DOUBLE) AS n_touches,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY pid ORDER BY tts DESC, tid DESC
                   ) = 1 AS INTEGER) AS is_last
            FROM pairs
        )
        SELECT channel,
               CAST(SUM(is_last) AS BIGINT) AS last_touch_purchases,
               {sql_dsum('CASE WHEN is_last = 1 THEN pvalue'
                         '     ELSE CAST(0.0 AS DOUBLE) END',
                         'last_touch_value')},
               {sql_dsum('pvalue / n_touches', 'linear_credit')}
        FROM credited
        GROUP BY channel
    """,
)
def agg_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A22: last-touch and linear multi-touch revenue attribution over a
    3-day lookback.  The (purchase, touch) pairing is a per-user time-
    range join expressed as an equi-join on (user, 3-day grid cell) with
    the exact window predicate on co-bucketed candidates (each purchase
    probes its ≤2 covering cells — the ``join_range_bucket`` pattern, no
    nested loop); both attribution models then come from ONE
    purchase-partitioned window over the pair stream (count → linear
    share, row_number desc → last touch) and one grouped rollup per
    channel.  Purchases with no in-window touch simply have no pairs
    (unattributed — excluded, the standard reporting convention).
    Credits ride the decimal-exact path; value/n_touches is one IEEE
    divide of bit-identical inputs."""
    ev = load(spark, sf_dir, "events")
    cell = lambda ts: F.floor(  # noqa: E731 — 3-day epoch grid
        (F.unix_timestamp(ts)) / (86400 * _LOOKBACK_DAYS)
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puser"),
        F.col("ts").alias("pts"),
        F.col("value").alias("pvalue"),
        F.explode(F.array(cell(F.col("ts")) - 1, cell(F.col("ts")))).alias("cell"),
    )
    touches = ev.where(F.col("event_type").isin(*_TOUCH_TYPES)).select(
        F.col("user_id").alias("tuser"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("tts"),
        F.col("event_id").alias("tid"),
        cell(F.col("ts")).alias("cell"),
    )
    pairs = purchases.join(
        touches,
        (F.col("puser") == F.col("tuser")) & (purchases["cell"] == touches["cell"]),
    ).where(
        (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.expr(f"INTERVAL {_LOOKBACK_DAYS} DAYS"))
    )
    # No pair dedupe needed: a touch has exactly ONE cell, so it meets at
    # most one of the purchase's two probe rows.
    pairs = pairs.select("pid", "pvalue", "channel", "tts", "tid")
    wp = Window.partitionBy("pid")
    wlast = Window.partitionBy("pid").orderBy(F.col("tts").desc(), F.col("tid").desc())
    credited = pairs.select(
        "channel",
        "pvalue",
        F.count(F.lit(1)).over(wp).cast("double").alias("n_touches"),
        (F.row_number().over(wlast) == 1).cast("int").alias("is_last"),
    )
    return credited.groupBy("channel").agg(
        F.sum("is_last").cast("long").alias("last_touch_purchases"),
        dsum_fast(
            F.when(F.col("is_last") == 1, F.col("pvalue")).otherwise(F.lit(0.0)),
            "last_touch_value",
        ),
        dsum_fast(F.col("pvalue") / F.col("n_touches"), "linear_credit"),
    )
