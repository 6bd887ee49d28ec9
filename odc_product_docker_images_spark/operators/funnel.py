"""Ordered-event funnel + cohort retention (A15/A16, r5f).

The event-ledger analytics pair every product pipeline runs on its
`events` stream: (1) the ORDERED funnel — a user converts through
view → click → purchase only if each step happens strictly AFTER the
previous one (plain per-type counts overstate conversion when a
purchase precedes its view), and (2) the cohort retention matrix —
users keyed by first-seen week, activity counted per week offset.

Spark-first: both are single-scan, single-Exchange plans.  The funnel's
step times are cascaded conditional MIN windows over the user partition
(t2 = min click-time AFTER t1, t3 = min purchase-time AFTER t2 — each
window consumes the previous column, all three share one partitioning);
the rollup is a distinct-per-user aggregate over the same key.  The
cohort matrix reuses the first-seen window and shuffles (cohort, week)
cells — output is |cohorts|·|weeks|, independent of event volume.
Everything is whole-second integer arithmetic; the one ratio per row is
an exact IEEE divide of two integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.det import dec_cast, exact_double, sql_dec_cast, sql_exact_double
from ..io import load
from ..registry import register

_DAY = 86400
_WEEK = 7 * _DAY


@register(
    "agg_funnel_steps",
    oracle="""
        WITH e AS (
            SELECT user_id, event_type,
                   CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS sec
            FROM events
        ), s1 AS (
            SELECT user_id, event_type, sec,
                   MIN(CASE WHEN event_type = 'view' THEN sec END)
                       OVER (PARTITION BY user_id) AS t_view
            FROM e
        ), s2 AS (
            SELECT user_id, event_type, sec, t_view,
                   MIN(CASE WHEN event_type = 'click' AND sec > t_view
                        THEN sec END) OVER (PARTITION BY user_id) AS t_click
            FROM s1
        ), s3 AS (
            SELECT user_id, t_view, t_click,
                   MIN(CASE WHEN event_type = 'purchase' AND sec > t_click
                        THEN sec END) OVER (PARTITION BY user_id) AS t_purchase
            FROM s2
        )
        SELECT user_id, MIN(t_view) AS t_view, MIN(t_click) AS t_click,
               MIN(t_purchase) AS t_purchase,
               CAST(CASE WHEN MIN(t_view) IS NULL THEN 0 ELSE 1 END
                    + CASE WHEN MIN(t_click) IS NULL THEN 0 ELSE 1 END
                    + CASE WHEN MIN(t_purchase) IS NULL THEN 0 ELSE 1 END
                    AS INTEGER) AS stage
        FROM s3 GROUP BY user_id
    """,
)
def agg_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: strictly-ordered conversion funnel — per user, the first view,
    the first click AFTER it, the first purchase AFTER that, and the
    stage reached (0-3).  Cascaded conditional MIN windows over one user
    partitioning; integer seconds end to end."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("sec")
    )
    wp = Window.partitionBy("user_id")
    s1 = e.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("sec"))).over(wp),
    )
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("sec") > F.col("t_view")),
                F.col("sec"),
            )
        ).over(wp),
    )
    s3 = s2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("sec") > F.col("t_click")),
                F.col("sec"),
            )
        ).over(wp),
    )
    agg = s3.groupBy("user_id").agg(
        F.min("t_view").alias("t_view"),
        F.min("t_click").alias("t_click"),
        F.min("t_purchase").alias("t_purchase"),
    )
    stage = (
        F.when(F.col("t_view").isNull(), 0).otherwise(1)
        + F.when(F.col("t_click").isNull(), 0).otherwise(1)
        + F.when(F.col("t_purchase").isNull(), 0).otherwise(1)
    )
    return agg.select(
        "user_id", "t_view", "t_click", "t_purchase",
        stage.cast("int").alias("stage"),
    )


@register(
    "agg_retention_cohort",
    oracle=f"""
        WITH e AS (
            SELECT user_id,
                   CAST(FLOOR(CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT)
                        / {_WEEK}) AS BIGINT) AS week
            FROM events
        ), f AS (
            SELECT user_id, week,
                   MIN(week) OVER (PARTITION BY user_id) AS cohort_week
            FROM e
        ), a AS (
            SELECT DISTINCT user_id, cohort_week,
                   week - cohort_week AS week_offset
            FROM f
        ), c AS (
            SELECT cohort_week, COUNT(DISTINCT user_id) AS n_cohort
            FROM a WHERE week_offset = 0 GROUP BY cohort_week
        )
        SELECT a.cohort_week, a.week_offset,
               COUNT(*) AS n_active,
               MIN(c.n_cohort) AS n_cohort,
               CAST(COUNT(*) AS DOUBLE) / CAST(MIN(c.n_cohort) AS DOUBLE)
                 AS retention
        FROM a JOIN c USING (cohort_week)
        GROUP BY a.cohort_week, a.week_offset
    """,
)
def agg_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16: cohort retention matrix — users keyed by first-seen epoch
    week, distinct activity per (cohort, week offset), retention ratio vs
    the cohort size.  First-seen via one user-partition window; the cell
    rollup shuffles |cohorts|·|weeks| rows."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / F.lit(_WEEK)).cast("bigint").alias("week"),
    )
    f = e.withColumn(
        "cohort_week", F.min("week").over(Window.partitionBy("user_id"))
    )
    a = f.select(
        "user_id", "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
    ).distinct()
    # cohort size as a window over the distinct (user, cohort, offset)
    # rows: every user contributes exactly one offset-0 row, so the
    # conditional count IS the distinct-user cohort size — no join-back
    # (the agg+broadcast form duplicated the subtree: 2 scans / 5 Exch)
    wc = Window.partitionBy("cohort_week")
    a = a.withColumn(
        "n_cohort",
        F.sum(F.when(F.col("week_offset") == 0, 1).otherwise(0)).over(wc),
    )
    return (
        a.groupBy("cohort_week", "week_offset")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.min("n_cohort").alias("n_cohort"),
        )
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "n_cohort",
            (F.col("n_active").cast("double") / F.col("n_cohort").cast("double")).alias(
                "retention"
            ),
        )
    )


@register(
    "agg_cohort_ltv",
    oracle=f"""
        WITH e AS (
            SELECT user_id,
                   CAST(FLOOR(CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT)
                        / {_WEEK}) AS BIGINT) AS week,
                   CASE WHEN event_type = 'purchase' THEN value END AS rev
            FROM events
        ), f AS (
            SELECT user_id, week, rev,
                   MIN(week) OVER (PARTITION BY user_id) AS cohort_week
            FROM e
        ), u AS (
            SELECT user_id, cohort_week,
                   week - cohort_week AS week_offset,
                   SUM({sql_dec_cast('rev')}) AS rev_user
            FROM f GROUP BY user_id, cohort_week, week - cohort_week
        ), cells AS (
            SELECT cohort_week, week_offset,
                   COUNT(*) AS n_active,
                   COALESCE(SUM(rev_user),
                            CAST(0 AS DECIMAL(38,10))) AS rev_dec
            FROM u GROUP BY cohort_week, week_offset
        ), sized AS (
            SELECT cohort_week, week_offset, n_active, rev_dec,
                   CAST(SUM(CASE WHEN week_offset = 0 THEN n_active ELSE 0 END)
                       OVER (PARTITION BY cohort_week) AS BIGINT) AS n_cohort,
                   SUM(rev_dec) OVER (
                       PARTITION BY cohort_week ORDER BY week_offset
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum_dec
            FROM cells
        )
        SELECT cohort_week, week_offset, n_active, n_cohort,
               {sql_exact_double('rev_dec')} AS rev,
               {sql_exact_double('cum_dec')} AS cum_rev,
               {sql_exact_double('cum_dec')}
                   / CAST(n_cohort AS DOUBLE) AS ltv_per_user
        FROM sized
    """,
)
def agg_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16+: cohort lifetime-value curve — the revenue companion to
    ``agg_retention_cohort``: purchases bucketed by (signup cohort week,
    week offset), with the cumulative revenue per cohort and the running
    LTV per user (cum revenue / cohort size) that growth models read off
    the curve's asymptote.

    Shares the retention key's shapes: first-seen via one user-partition
    window; cohort size is the offset-0 conditional sum over the CELL
    table (every user contributes exactly one offset-0 row — no
    join-back, no subtree duplication); the cumulative sum is a
    |cohorts|·|weeks|-row window, never corpus-sized.  Revenue runs the
    decimal-exact path end to end (cell sum → cumulative window sum in
    decimal, one exact_double at the edge); the LTV divide is a single
    IEEE op on the rounded double."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / F.lit(_WEEK)).cast("bigint").alias("week"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("rev"),
    )
    f = e.withColumn(
        "cohort_week", F.min("week").over(Window.partitionBy("user_id"))
    )
    u = (
        f.groupBy(
            "user_id",
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.sum(dec_cast("rev")).alias("rev_user"))
    )
    cells = u.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.coalesce(
            F.sum("rev_user"), F.lit(0).cast("decimal(38,10)")
        ).alias("rev_dec"),
    )
    wc = Window.partitionBy("cohort_week")
    wcum = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = cells.select(
        "cohort_week",
        "week_offset",
        "n_active",
        F.sum(
            F.when(F.col("week_offset") == 0, F.col("n_active")).otherwise(0)
        ).over(wc).alias("n_cohort"),
        "rev_dec",
        F.sum("rev_dec").over(wcum).alias("cum_dec"),
    )
    cum = exact_double(F.col("cum_dec"), 6)
    return sized.select(
        "cohort_week",
        "week_offset",
        "n_active",
        "n_cohort",
        exact_double(F.col("rev_dec"), 6).alias("rev"),
        cum.alias("cum_rev"),
        (cum / F.col("n_cohort").cast("double")).alias("ltv_per_user"),
    )
