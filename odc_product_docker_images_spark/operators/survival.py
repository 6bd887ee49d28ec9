"""Kaplan-Meier survival estimation over user lifetimes (SURVEY.md §2.4
extension — churn/retention's principled statistical form).

Subjects are users; the EVENT is time-to-conversion — days from a user's
first activity to their first high-value purchase.  Users who never
convert inside the observation window are right-CENSORED at their last
seen day (treating them as "converted never" or dropping them are the
two classic retention-analysis mistakes KM exists to fix).

The product-limit estimator S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) turns into pure
windows by taking logs: a cumulative SUM of ln(1 − dᵢ/nᵢ) over the
duration-ordered LIFETIME TABLE (one row per distinct duration — tiny
regardless of user count), exponentiated back at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.det import (
    dec_cast,
    dround,
    dsum,
    sql_dsum,
    exact_double,
    sql_dec_cast,
    sql_dround,
    sql_exact_double,
)
from ..io import load
from ..registry import register

_CONV_VALUE = 150.0  # "high-value purchase" threshold (~45% of users convert)


@register(
    "agg_survival_curve",
    oracle=f"""
        WITH users AS (
            SELECT user_id,
                   MIN(ts) AS first_ts,
                   MAX(ts) AS last_ts,
                   MIN(CASE WHEN event_type = 'purchase'
                             AND value > CAST({_CONV_VALUE!r} AS DOUBLE)
                            THEN ts END) AS conv_ts
            FROM events
            GROUP BY user_id
        ), lifetimes AS (
            SELECT DATEDIFF('day', first_ts, COALESCE(conv_ts, last_ts)) AS t,
                   CAST(conv_ts IS NOT NULL AS INTEGER) AS churned
            FROM users
        ), by_t AS (
            SELECT t,
                   CAST(SUM(churned) AS DOUBLE) AS d,
                   CAST(COUNT(*) AS DOUBLE) AS m
            FROM lifetimes GROUP BY t
        ), risk AS (
            SELECT t, d,
                   SUM(m) OVER (ORDER BY t
                                ROWS BETWEEN CURRENT ROW
                                AND UNBOUNDED FOLLOWING) AS n
            FROM by_t
        ), terms AS (
            SELECT t, d, n,
                   CASE WHEN d < n THEN
                       {sql_dround('LN(CAST(1.0 AS DOUBLE) - d / n)')}
                   ELSE CAST(0.0 AS DOUBLE) END AS lnterm,
                   CAST(d = n AS INTEGER) AS exhausted
            FROM risk
        ), cum AS (
            SELECT t, d, n, exhausted,
                   {sql_exact_double(f"SUM({sql_dec_cast('lnterm')}) OVER (ORDER BY t)")} AS lns
            FROM terms
        )
        SELECT CAST(t AS BIGINT) AS t_days,
               CAST(n AS BIGINT) AS n_risk,
               CAST(d AS BIGINT) AS d_events,
               CASE WHEN exhausted = 1 THEN CAST(0.0 AS DOUBLE)
                    ELSE {sql_dround('EXP(lns)')} END AS survival
        FROM cum
        WHERE d > 0
    """,
)
def agg_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A24: Kaplan-Meier time-to-conversion curve (first purchase with
    value > {_CONV_VALUE}) with right-censoring of never-converting users
    at their last seen day.  One grouped pass builds user
    lifetimes; everything after runs on the per-duration table (≤ span
    days rows): the risk set nᵢ is a reverse cumulative window sum, the
    product limit is a forward cumulative window sum of ln(1−dᵢ/nᵢ), and
    survival exponentiates back.  Determinism: d and n are exact integer
    counts; each hazard term's ln rounds 6 dp (libm) BEFORE the
    decimal-exact cumulative sum; the final exp rounds 6 dp; a risk-set-
    exhausting step (d = n) pins survival to exactly 0 on both engines
    instead of feeding ln(0).  At 100 TB the only corpus-sized work is
    the per-user MIN/MAX agg — the curve itself is O(distinct durations)
    on a single small partition, the documented small-side-window move."""
    ev = load(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > F.lit(_CONV_VALUE)),
                F.col("ts"),
            )
        ).alias("conv_ts"),
    )
    lifetimes = users.select(
        F.datediff(F.coalesce("conv_ts", "last_ts"), "first_ts").alias("t"),
        F.col("conv_ts").isNotNull().cast("int").alias("churned"),
    )
    by_t = lifetimes.groupBy("t").agg(
        F.sum("churned").cast("double").alias("d"),
        F.count(F.lit(1)).cast("double").alias("m"),
    )
    wrisk = Window.orderBy("t").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    risk = by_t.select("t", "d", F.sum("m").over(wrisk).alias("n"))
    terms = risk.select(
        "t",
        "d",
        "n",
        F.when(
            F.col("d") < F.col("n"),
            dround(F.log(F.lit(1.0) - F.col("d") / F.col("n"))),
        )
        .otherwise(F.lit(0.0))
        .alias("lnterm"),
        (F.col("d") == F.col("n")).cast("int").alias("exhausted"),
    )
    wcum = Window.orderBy("t")
    cum = terms.select(
        "t",
        "d",
        "n",
        "exhausted",
        exact_double(F.sum(dec_cast("lnterm")).over(wcum)).alias("lns"),
    )
    return cum.where(F.col("d") > 0).select(
        F.col("t").cast("long").alias("t_days"),
        F.col("n").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("d_events"),
        F.when(F.col("exhausted") == 1, F.lit(0.0))
        .otherwise(dround(F.exp("lns")))
        .alias("survival"),
    )


@register(
    "agg_logrank_test",
    oracle=f"""
        WITH users AS (
            SELECT user_id, user_id % 2 AS arm,
                   MIN(ts) AS first_ts, MAX(ts) AS last_ts,
                   MIN(CASE WHEN event_type = 'purchase'
                            AND value > {_CONV_VALUE!r}
                       THEN ts END) AS conv_ts
            FROM events GROUP BY user_id
        ), lifetimes AS (
            SELECT arm,
                   DATE_DIFF('day', CAST(first_ts AS DATE),
                             CAST(COALESCE(conv_ts, last_ts) AS DATE)) AS t,
                   CAST(conv_ts IS NOT NULL AS INTEGER) AS ev
            FROM users
        ), by_at AS (
            SELECT arm, t,
                   CAST(SUM(ev) AS DOUBLE) AS d,
                   CAST(COUNT(*) AS DOUBLE) AS m
            FROM lifetimes GROUP BY arm, t
        ), risk AS (
            SELECT arm, t, d,
                   SUM(m) OVER (
                       PARTITION BY arm ORDER BY t
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS n
            FROM by_at
        ), pooled AS (
            SELECT t,
                   SUM(CASE WHEN arm = 1 THEN d ELSE 0.0 END) AS d1,
                   SUM(d) AS dt,
                   SUM(CASE WHEN arm = 1 THEN n ELSE 0.0 END) AS n1,
                   SUM(n) AS nt
            FROM risk GROUP BY t
        ), terms AS (
            SELECT t, d1,
                   dt * (n1 / nt) AS e1,
                   CASE WHEN nt > 1.0
                        THEN dt * (n1 / nt) * (1.0 - n1 / nt)
                             * (nt - dt) / (nt - 1.0)
                        ELSE 0.0 END AS v
            FROM pooled WHERE dt > 0.0
        )
        SELECT CAST(SUM(CAST(d1 AS BIGINT)) AS BIGINT) AS o1,
               {sql_dsum('e1', 'e1')},
               {sql_dsum('v', 'var1')}
        FROM terms
    """,
)
def agg_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A24+: log-rank (Mantel-Cox) test between the two arms'
    time-to-conversion curves — observed vs expected arm-1 events over
    the pooled risk sets, with the hypergeometric variance: the standard
    companion test to ``agg_survival_curve``'s KM estimate (χ² =
    (O−E)²/V against χ²₁ is the reader's last step on exact O/E/V).

    Same scale shape as the KM key: the ONLY corpus-sized work is the
    per-user MIN/MAX aggregate; risk sets are reverse-cumulative windows
    per arm and every remaining stage runs on the ≤2·span-row duration
    table.  Determinism: d/n are exact integer counts; each time's E and
    V terms are fixed IEEE chains on those integers, summed through the
    decimal path; O is an exact integer sum."""
    ev = load(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > F.lit(_CONV_VALUE)),
                F.col("ts"),
            )
        ).alias("conv_ts"),
    )
    lifetimes = users.select(
        (F.col("user_id") % 2).alias("arm"),
        F.datediff(F.coalesce("conv_ts", "last_ts"), "first_ts").alias("t"),
        F.col("conv_ts").isNotNull().cast("int").alias("ev"),
    )
    by_at = lifetimes.groupBy("arm", "t").agg(
        F.sum("ev").cast("double").alias("d"),
        F.count(F.lit(1)).cast("double").alias("m"),
    )
    wrisk = (
        Window.partitionBy("arm")
        .orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    risk = by_at.select("arm", "t", "d", F.sum("m").over(wrisk).alias("n"))
    pooled = risk.groupBy("t").agg(
        F.sum(F.when(F.col("arm") == 1, F.col("d")).otherwise(0.0)).alias("d1"),
        F.sum("d").alias("dt"),
        F.sum(F.when(F.col("arm") == 1, F.col("n")).otherwise(0.0)).alias("n1"),
        F.sum("n").alias("nt"),
    )
    frac = F.col("n1") / F.col("nt")
    terms = pooled.where(F.col("dt") > 0.0).select(
        "d1",
        (F.col("dt") * frac).alias("e1"),
        F.when(
            F.col("nt") > 1.0,
            F.col("dt")
            * frac
            * (F.lit(1.0) - frac)
            * (F.col("nt") - F.col("dt"))
            / (F.col("nt") - F.lit(1.0)),
        )
        .otherwise(F.lit(0.0))
        .alias("v"),
    )
    return terms.agg(
        F.sum(F.col("d1").cast("bigint")).cast("bigint").alias("o1"),
        dsum("e1", "e1"),
        dsum("v", "var1"),
    )
