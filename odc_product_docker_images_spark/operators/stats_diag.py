"""Regression & series diagnostics (SURVEY.md §2.4 extension — the
model-quality tier past the r6d test battery: normality of residual-like
distributions, serial correlation of fitted series, variance homogeneity
across groups, lagged co-movement, spectral periodicity, and per-point
regression influence).

Reference analog: the QA notebooks around any per-pixel trend product
(§2.4 A9 `agg_linear_trend`) — before trusting a fitted slope you check
the residuals (Durbin-Watson), the distribution (Jarque-Bera), the
variance structure (Levene/Brown-Forsythe), the seasonality the trend
ignores (periodogram), and which observations dominate the fit (Cook's
distance).  The CCF key is the lead/lag companion every event pipeline
grows (does today's traffic predict tomorrow's revenue?).

Determinism discipline (functions/det.py): every cross-engine float
reduction goes through the decimal path; OLS coefficients come from
exact integer index sums (Σi, Σi² in closed form) plus decimal-exact
data sums, so both engines run identical IEEE arithmetic on identical
inputs; sqrt is correctly-rounded IEEE (no libm risk); sin/cos round
6 dp per-row before the decimal sums (the `agg_circular_mean`
convention).  Degenerate grains (n < 3, zero variance) emit NULL
statistics through CASE guards on BOTH sides rather than tripping ANSI
DIVIDE_BY_ZERO / decimal-overflow (the agg_gamma_mom failure class).

Scale notes (100 TB): the Jarque-Bera and Levene keys are single
map-side-combinable aggregates over the corpus (one shuffle on the
group key, arithmetic on a #groups-row table).  The day-series keys
(DW, CCF, periodogram, Cook's) aggregate to O(span) rows first — the
only windows over a single partition run AFTER that collapse, so the
window input is bounded by the calendar, not the corpus.  Measure
values are pre-scaled by exact powers of two into the decimal hop's
int64 domain (scale-invariant statistics — the docstrings pin each
key's row-count domain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.det import (
    dec_cast,
    dround,
    dsum,
    exact_double,
    sql_dec_cast,
    sql_dround,
    sql_dsum,
    sql_exact_double,
)
from ..io import load
from ..registry import register

# Exact power-of-two pre-scales (x/2^k is one IEEE mantissa shift — bit
# identical in both engines, and skewness/kurtosis/correlation/DW/Cook's
# are all invariant under positive linear scaling).  They exist to keep
# decimal addends inside exact_double's int64 hop (|sum| < 9.2e12 at
# nd=6) at ANY corpus size: with value < 512 the 4th-power addends stay
# < 1, so the moment sums stay < n — safe to ~9e12 rows.
_JB_SCALE = 512.0


@register(
    "agg_jarque_bera",
    oracle=f"""
        WITH s AS (
            SELECT event_type, value / CAST({_JB_SCALE!r} AS DOUBLE) AS x
            FROM events
        ), sums AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum("x", "s1")},
                   {sql_dsum("x * x", "s2")},
                   {sql_dsum("x * x * x", "s3")},
                   {sql_dsum("x * x * x * x", "s4")}
            FROM s GROUP BY event_type
        ), mom AS (
            SELECT event_type, n, s1 / n AS mu,
                   s2 / n AS r2, s3 / n AS r3, s4 / n AS r4
            FROM sums
        ), cm AS (
            SELECT event_type, n,
                   r2 - mu * mu AS m2,
                   r3 - 3 * mu * r2 + 2 * mu * mu * mu AS m3,
                   r4 - 4 * mu * r3 + 6 * mu * mu * r2
                      - 3 * mu * mu * mu * mu AS m4
            FROM mom
        ), g AS (
            SELECT event_type, n,
                   CASE WHEN m2 > CAST(0.0 AS DOUBLE)
                        THEN m3 / (m2 * SQRT(m2)) END AS g1,
                   CASE WHEN m2 > CAST(0.0 AS DOUBLE)
                        THEN m4 / (m2 * m2) - 3 END AS g2
            FROM cm
        )
        SELECT event_type, n,
               {sql_dround("g1")} AS skewness,
               {sql_dround("g2")} AS kurtosis_excess,
               {sql_dround("n / CAST(6.0 AS DOUBLE) * (g1 * g1 + g2 * g2 / 4)")}
                   AS jb_stat,
               CAST({sql_dround(
                   "n / CAST(6.0 AS DOUBLE) * (g1 * g1 + g2 * g2 / 4)"
               )} > CAST(5.991 AS DOUBLE) AS INT) AS nonnormal
        FROM g
    """,
)
def agg_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality screen per event type — skewness g1 =
    m3/m2^1.5, excess kurtosis g2 = m4/m2²−3, JB = n/6·(g1² + g2²/4)
    against the χ²₂ 5% critical value (5.991).  Central moments expand
    in RAW POWER SUMS (Σx..Σx⁴, one map-side-combinable pass — no
    mean-first second pass), each decimal-exact; m2^1.5 is written
    m2·sqrt(m2) so the whole statistic is sqrt-only IEEE (no libm pow
    risk).  Values pre-scale by 1/512 (exact; moments of 4th order stay
    sub-1 per row so the sums fit the decimal hop to ~9e12 rows).
    Zero-variance groups (degenerate grain) emit NULL via the m2 > 0
    guard on both engines."""
    ev = load(spark, sf_dir, "events")
    x = F.col("x")
    s = ev.select("event_type", (F.col("value") / F.lit(_JB_SCALE)).alias("x"))
    sums = s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum(x, "s1"),
        dsum(x * x, "s2"),
        dsum(x * x * x, "s3"),
        dsum(x * x * x * x, "s4"),
    )
    mom = sums.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mu"),
        (F.col("s2") / F.col("n")).alias("r2"),
        (F.col("s3") / F.col("n")).alias("r3"),
        (F.col("s4") / F.col("n")).alias("r4"),
    )
    mu, r2, r3, r4 = (F.col(c) for c in ("mu", "r2", "r3", "r4"))
    cm = mom.select(
        "event_type",
        "n",
        (r2 - mu * mu).alias("m2"),
        (r3 - F.lit(3) * mu * r2 + F.lit(2) * mu * mu * mu).alias("m3"),
        (
            r4
            - F.lit(4) * mu * r3
            + F.lit(6) * mu * mu * r2
            - F.lit(3) * mu * mu * mu * mu
        ).alias("m4"),
    )
    m2 = F.col("m2")
    g = cm.select(
        "event_type",
        "n",
        F.when(m2 > F.lit(0.0), F.col("m3") / (m2 * F.sqrt(m2))).alias("g1"),
        F.when(m2 > F.lit(0.0), F.col("m4") / (m2 * m2) - F.lit(3)).alias("g2"),
    )
    g1, g2 = F.col("g1"), F.col("g2")
    jb = dround(F.col("n") / F.lit(6.0) * (g1 * g1 + g2 * g2 / F.lit(4)))
    return g.select(
        "event_type",
        "n",
        dround(g1).alias("skewness"),
        dround(g2).alias("kurtosis_excess"),
        jb.alias("jb_stat"),
        (jb > F.lit(5.991)).cast("int").alias("nonnormal"),
    )


@register(
    "agg_durbin_watson",
    oracle="""
        WITH daily AS (
            SELECT event_type, DATE_TRUNC('day', ts) AS d,
                   CAST(COUNT(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2
        ), idx AS (
            SELECT event_type, d, y,
                   CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
                        - 1 AS BIGINT) AS i,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
                   CAST(SUM(y) OVER (PARTITION BY event_type) AS BIGINT) AS sy
            FROM daily
        ), xy AS (
            SELECT *, CAST(SUM(i * y) OVER (PARTITION BY event_type) AS BIGINT)
                          AS siy
            FROM idx
        ), ols AS (
            SELECT event_type, d, y, i, n, sy, siy,
                   CAST(n AS DOUBLE) AS nn,
                   CAST(n * (n - 1) AS DOUBLE) / CAST(2.0 AS DOUBLE) AS si,
                   CAST(n * (n - 1) * (2 * n - 1) AS DOUBLE)
                       / CAST(6.0 AS DOUBLE) AS si2
            FROM xy
        ), slope AS (
            SELECT event_type, d, y, i, n, sy, nn, si,
                   CASE WHEN n >= 3
                             AND nn * si2 - si * si > CAST(0.0 AS DOUBLE)
                        THEN (nn * siy - si * sy) / (nn * si2 - si * si)
                   END AS b
            FROM ols
        ), resid AS (
            SELECT event_type, d, n,
                   CAST(y AS DOUBLE) - ((sy - b * si) / nn + b * i) AS e
            FROM slope
        ), lagd AS (
            SELECT event_type, n, e,
                   LAG(e) OVER (PARTITION BY event_type ORDER BY d) AS ep
            FROM resid
        ), agg AS (
            SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_days,
    """
    + f"""
                   {sql_dsum(
                       "CASE WHEN ep IS NULL THEN NULL"
                       " ELSE (e - ep) * (e - ep) END", "num")},
                   {sql_dsum("e * e", "den")}
            FROM lagd GROUP BY event_type
        )
        SELECT event_type, n_days,
               CASE WHEN den > CAST(0.0 AS DOUBLE)
                    THEN {sql_dround("num / den")} END AS dw,
               CASE WHEN den > CAST(0.0 AS DOUBLE)
                    THEN {sql_dround(
                        "CAST(1.0 AS DOUBLE) - num / den / CAST(2.0 AS DOUBLE)"
                    )} END AS rho_lag1
        FROM agg
    """,
)
def agg_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson serial-correlation test of each event type's daily
    count series around its OLS trend — DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² (≈2 ⇒
    independent residuals; →0 ⇒ positive autocorrelation the trend's
    t-stats would overstate), plus the implied ρ̂ = 1−DW/2.  The day
    index i is a per-type ROW_NUMBER so Σi and Σi² are CLOSED FORMS
    (n(n−1)/2, n(n−1)(2n−1)/6 — exact integer-valued doubles); counts
    are exact BIGINT window sums, so the slope/intercept are identical
    IEEE on both engines and the residuals are per-row exact.  One
    corpus shuffle to (type, day), then every window shares the
    event_type partitioning (the final groupBy reuses the same
    exchange).  n < 3 or a degenerate index variance emits NULL."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    w_ord = Window.partitionBy("event_type").orderBy("d")
    w_all = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "d",
        "y",
        (F.row_number().over(w_ord) - 1).cast("long").alias("i"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
        F.sum("y").over(w_all).cast("long").alias("sy"),
    )
    xy = idx.withColumn(
        "siy", F.sum(F.col("i") * F.col("y")).over(w_all).cast("long")
    )
    n = F.col("n")
    ols = xy.select(
        "event_type",
        "d",
        "y",
        "i",
        "n",
        "sy",
        "siy",
        n.cast("double").alias("nn"),
        ((n * (n - 1)).cast("double") / F.lit(2.0)).alias("si"),
        ((n * (n - 1) * (2 * n - 1)).cast("double") / F.lit(6.0)).alias("si2"),
    )
    nn, si, si2 = F.col("nn"), F.col("si"), F.col("si2")
    slope = ols.select(
        "event_type",
        "d",
        "y",
        "i",
        "n",
        "sy",
        "nn",
        "si",
        F.when(
            (n >= 3) & (nn * si2 - si * si > F.lit(0.0)),
            (nn * F.col("siy") - si * F.col("sy")) / (nn * si2 - si * si),
        ).alias("b"),
    )
    b = F.col("b")
    resid = slope.select(
        "event_type",
        "d",
        "n",
        (
            F.col("y").cast("double")
            - ((F.col("sy") - b * si) / nn + b * F.col("i"))
        ).alias("e"),
    )
    lagd = resid.select(
        "event_type", "n", "e", F.lag("e").over(w_ord).alias("ep")
    )
    e, ep = F.col("e"), F.col("ep")
    agg = lagd.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_days"),
        dsum(F.when(ep.isNull(), None).otherwise((e - ep) * (e - ep)), "num"),
        dsum(e * e, "den"),
    )
    den_ok = F.col("den") > F.lit(0.0)
    ratio = F.col("num") / F.col("den")
    return agg.select(
        "event_type",
        "n_days",
        F.when(den_ok, dround(ratio)).alias("dw"),
        F.when(den_ok, dround(F.lit(1.0) - ratio / F.lit(2.0))).alias(
            "rho_lag1"
        ),
    )


@register(
    "agg_levene_bf",
    oracle=f"""
        WITH r AS (
            SELECT event_type, value AS x,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
            FROM events
        ), med AS (
            SELECT event_type, x,
                   MAX(CASE WHEN rn = CAST(FLOOR((n + 1) / CAST(2.0 AS DOUBLE))
                                           AS BIGINT) THEN x END)
                       OVER (PARTITION BY event_type) AS v_lo,
                   MAX(CASE WHEN rn = CAST(FLOOR(n / CAST(2.0 AS DOUBLE))
                                           AS BIGINT) + 1 THEN x END)
                       OVER (PARTITION BY event_type) AS v_hi
            FROM r
        ), z AS (
            SELECT event_type,
                   ABS(x - (v_lo + v_hi) / CAST(2.0 AS DOUBLE)) AS zv
            FROM med
        ), grp AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ng,
                   {sql_dsum("zv", "sz")},
                   {sql_dsum("zv * zv", "sz2")}
            FROM z GROUP BY event_type
        ), overall AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(ng) AS BIGINT) AS ntot,
                   {sql_dsum("sz", "tz")},
                   {sql_dsum("sz * sz / ng", "tzb")},
                   {sql_dsum("sz2 - sz * sz / ng", "ssw")}
            FROM grp
        )
        SELECT k, ntot,
               {sql_dround("tzb - tz * tz / ntot")} AS ssb,
               {sql_dround("ssw")} AS ssw,
               CASE WHEN k >= 2 AND ntot > k AND ssw > CAST(0.0 AS DOUBLE)
                    THEN {sql_dround(
                        "((tzb - tz * tz / ntot) / (k - 1))"
                        " / (ssw / (ntot - k))")} END AS f_stat,
               CASE WHEN k >= 2 AND ntot > k AND ssw > CAST(0.0 AS DOUBLE)
                    THEN CAST({sql_dround(
                        "((tzb - tz * tz / ntot) / (k - 1))"
                        " / (ssw / (ntot - k))")} > CAST(2.372 AS DOUBLE)
                        AS INT) END AS reject_equal_var
        FROM overall
    """,
)
def agg_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) homogeneity-of-variance
    test across event types — one-way ANOVA on zᵢⱼ = |xᵢⱼ − med(group)|.
    The robust companion `agg_anova_oneway` assumes away: unequal
    variances invalidate the pooled F, so this gate runs FIRST.  The
    per-group median is an EXPLICIT rank construction (row_number with a
    unique event_id tie-break; lo/hi middle positions via FLOOR under
    the integer cast on both sides, even-n average) — no reliance on
    either engine's median() interpolation.  The F statistic expands in
    per-group Σz, Σz² (decimal-exact) so SSB/SSW are identical IEEE.
    One sort-window per group + two map-side aggregates; the flag uses
    the α=.05, df1=4 (fixture's 5 groups), df2=∞ critical value 2.372.
    Degenerate grains (k<2 or zero within-group spread) emit NULL."""
    ev = load(spark, sf_dir, "events")
    w_rank = Window.partitionBy("event_type").orderBy("x", "event_id")
    w_all = Window.partitionBy("event_type")
    r = ev.select(
        "event_type", F.col("value").alias("x"), "event_id"
    ).select(
        "event_type",
        "x",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
    )
    n = F.col("n")
    lo = F.floor((n + 1) / F.lit(2.0)).cast("long")
    hi = F.floor(n / F.lit(2.0)).cast("long") + 1
    med = r.select(
        "event_type",
        "x",
        F.max(F.when(F.col("rn") == lo, F.col("x"))).over(w_all).alias("v_lo"),
        F.max(F.when(F.col("rn") == hi, F.col("x"))).over(w_all).alias("v_hi"),
    )
    z = med.select(
        "event_type",
        F.abs(
            F.col("x") - (F.col("v_lo") + F.col("v_hi")) / F.lit(2.0)
        ).alias("zv"),
    )
    zv = F.col("zv")
    grp = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        dsum(zv, "sz"),
        dsum(zv * zv, "sz2"),
    )
    sz, ng = F.col("sz"), F.col("ng")
    glob = grp.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("ntot"),
        dsum(sz, "tz"),
        dsum(sz * sz / ng, "tzb"),
        dsum(F.col("sz2") - sz * sz / ng, "ssw"),
    )
    k, ntot, tz, tzb, ssw = (
        F.col(c) for c in ("k", "ntot", "tz", "tzb", "ssw")
    )
    ok = (k >= 2) & (ntot > k) & (ssw > F.lit(0.0))
    fstat = dround(
        ((tzb - tz * tz / ntot) / (k - 1)) / (ssw / (ntot - k))
    )
    return glob.select(
        "k",
        "ntot",
        dround(tzb - tz * tz / ntot).alias("ssb"),
        dround(ssw).alias("ssw"),
        F.when(ok, fstat).alias("f_stat"),
        F.when(ok, (fstat > F.lit(2.372)).cast("int")).alias(
            "reject_equal_var"
        ),
    )


_CCF_MAX_LAG = 7

_SQL_CCF_STACK = "\n            UNION ALL ".join(
    f"SELECT CAST({k} AS BIGINT) AS lag, x, y{k} AS yk FROM leads"
    for k in range(_CCF_MAX_LAG + 1)
)


@register(
    "agg_ccf_lags",
    oracle=f"""
        WITH daily AS (
            SELECT DATE_TRUNC('day', ts) AS d,
                   CAST(COUNT(*) AS BIGINT) AS xc,
                   {sql_dsum("value", "rev")}
            FROM events GROUP BY 1
        ), s AS (
            SELECT d, CAST(xc AS DOUBLE) AS x, rev AS y
            FROM daily
        ), leads AS (
            SELECT d, x,
                   y AS y0,
                   LEAD(y, 1) OVER (ORDER BY d) AS y1,
                   LEAD(y, 2) OVER (ORDER BY d) AS y2,
                   LEAD(y, 3) OVER (ORDER BY d) AS y3,
                   LEAD(y, 4) OVER (ORDER BY d) AS y4,
                   LEAD(y, 5) OVER (ORDER BY d) AS y5,
                   LEAD(y, 6) OVER (ORDER BY d) AS y6,
                   LEAD(y, 7) OVER (ORDER BY d) AS y7
            FROM s
        ), stacked AS (
            {_SQL_CCF_STACK}
        ), pairs AS (
            SELECT lag, x, yk FROM stacked WHERE yk IS NOT NULL
        ), wstats AS (
            SELECT lag, x, yk,
                   CAST(COUNT(*) OVER (PARTITION BY lag) AS BIGINT) AS n,
                   {sql_exact_double(
                       f"SUM({sql_dec_cast('x')}) OVER (PARTITION BY lag)"
                   )} AS ex,
                   {sql_exact_double(
                       f"SUM({sql_dec_cast('yk')}) OVER (PARTITION BY lag)"
                   )} AS ey
            FROM pairs
        ), centered AS (
            SELECT lag, n,
                   CASE WHEN ex > CAST(0.0 AS DOUBLE)
                        THEN x / (ex / n) - 1 END AS cx,
                   CASE WHEN ey <> CAST(0.0 AS DOUBLE)
                        THEN yk / (ey / n) - 1 END AS cy
            FROM wstats
        ), agg AS (
            SELECT lag, CAST(MAX(n) AS BIGINT) AS n,
                   {sql_dsum("cx * cy", "sxy", 10)},
                   {sql_dsum("cx * cx", "sxx", 10)},
                   {sql_dsum("cy * cy", "syy", 10)}
            FROM centered GROUP BY lag
        )
        SELECT lag, n AS n_pairs,
               CASE WHEN sxx > CAST(0.0 AS DOUBLE)
                         AND syy > CAST(0.0 AS DOUBLE)
                    THEN {sql_dround("sxy / (SQRT(sxx) * SQRT(syy))")}
               END AS ccf
        FROM agg
    """,
)
def agg_ccf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between the daily event-count series
    and the daily revenue series at lags 0..7 — does today's traffic
    co-move with (or lead) revenue k days out?  The lead/lag companion
    to `agg_acf`: ccf(k) = corr(x_t, y_{{t+k}}) over the complete pairs.
    ONE ordered pass builds all 8 lead columns in a single window frame
    (no 8-way self-join), a stack/UNION reshapes to (lag, x, y_k) rows,
    and per-lag Pearson runs on MEAN-NORMALIZED deviations x/x̄−1 (the
    per-lag means are decimal-exact window sums divided per-row, so the
    normalization is identical IEEE on both engines).  Normalizing
    first is the determinism trick that survives any fixture magnitude:
    the raw-power-sum form n·Σxy−ΣxΣy cancels catastrophically against
    6 dp-rounded sums (0.3% error on this fixture — caught by the numpy
    replica test, not by parity, since the oracle mirrored the defect),
    while centered deviations are O(cv)≈0.05 so their nd=10 decimal
    sums keep ~8 significant digits at ANY corpus scale and the sums
    stay microscopically inside the int64 hop.  Pearson is invariant
    under the linear rescale, and the residual mean-rounding offset
    cancels to second order.  Windows run on the O(span) day table,
    never the corpus.  Zero-variance sides (degenerate grain) emit
    NULL ccf."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("xc"),
        dsum("value", "rev"),
    )
    s = daily.select(
        "d", F.col("xc").cast("double").alias("x"), F.col("rev").alias("y")
    )
    w_ord = Window.partitionBy(F.lit(0)).orderBy("d")
    leads = s.select(
        "d",
        "x",
        F.col("y").alias("y0"),
        *[
            F.lead("y", k).over(w_ord).alias(f"y{k}")
            for k in range(1, _CCF_MAX_LAG + 1)
        ],
    )
    stack_args = ", ".join(
        f"CAST({k} AS BIGINT), y{k}" for k in range(_CCF_MAX_LAG + 1)
    )
    stacked = leads.select(
        F.expr(
            f"stack({_CCF_MAX_LAG + 1}, {stack_args}) AS (lag, yk)"
        ),
        "x",
    ).select("lag", "x", "yk")
    pairs = stacked.filter(F.col("yk").isNotNull())
    w_lag = Window.partitionBy("lag")
    wstats = pairs.select(
        "lag",
        "x",
        "yk",
        F.count(F.lit(1)).over(w_lag).cast("long").alias("n"),
        exact_double(F.sum(dec_cast("x")).over(w_lag)).alias("ex"),
        exact_double(F.sum(dec_cast("yk")).over(w_lag)).alias("ey"),
    )
    n = F.col("n")
    centered = wstats.select(
        "lag",
        "n",
        F.when(
            F.col("ex") > F.lit(0.0),
            F.col("x") / (F.col("ex") / n) - F.lit(1),
        ).alias("cx"),
        F.when(
            F.col("ey") != F.lit(0.0),
            F.col("yk") / (F.col("ey") / n) - F.lit(1),
        ).alias("cy"),
    )
    cx, cy = F.col("cx"), F.col("cy")
    agg = centered.groupBy("lag").agg(
        F.max("n").cast("long").alias("n"),
        dsum(cx * cy, "sxy", 10),
        dsum(cx * cx, "sxx", 10),
        dsum(cy * cy, "syy", 10),
    )
    ok = (F.col("sxx") > F.lit(0.0)) & (F.col("syy") > F.lit(0.0))
    return agg.select(
        "lag",
        F.col("n").alias("n_pairs"),
        F.when(
            ok,
            dround(
                F.col("sxy") / (F.sqrt(F.col("sxx")) * F.sqrt(F.col("syy")))
            ),
        ).alias("ccf"),
    )


_PGRAM_K = 10
_TWO_PI = 6.283185307179586


@register(
    "agg_periodogram",
    oracle=f"""
        WITH daily AS (
            SELECT DATE_TRUNC('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS xc
            FROM events GROUP BY 1
        ), idx AS (
            SELECT xc,
                   CAST(ROW_NUMBER() OVER (ORDER BY d) - 1 AS BIGINT) AS t,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM daily
        ), terms AS (
            SELECT k, n,
                   {sql_dround(
                       f"COS(CAST({_TWO_PI!r} AS DOUBLE) * k * t / n)"
                   )} * xc AS ci,
                   {sql_dround(
                       f"SIN(CAST({_TWO_PI!r} AS DOUBLE) * k * t / n)"
                   )} * xc AS si
            FROM idx, RANGE(1, {_PGRAM_K + 1}) ks(k)
        ), agg AS (
            SELECT k, CAST(MAX(n) AS BIGINT) AS n_days,
                   {sql_dsum("ci", "c")},
                   {sql_dsum("si", "s")}
            FROM terms GROUP BY k
        )
        SELECT k, n_days,
               {sql_dround("(c * c + s * s) / n_days")} AS power,
               {sql_dround("CAST(n_days AS DOUBLE) / k")} AS period_days
        FROM agg
    """,
)
def agg_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schuster periodogram of the daily event-count series at the first
    10 (_PGRAM_K) Fourier frequencies — P(k) = (C_k² + S_k²)/N with C_k =
    Σ x_t·cos(2πkt/N) — the seasonality detector a pure trend fit
    (`agg_linear_trend`, `agg_durbin_watson`) is blind to: a weekly
    cycle in a ~30-day window peaks near k = N/7 (period_days ≈ 7).
    One day-grain aggregate, one O(span) rank window, then a k-fan-out
    (constant ×10, _PGRAM_K) and a decimal-sum per k.  Per-row cos/sin
    round 6 dp before the sums (the `agg_circular_mean` libm
    convention); 2π and the angle chain are identical double literals
    and left-associated products on both engines.  Count addends keep
    |c_i| ≤ x_t, so the sums stay in the decimal hop's domain to ~1e9
    events/day × ~3.6e3 days."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("xc")
    )
    w_ord = Window.partitionBy(F.lit(0)).orderBy("d")
    w_all = Window.partitionBy(F.lit(0))
    idx = daily.select(
        "xc",
        (F.row_number().over(w_ord) - 1).cast("long").alias("t"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
    )
    terms = idx.withColumn(
        "k", F.explode(F.sequence(F.lit(1), F.lit(_PGRAM_K)))
    ).withColumn("k", F.col("k").cast("long"))
    ang = F.lit(_TWO_PI) * F.col("k") * F.col("t") / F.col("n")
    terms = terms.select(
        "k",
        "n",
        (dround(F.cos(ang)) * F.col("xc")).alias("ci"),
        (dround(F.sin(ang)) * F.col("xc")).alias("si"),
    )
    agg = terms.groupBy("k").agg(
        F.max("n").cast("long").alias("n_days"),
        dsum("ci", "c"),
        dsum("si", "s"),
    )
    c, s_, nd = F.col("c"), F.col("s"), F.col("n_days")
    return agg.select(
        "k",
        "n_days",
        dround((c * c + s_ * s_) / nd).alias("power"),
        dround(nd.cast("double") / F.col("k")).alias("period_days"),
    )


@register(
    "agg_cooks_distance",
    oracle=f"""
        WITH daily AS (
            SELECT DATE_TRUNC('day', ts) AS d, {sql_dsum("value", "rev")}
            FROM events GROUP BY 1
        ), idx0 AS (
            SELECT d, rev,
                   CAST(ROW_NUMBER() OVER (ORDER BY d) - 1 AS BIGINT) AS t,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n,
                   {sql_exact_double(f"SUM({sql_dec_cast('rev')}) OVER ()")}
                       AS mrev
            FROM daily
        ), s AS (
            SELECT d, t, n,
                   CASE WHEN mrev > CAST(0.0 AS DOUBLE)
                        THEN rev / (mrev / n) END AS y
            FROM idx0
        ), idx AS (
            SELECT *, {sql_exact_double(
                           f"SUM({sql_dec_cast('y')}) OVER ()", 10)} AS sy
            FROM s
        ), xy AS (
            SELECT *, {sql_exact_double(
                           f"SUM({sql_dec_cast('t * y')}) OVER ()", 10)}
                          AS sty
            FROM idx
        ), ols AS (
            SELECT d, y, t, n, sy, sty,
                   CAST(n AS DOUBLE) AS nn,
                   CAST(n * (n - 1) AS DOUBLE) / CAST(2.0 AS DOUBLE) AS st,
                   CAST(n * (n - 1) * (2 * n - 1) AS DOUBLE)
                       / CAST(6.0 AS DOUBLE) AS st2
            FROM xy
        ), fit AS (
            SELECT d, y, t, n, nn, st, st2, sy,
                   CASE WHEN n >= 3
                             AND nn * st2 - st * st > CAST(0.0 AS DOUBLE)
                        THEN (nn * sty - st * sy) / (nn * st2 - st * st)
                   END AS b
            FROM ols
        ), resid AS (
            SELECT d, t, n, nn,
                   st2 - st * st / nn AS stt,
                   t - st / nn AS tc,
                   y - ((sy - b * st) / nn + b * t) AS e
            FROM fit
        ), sse_t AS (
            SELECT *, {sql_exact_double(
                          f"SUM({sql_dec_cast('e * e')}) OVER ()", 10)} AS sse
            FROM resid
        ), lev AS (
            SELECT d, t, n, nn, e, sse,
                   CASE WHEN stt > CAST(0.0 AS DOUBLE)
                        THEN 1 / nn + tc * tc / stt END AS h
            FROM sse_t
        )
        SELECT d, t,
               {sql_dround("h")} AS leverage,
               CASE WHEN n >= 4 AND sse > CAST(0.0 AS DOUBLE)
                         AND h IS NOT NULL AND h < CAST(1.0 AS DOUBLE)
                    THEN {sql_dround(
                        "e * e * h / (2 * (sse / (nn - 2))"
                        " * (1 - h) * (1 - h))")} END AS cooks_d,
               CASE WHEN n >= 4 AND sse > CAST(0.0 AS DOUBLE)
                         AND h IS NOT NULL AND h < CAST(1.0 AS DOUBLE)
                    THEN CAST({sql_dround(
                        "e * e * h / (2 * (sse / (nn - 2))"
                        " * (1 - h) * (1 - h))")}
                        > CAST(4.0 AS DOUBLE) / nn AS INT) END AS influential
        FROM lev
    """,
)
def agg_cooks_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cook's distance of every day in the daily-revenue-vs-time OLS fit
    — D_t = e_t²·h_t / (p·s²·(1−h_t)²) with p = 2 and leverage h_t =
    1/n + (t−t̄)²/S_tt: which single days dominate the fitted trend
    (flag D > 4/n, the standard screen).  The influence diagnostic that
    belongs next to every `agg_linear_trend`-style product.  Same
    exact-OLS scaffold as `agg_durbin_watson` (closed-form index sums,
    window-shared over ONE O(span) single-partition series — the corpus
    collapses to day grain first).  The revenue series MEAN-NORMALIZES
    first (y = rev/mean, mean = decimal-exact window sum ÷ n, identical
    IEEE both sides): Cook's D is invariant under the rescale, residual
    magnitudes become O(cv) at any fixture size, and the nd=10 decimal
    sums of y/t·y/e² keep ~8 significant digits where a fixed-constant
    pre-scale quantized SSE to 1-2 digits on small fixtures (the
    agg_ccf_lags cancellation lesson — caught by the numpy replica, not
    parity).  n < 4, zero SSE, or h = 1 (a two-point fit's endpoints)
    emit NULL via identical guards."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        dsum("value", "rev")
    )
    w_ord = Window.partitionBy(F.lit(0)).orderBy("d")
    w_all = Window.partitionBy(F.lit(0))
    idx0 = daily.select(
        "d",
        "rev",
        (F.row_number().over(w_ord) - 1).cast("long").alias("t"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
        exact_double(F.sum(dec_cast("rev")).over(w_all)).alias("mrev"),
    )
    n = F.col("n")
    s = idx0.select(
        "d",
        "t",
        "n",
        F.when(
            F.col("mrev") > F.lit(0.0),
            F.col("rev") / (F.col("mrev") / n),
        ).alias("y"),
    )
    idx = s.withColumn(
        "sy", exact_double(F.sum(dec_cast("y")).over(w_all), 10)
    )
    xy = idx.withColumn(
        "sty",
        exact_double(F.sum(dec_cast(F.col("t") * F.col("y"))).over(w_all), 10),
    )
    ols = xy.select(
        "d",
        "y",
        "t",
        "n",
        "sy",
        "sty",
        n.cast("double").alias("nn"),
        ((n * (n - 1)).cast("double") / F.lit(2.0)).alias("st"),
        ((n * (n - 1) * (2 * n - 1)).cast("double") / F.lit(6.0)).alias("st2"),
    )
    nn, st, st2 = F.col("nn"), F.col("st"), F.col("st2")
    fit = ols.select(
        "d",
        "y",
        "t",
        "n",
        "nn",
        "st",
        "st2",
        "sy",
        F.when(
            (n >= 3) & (nn * st2 - st * st > F.lit(0.0)),
            (nn * F.col("sty") - st * F.col("sy")) / (nn * st2 - st * st),
        ).alias("b"),
    )
    b = F.col("b")
    resid = fit.select(
        "d",
        "t",
        "n",
        "nn",
        (st2 - st * st / nn).alias("stt"),
        (F.col("t") - st / nn).alias("tc"),
        (F.col("y") - ((F.col("sy") - b * st) / nn + b * F.col("t"))).alias(
            "e"
        ),
    )
    sse_t = resid.withColumn(
        "sse",
        exact_double(F.sum(dec_cast(F.col("e") * F.col("e"))).over(w_all), 10),
    )
    lev = sse_t.select(
        "d",
        "t",
        "n",
        "nn",
        "e",
        "sse",
        F.when(
            F.col("stt") > F.lit(0.0),
            F.lit(1) / F.col("nn") + F.col("tc") * F.col("tc") / F.col("stt"),
        ).alias("h"),
    )
    e, h, sse = F.col("e"), F.col("h"), F.col("sse")
    ok = (
        (n >= 4)
        & (sse > F.lit(0.0))
        & h.isNotNull()
        & (h < F.lit(1.0))
    )
    dcol = dround(
        e * e * h / (F.lit(2) * (sse / (nn - F.lit(2))) * (F.lit(1) - h) * (F.lit(1) - h))
    )
    return lev.select(
        "d",
        "t",
        dround(h).alias("leverage"),
        F.when(ok, dcol).alias("cooks_d"),
        F.when(ok, (dcol > F.lit(4.0) / nn).cast("int")).alias("influential"),
    )


@register(
    "agg_seasonal_mann_kendall",
    oracle="""
        WITH daily AS (
            SELECT DATE_TRUNC('day', ts) AS d,
                   CAST(ISODOW(DATE_TRUNC('day', ts)) AS BIGINT) AS season,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ), p AS (
            SELECT a.season AS season,
                   CASE WHEN b.x > a.x THEN 1
                        WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn
            FROM daily a JOIN daily b
              ON a.season = b.season AND a.d < b.d
        ), per AS (
            SELECT season, CAST(SUM(sgn) AS BIGINT) AS s_season,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM p GROUP BY season
        ), nobs AS (
            SELECT season, CAST(COUNT(*) AS BIGINT) AS n_days
            FROM daily GROUP BY season
        ), j AS (
            SELECT n.season, n.n_days,
                   COALESCE(per.s_season, 0) AS s_season,
                   COALESCE(per.n_pairs, 0) AS n_pairs,
                   n.n_days * (n.n_days - 1)
                       * (2 * n.n_days + 5) / CAST(18.0 AS DOUBLE) AS var_s
            FROM nobs n LEFT JOIN per ON per.season = n.season
        ), tot AS (
            SELECT season, n_days, s_season, n_pairs, var_s,
                   CAST(SUM(s_season) OVER () AS BIGINT) AS s_total,
                   SUM(var_s) OVER () AS var_total
            FROM j
        )
        SELECT season, n_days, s_season, n_pairs, s_total,
    """
    + f"""
               CASE WHEN var_total > CAST(0.0 AS DOUBLE)
                    THEN {sql_dround(
                        "(CASE WHEN s_total > 0 THEN s_total - 1"
                        " WHEN s_total < 0 THEN s_total + 1 ELSE 0 END)"
                        " / SQRT(var_total)")} END AS z_total
        FROM tot
    """,
)
def agg_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall trend test of the daily count series with
    day-of-week seasons (Hirsch-Slack): the MK S statistic runs WITHIN
    each weekday's sub-series (Mondays vs Mondays), so a weekly cycle
    can't masquerade as (or mask) a monotone trend — the robust-trend
    companion to `agg_mann_kendall` for strongly seasonal telemetry.
    S_total = ΣS_season, Var = Σn(n−1)(2n+5)/18 (no-tie form; count
    ties contribute 0 to S), Z with the ±1 continuity correction —
    exact integers until the final division.  The corpus collapses to
    the O(span) day table which is PERSISTED before the within-season
    pairwise self-join (pairs ≈ span²/14: both join inputs read the one
    cached aggregate, not the corpus twice), and each output row carries
    the overall Z via a window over the 7-row season table."""
    ev = load(spark, sf_dir, "events")
    d = F.date_trunc("day", "ts")
    daily = (
        ev.groupBy(
            d.alias("d"),
            F.dayofweek(d).cast("long").alias("dow_raw"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
        # Spark dayofweek: 1=Sunday..7=Saturday; ISODOW: 1=Monday..7=Sunday
        .select(
            "d",
            "x",
            F.when(F.col("dow_raw") == 1, F.lit(7))
            .otherwise(F.col("dow_raw") - 1)
            .cast("long")
            .alias("season"),
        )
        .persist()
    )
    a, b = daily.alias("a"), daily.alias("b")
    p = a.join(
        b,
        (F.col("a.season") == F.col("b.season")) & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.season").alias("season"),
        F.when(F.col("b.x") > F.col("a.x"), 1)
        .when(F.col("b.x") < F.col("a.x"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    per = p.groupBy("season").agg(
        F.sum("sgn").cast("long").alias("s_season"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    nobs = daily.groupBy("season").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    nd = F.col("n_days")
    j = nobs.join(per, "season", "left").select(
        "season",
        "n_days",
        F.coalesce(F.col("s_season"), F.lit(0)).alias("s_season"),
        F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
        (nd * (nd - 1) * (2 * nd + 5) / F.lit(18.0)).alias("var_s"),
    )
    w_all = Window.partitionBy(F.lit(0))
    tot = j.select(
        "season",
        "n_days",
        "s_season",
        "n_pairs",
        F.sum("s_season").over(w_all).cast("long").alias("s_total"),
        F.sum("var_s").over(w_all).alias("var_total"),
    )
    st = F.col("s_total")
    cc = (
        F.when(st > 0, st - 1).when(st < 0, st + 1).otherwise(0)
    )
    return tot.select(
        "season",
        "n_days",
        "s_season",
        "n_pairs",
        "s_total",
        F.when(
            F.col("var_total") > F.lit(0.0),
            dround(cc / F.sqrt(F.col("var_total"))),
        ).alias("z_total"),
    )


_PACF_SQL_RHO = """
        WITH series AS (
            SELECT DATE_TRUNC('day', ts) AS d,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ), stats AS (
            SELECT d, x,
                   CAST(SUM(x) OVER () AS DOUBLE)
                       / CAST(COUNT(*) OVER () AS DOUBLE) AS mu,
                   LEAD(x, 1) OVER w AS x1, LEAD(x, 2) OVER w AS x2,
                   LEAD(x, 3) OVER w AS x3
            FROM series
            WINDOW w AS (ORDER BY d)
        ), dev AS (
            SELECT d, mu, x - mu AS dv,
                   {den} AS den,
                   x1, x2, x3
            FROM stats
        ), rho AS (
            SELECT
                {r1} AS r1,
                {r2} AS r2,
                {r3} AS r3
            FROM dev
        )
"""


def _pacf_sql() -> str:
    den = sql_exact_double(
        "SUM(" + sql_dec_cast("(x - mu) * (x - mu)") + ") OVER ()"
    )
    def rk(col: str) -> str:
        return (
            "CASE WHEN MAX(den) > CAST(0.0 AS DOUBLE) THEN "
            + sql_dround(
                sql_exact_double(
                    "SUM(" + sql_dec_cast(f"dv * ({col} - mu)") + ")"
                )
                + " / MAX(den)"
            )
            + " END"
        )
    body = _PACF_SQL_RHO.format(den=den, r1=rk("x1"), r2=rk("x2"), r3=rk("x3"))
    return (
        body
        + """
        , dl AS (
            SELECT r1, r2, r3,
                   CASE WHEN 1 - r1 * r1 <> CAST(0.0 AS DOUBLE)
                        THEN (r2 - r1 * r1) / (1 - r1 * r1) END AS p22
            FROM rho
        ), dl2 AS (
            SELECT r1, r2, r3, p22,
                   r1 * (1 - p22) AS p21
            FROM dl
        ), dl3 AS (
            SELECT r1, p22,
                   CASE WHEN 1 - p21 * r1 - p22 * r2 <> CAST(0.0 AS DOUBLE)
                        THEN (r3 - p21 * r2 - p22 * r1)
                            / (1 - p21 * r1 - p22 * r2) END AS p33
            FROM dl2
        )
        SELECT CAST(1 AS BIGINT) AS lag, {a1} AS pacf FROM dl3
        UNION ALL
        SELECT CAST(2 AS BIGINT), {a2} FROM dl3
        UNION ALL
        SELECT CAST(3 AS BIGINT), {a3} FROM dl3
    """.format(
            a1=sql_dround("r1"), a2=sql_dround("p22"), a3=sql_dround("p33")
        )
    )


@register("agg_pacf", oracle=_pacf_sql())
def agg_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily count series at lags 1-3 via
    the closed-form Durbin-Levinson recursion — the AR-order picker that
    `agg_acf` can't be (ACF of an AR(1) decays across ALL lags; PACF
    cuts off after the true order): φ₁₁=ρ₁, φ₂₂=(ρ₂−ρ₁²)/(1−ρ₁²),
    φ₃₃ from the level-2 coefficients.  The ρ_k are computed exactly as
    `agg_acf` does (exact int/int mean, IEEE deviation products, decimal
    sums, 6 dp) and the recursion is pure double algebra on those
    identical rounded inputs — no new determinism surface.  One corpus
    day-count aggregate, constant-offset LEADs over the O(span) series,
    a 1-row algebra chain, and a 3-row unpivot."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    w_ord = Window.partitionBy(F.lit(0)).orderBy("d")
    w_all = Window.partitionBy(F.lit(0))
    stats = daily.select(
        "d",
        "x",
        (
            F.sum("x").over(w_all).cast("double")
            / F.count(F.lit(1)).over(w_all).cast("double")
        ).alias("mu"),
        F.lead("x", 1).over(w_ord).alias("x1"),
        F.lead("x", 2).over(w_ord).alias("x2"),
        F.lead("x", 3).over(w_ord).alias("x3"),
    )
    mu = F.col("mu")
    dev = stats.select(
        "mu",
        (F.col("x") - mu).alias("dv"),
        exact_double(
            F.sum(dec_cast((F.col("x") - mu) * (F.col("x") - mu))).over(w_all)
        ).alias("den"),
        "x1",
        "x2",
        "x3",
    )

    def rk(col: str):
        return F.when(
            F.max("den") > F.lit(0.0),
            dround(
                exact_double(F.sum(dec_cast(F.col("dv") * (F.col(col) - mu))))
                / F.max("den")
            ),
        )

    rho = dev.agg(rk("x1").alias("r1"), rk("x2").alias("r2"), rk("x3").alias("r3"))
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    dl = rho.select(
        "r1", "r2", "r3",
        F.when(
            F.lit(1) - r1 * r1 != F.lit(0.0),
            (r2 - r1 * r1) / (F.lit(1) - r1 * r1),
        ).alias("p22"),
    )
    p22 = F.col("p22")
    dl2 = dl.select("r1", "r2", "r3", "p22", (r1 * (F.lit(1) - p22)).alias("p21"))
    p21 = F.col("p21")
    dl3 = dl2.select(
        "r1",
        "p22",
        F.when(
            F.lit(1) - p21 * r1 - p22 * r2 != F.lit(0.0),
            (r3 - p21 * r2 - p22 * r1)
            / (F.lit(1) - p21 * r1 - p22 * r2),
        ).alias("p33"),
    )
    out = dl3.select(
        F.expr(
            "stack(3, CAST(1 AS BIGINT), r1,"
            " CAST(2 AS BIGINT), p22,"
            " CAST(3 AS BIGINT), p33) AS (lag, raw)"
        )
    )
    return out.select("lag", dround(F.col("raw")).alias("pacf"))


@register(
    "agg_grubbs_outlier",
    oracle=f"""
        WITH s AS (
            SELECT event_type, value,
                   value / CAST(512.0 AS DOUBLE) AS x
            FROM events
        ), w AS (
            SELECT event_type, value, x,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
                   {sql_exact_double(
                       f"SUM({sql_dec_cast('x')})"
                       " OVER (PARTITION BY event_type)")} AS s1,
                   {sql_exact_double(
                       f"SUM({sql_dec_cast('x * x')})"
                       " OVER (PARTITION BY event_type)")} AS s2
            FROM s
        ), devd AS (
            SELECT event_type, value, n, s1, s2,
                   ABS(x - s1 / n) AS adev
            FROM w
        ), mx AS (
            SELECT event_type, value, n, s1, s2, adev,
                   MAX(adev) OVER (PARTITION BY event_type) AS maxdev
            FROM devd
        )
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS n,
               {sql_dround(
                   "MAX(CASE WHEN n >= 3"
                   " AND (s2 - s1 * s1 / n) / (n - 1) > CAST(0.0 AS DOUBLE)"
                   " THEN maxdev / SQRT((s2 - s1 * s1 / n) / (n - 1)) END)"
               )} AS g_stat,
               MAX(CASE WHEN adev = maxdev THEN value END) AS outlier_value,
               CAST({sql_dround(
                   "MAX(CASE WHEN n >= 3"
                   " AND (s2 - s1 * s1 / n) / (n - 1) > CAST(0.0 AS DOUBLE)"
                   " THEN maxdev / SQRT((s2 - s1 * s1 / n) / (n - 1)) END)"
               )} > CAST(4.0 AS DOUBLE) AS INT) AS flagged
        FROM mx GROUP BY event_type
    """,
)
def agg_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs-style maximum-studentized-deviation screen per event type
    — G = max|x−x̄|/s and the value achieving it: the single-outlier
    detector run before any mean-based statistic (a fat-fingered 1e9
    reading moves `agg_mean` arbitrarily; G names the culprit).  The
    flag uses a fixed G > 4 screen (the exact Grubbs critical value
    needs a t-quantile — out of SQL scope; at the fixture's n≈2000 the
    α=.05 critical is ≈3.9, so 4 is the conservative round number,
    documented rather than approximated).  Values pre-scale by 1/512
    (G is scale-invariant; the `agg_jarque_bera` decimal-domain trick),
    mean/variance come from decimal-exact window power sums, the argmax
    value resolves through an adev = maxdev equality on identical IEEE
    doubles with MAX as the tie-break.  One corpus window pass + one
    aggregate, both on the event_type partitioning."""
    ev = load(spark, sf_dir, "events")
    s = ev.select(
        "event_type", "value", (F.col("value") / F.lit(512.0)).alias("x")
    )
    w_all = Window.partitionBy("event_type")
    x = F.col("x")
    w = s.select(
        "event_type",
        "value",
        "x",
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
        exact_double(F.sum(dec_cast("x")).over(w_all)).alias("s1"),
        exact_double(F.sum(dec_cast(x * x)).over(w_all)).alias("s2"),
    )
    devd = w.select(
        "event_type",
        "value",
        "n",
        "s1",
        "s2",
        F.abs(x - F.col("s1") / F.col("n")).alias("adev"),
    )
    mx = devd.select(
        "*", F.max("adev").over(w_all).alias("maxdev")
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    var = (s2 - s1 * s1 / n) / (n - 1)
    g = dround(
        F.max(
            F.when(
                (n >= 3) & (var > F.lit(0.0)),
                F.col("maxdev") / F.sqrt(var),
            )
        )
    )
    return mx.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        g.alias("g_stat"),
        F.max(
            F.when(F.col("adev") == F.col("maxdev"), F.col("value"))
        ).alias("outlier_value"),
        (g > F.lit(4.0)).cast("int").alias("flagged"),
    )


@register(
    "agg_friedman_test",
    oracle=f"""
        WITH cells AS (
            SELECT DATE_TRUNC('day', ts) AS d, event_type,
                   CAST(COUNT(*) AS BIGINT) AS cnt,
                   {sql_exact_double(f"SUM({sql_dec_cast('value')})")} AS sv
            FROM events GROUP BY 1, 2
        ), cm AS (
            SELECT d, event_type, sv / cnt AS m
            FROM cells
        ), dr AS (
            SELECT d, event_type, m,
                   DENSE_RANK() OVER (ORDER BY event_type) AS tr,
                   CAST(COUNT(*) OVER (PARTITION BY d) AS BIGINT) AS kd
            FROM cm
        ), kk AS (
            SELECT d, event_type, m, kd,
                   MAX(tr) OVER () AS k
            FROM dr
        ), complete AS (
            SELECT d, event_type, m, CAST(k AS BIGINT) AS k
            FROM kk WHERE kd = k
        ), ranked AS (
            SELECT d, event_type, k,
                   RANK() OVER (PARTITION BY d ORDER BY m)
                       + (CAST(COUNT(*) OVER (PARTITION BY d, m) AS BIGINT) - 1)
                           / CAST(2.0 AS DOUBLE) AS r
            FROM complete
        ), per AS (
            SELECT event_type, CAST(MAX(k) AS BIGINT) AS k,
                   CAST(COUNT(*) AS BIGINT) AS nb,
                   SUM(r) AS rj
            FROM ranked GROUP BY event_type
        ), tot AS (
            SELECT CAST(MAX(k) AS BIGINT) AS k,
                   CAST(MAX(nb) AS BIGINT) AS n_blocks,
                   SUM(rj * rj) AS srj2
            FROM per
        )
        SELECT k, n_blocks,
               CASE WHEN k >= 2 AND n_blocks >= 2
                    THEN {sql_dround(
                        "12 / (n_blocks * k * (k + CAST(1.0 AS DOUBLE)))"
                        " * srj2 - 3 * n_blocks * (k + 1)")} END AS chi2_f,
               CASE WHEN k >= 2 AND n_blocks >= 2
                    THEN CAST({sql_dround(
                        "12 / (n_blocks * k * (k + CAST(1.0 AS DOUBLE)))"
                        " * srj2 - 3 * n_blocks * (k + 1)")}
                        > CAST(9.488 AS DOUBLE) AS INT) END AS reject
        FROM tot
    """,
)
def agg_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test — do the event types differ in mean value once
    DAY effects are blocked out?  The nonparametric repeated-measures
    ANOVA: within each complete day-block the k type means are ranked
    (average ranks on ties), and χ²F = 12/(nk(k+1))·ΣR_j² − 3n(k+1)
    against χ²₄ 5% (9.488 at the fixture's k=5).  Complements
    `agg_kruskal_wallis` (which ignores blocks) exactly as a paired
    t-test complements the two-sample one.  One corpus (day, type)
    aggregate; k discovers itself via a dense-rank window (no second
    corpus branch), incomplete blocks drop, tie-averaged ranks use the
    RANK()+(ties−1)/2 identity, and every rank sum is an exact multiple
    of 0.5 (order-insensitive double addition — no decimal path needed).
    The cell means are decimal-exact sums over exact counts, so rank
    ORDER is identical across engines."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.date_trunc("day", "ts").alias("d"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        exact_double(F.sum(dec_cast("value"))).alias("sv"),
    )
    cm = cells.select(
        "d", "event_type", (F.col("sv") / F.col("cnt")).alias("m")
    )
    w_type = Window.partitionBy(F.lit(0)).orderBy("event_type")
    w_all = Window.partitionBy(F.lit(0))
    w_d = Window.partitionBy("d")
    dr = cm.select(
        "d",
        "event_type",
        "m",
        F.dense_rank().over(w_type).alias("tr"),
        F.count(F.lit(1)).over(w_d).cast("long").alias("kd"),
    )
    kk = dr.select(
        "d", "event_type", "m", "kd", F.max("tr").over(w_all).alias("k")
    )
    complete = kk.filter(F.col("kd") == F.col("k")).select(
        "d", "event_type", "m", F.col("k").cast("long").alias("k")
    )
    w_rank = Window.partitionBy("d").orderBy("m")
    w_tie = Window.partitionBy("d", "m")
    ranked = complete.select(
        "d",
        "event_type",
        "k",
        (
            F.rank().over(w_rank)
            + (F.count(F.lit(1)).over(w_tie).cast("long") - 1) / F.lit(2.0)
        ).alias("r"),
    )
    per = ranked.groupBy("event_type").agg(
        F.max("k").cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("r").alias("rj"),
    )
    tot = per.agg(
        F.max("k").cast("long").alias("k"),
        F.max("nb").cast("long").alias("n_blocks"),
        F.sum(F.col("rj") * F.col("rj")).alias("srj2"),
    )
    k, nb = F.col("k"), F.col("n_blocks")
    ok = (k >= 2) & (nb >= 2)
    chi2 = dround(
        F.lit(12) / (nb * k * (k + F.lit(1.0))) * F.col("srj2")
        - F.lit(3) * nb * (k + F.lit(1))
    )
    return tot.select(
        "k",
        "n_blocks",
        F.when(ok, chi2).alias("chi2_f"),
        F.when(ok, (chi2 > F.lit(9.488)).cast("int")).alias("reject"),
    )


_BOLL_W = 7  # rolling window, days


@register(
    "window_bollinger",
    oracle=f"""
        WITH daily AS (
            SELECT DATE_TRUNC('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ), framed AS (
            SELECT d, x,
                   CAST(COUNT(*) OVER w AS BIGINT) AS nf,
                   {sql_exact_double(f"SUM({sql_dec_cast('CAST(x AS DOUBLE)')}) OVER w")}
                       AS fs1,
                   {sql_exact_double(
                       f"SUM({sql_dec_cast('CAST(x AS DOUBLE) * CAST(x AS DOUBLE)')}) OVER w"
                   )} AS fs2
            FROM daily
            WINDOW w AS (ORDER BY d ROWS BETWEEN {_BOLL_W - 1} PRECEDING
                         AND CURRENT ROW)
        ), bands AS (
            SELECT d, x, nf,
                   fs1 / nf AS mid,
                   CASE WHEN nf >= 2 THEN
                       SQRT(GREATEST(CAST(0.0 AS DOUBLE),
                            (fs2 - fs1 * fs1 / nf) / (nf - 1))) END AS sd
            FROM framed
        )
        SELECT d, x, nf,
               {sql_dround("mid")} AS mid,
               {sql_dround("mid + 2 * sd")} AS upper_band,
               {sql_dround("mid - 2 * sd")} AS lower_band,
               CASE WHEN sd IS NULL THEN NULL
                    WHEN x > {sql_dround("mid + 2 * sd")} THEN 1
                    WHEN x < {sql_dround("mid - 2 * sd")} THEN -1
                    ELSE 0 END AS breakout
        FROM bands
    """,
)
def window_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over the daily count series — 7-day (_BOLL_W) rolling
    mean ± 2 rolling standard deviations, with a breakout flag (+1 above,
    −1 below): the volatility-adaptive anomaly envelope that a fixed
    z-score (`window_seasonal_zscore`) can't be when local variance
    drifts.  The frame statistics are DECIMAL-EXACT framed window sums
    (Σx, Σx² over the row frame — the det.py framed-window contract is
    hypothesis-fuzzed), so mid/sd are identical IEEE on both engines;
    the flag compares the integer count to the 6 dp-rounded bands.
    Corpus collapses to the O(span) day table before the single ordered
    window; negative variance from the rounded-sum difference clamps to
    zero via GREATEST on both sides.  Count-squared addends bound the
    decimal hop at ~1e6 events/day (3e6/day at the 1000× replica tier
    is the first fixture that would need the `agg_ccf_lags`
    mean-normalize form instead)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy("d")
        .rowsBetween(-(_BOLL_W - 1), Window.currentRow)
    )
    xd = F.col("x").cast("double")
    framed = daily.select(
        "d",
        "x",
        F.count(F.lit(1)).over(w).cast("long").alias("nf"),
        exact_double(F.sum(dec_cast(xd)).over(w)).alias("fs1"),
        exact_double(F.sum(dec_cast(xd * xd)).over(w)).alias("fs2"),
    )
    nf, fs1, fs2 = F.col("nf"), F.col("fs1"), F.col("fs2")
    bands = framed.select(
        "d",
        "x",
        "nf",
        (fs1 / nf).alias("mid"),
        F.when(
            nf >= 2,
            F.sqrt(
                F.greatest(
                    F.lit(0.0), (fs2 - fs1 * fs1 / nf) / (nf - 1)
                )
            ),
        ).alias("sd"),
    )
    mid, sd = F.col("mid"), F.col("sd")
    upper = dround(mid + F.lit(2) * sd)
    lower = dround(mid - F.lit(2) * sd)
    return bands.select(
        "d",
        "x",
        "nf",
        dround(mid).alias("mid"),
        upper.alias("upper_band"),
        lower.alias("lower_band"),
        F.when(sd.isNull(), F.lit(None).cast("int"))
        .when(F.col("x") > upper, 1)
        .when(F.col("x") < lower, -1)
        .otherwise(0)
        .alias("breakout"),
    )


@register(
    "agg_two_proportion_ztest",
    oracle=f"""
        WITH c AS (
            SELECT CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN user_id % 2 = 1
                                 AND event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS BIGINT) AS x1,
                   CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n0,
                   CAST(SUM(CASE WHEN user_id % 2 = 0
                                 AND event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS BIGINT) AS x0
            FROM events
        ), p AS (
            SELECT n1, x1, n0, x0,
                   x1 / NULLIF(CAST(n1 AS DOUBLE), CAST(0.0 AS DOUBLE)) AS p1,
                   x0 / NULLIF(CAST(n0 AS DOUBLE), CAST(0.0 AS DOUBLE)) AS p0,
                   (x1 + x0) / NULLIF(CAST(n1 + n0 AS DOUBLE),
                                      CAST(0.0 AS DOUBLE)) AS pp
            FROM c
        )
        SELECT n1, x1, n0, x0,
               CASE WHEN n1 > 0 THEN {sql_dround("p1")} END AS rate_treat,
               CASE WHEN n0 > 0 THEN {sql_dround("p0")} END AS rate_control,
               CASE WHEN n1 > 0 AND n0 > 0
                         AND pp > CAST(0.0 AS DOUBLE)
                         AND pp < CAST(1.0 AS DOUBLE)
                    THEN {sql_dround(
                        "(p1 - p0) / NULLIF(SQRT(pp * (1 - pp)"
                        " * (1 / NULLIF(CAST(n1 AS DOUBLE), CAST(0.0 AS DOUBLE))"
                        " + 1 / NULLIF(CAST(n0 AS DOUBLE),"
                        " CAST(0.0 AS DOUBLE)))), CAST(0.0 AS DOUBLE))")}
                    END AS z_stat,
               CASE WHEN n1 > 0 AND n0 > 0
                         AND pp > CAST(0.0 AS DOUBLE)
                         AND pp < CAST(1.0 AS DOUBLE)
                    THEN CAST(ABS({sql_dround(
                        "(p1 - p0) / NULLIF(SQRT(pp * (1 - pp)"
                        " * (1 / NULLIF(CAST(n1 AS DOUBLE), CAST(0.0 AS DOUBLE))"
                        " + 1 / NULLIF(CAST(n0 AS DOUBLE),"
                        " CAST(0.0 AS DOUBLE)))), CAST(0.0 AS DOUBLE))")})
                        > CAST(1.96 AS DOUBLE) AS INT) END AS significant
        FROM p
    """,
)
def agg_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test of purchase conversion between the
    user_id-parity arms — the workhorse binary-outcome experiment test
    that `agg_ttest_welch` (continuous outcomes) and `agg_srm_check`
    (allocation sanity) bracket: z = (p̂₁−p̂₀)/√(p̂(1−p̂)(1/n₁+1/n₀))
    against ±1.96.  One map-side-combinable conditional-count pass;
    exact integer cells make every ratio a single IEEE division, and a
    degenerate arm (empty, or all/no conversions pooled) emits NULL via
    identical guards on both engines."""
    ev = load(spark, sf_dir, "events")
    t1 = (F.col("user_id") % 2 == 1).cast("int")
    t0 = (F.col("user_id") % 2 == 0).cast("int")
    conv = (F.col("event_type") == "purchase").cast("int")
    c = ev.agg(
        F.sum(t1).cast("long").alias("n1"),
        F.sum(t1 * conv).cast("long").alias("x1"),
        F.sum(t0).cast("long").alias("n0"),
        F.sum(t0 * conv).cast("long").alias("x0"),
    )
    n1, x1, n0, x0 = (F.col(c_) for c_ in ("n1", "x1", "n0", "x0"))
    p = c.select(
        "n1",
        "x1",
        "n0",
        "x0",
        (x1 / F.nullif(n1.cast("double"), F.lit(0.0))).alias("p1"),
        (x0 / F.nullif(n0.cast("double"), F.lit(0.0))).alias("p0"),
        (
            (x1 + x0) / F.nullif((n1 + n0).cast("double"), F.lit(0.0))
        ).alias("pp"),
    )
    p1, p0, pp = F.col("p1"), F.col("p0"), F.col("pp")
    ok = (n1 > 0) & (n0 > 0) & (pp > F.lit(0.0)) & (pp < F.lit(1.0))
    z = dround(
        (p1 - p0)
        / F.nullif(
            F.sqrt(
                pp
                * (F.lit(1) - pp)
                * (
                    F.lit(1) / F.nullif(n1.cast("double"), F.lit(0.0))
                    + F.lit(1) / F.nullif(n0.cast("double"), F.lit(0.0))
                )
            ),
            F.lit(0.0),
        )
    )
    return p.select(
        "n1",
        "x1",
        "n0",
        "x0",
        F.when(n1 > 0, dround(p1)).alias("rate_treat"),
        F.when(n0 > 0, dround(p0)).alias("rate_control"),
        F.when(ok, z).alias("z_stat"),
        F.when(ok, (F.abs(z) > F.lit(1.96)).cast("int")).alias("significant"),
    )


@register(
    "agg_partial_corr",
    oracle=f"""
        WITH daily AS (
            SELECT DATE_TRUNC('day', ts) AS d,
                   CAST(COUNT(*) AS BIGINT) AS xc,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS zc,
                   {sql_dsum("value", "rev")}
            FROM events GROUP BY 1
        ), s AS (
            SELECT d, CAST(xc AS DOUBLE) AS x, rev AS y,
                   CAST(zc AS DOUBLE) AS z
            FROM daily
        ), w AS (
            SELECT x, y, z,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n,
                   {sql_exact_double(f"SUM({sql_dec_cast('x')}) OVER ()")} AS ex,
                   {sql_exact_double(f"SUM({sql_dec_cast('y')}) OVER ()")} AS ey,
                   {sql_exact_double(f"SUM({sql_dec_cast('z')}) OVER ()")} AS ez
            FROM s
        ), c AS (
            SELECT n,
                   CASE WHEN ex > CAST(0.0 AS DOUBLE)
                        THEN x / (ex / n) - 1 END AS cx,
                   CASE WHEN ey <> CAST(0.0 AS DOUBLE)
                        THEN y / (ey / n) - 1 END AS cy,
                   CASE WHEN ez > CAST(0.0 AS DOUBLE)
                        THEN z / (ez / n) - 1 END AS cz
            FROM w
        ), sums AS (
            SELECT CAST(MAX(n) AS BIGINT) AS n,
                   {sql_dsum("cx * cy", "sxy", 10)},
                   {sql_dsum("cx * cz", "sxz", 10)},
                   {sql_dsum("cy * cz", "syz", 10)},
                   {sql_dsum("cx * cx", "sxx", 10)},
                   {sql_dsum("cy * cy", "syy", 10)},
                   {sql_dsum("cz * cz", "szz", 10)}
            FROM c
        ), r AS (
            SELECT n,
                   CASE WHEN sxx > CAST(0.0 AS DOUBLE)
                             AND syy > CAST(0.0 AS DOUBLE)
                        THEN sxy / (SQRT(sxx) * SQRT(syy)) END AS rxy,
                   CASE WHEN sxx > CAST(0.0 AS DOUBLE)
                             AND szz > CAST(0.0 AS DOUBLE)
                        THEN sxz / (SQRT(sxx) * SQRT(szz)) END AS rxz,
                   CASE WHEN syy > CAST(0.0 AS DOUBLE)
                             AND szz > CAST(0.0 AS DOUBLE)
                        THEN syz / (SQRT(syy) * SQRT(szz)) END AS ryz
            FROM sums
        )
        SELECT n,
               {sql_dround("rxy")} AS r_xy,
               {sql_dround("rxz")} AS r_xz,
               {sql_dround("ryz")} AS r_yz,
               CASE WHEN (1 - rxz * rxz) * (1 - ryz * ryz)
                         > CAST(0.0 AS DOUBLE)
                    THEN {sql_dround(
                        "(rxy - rxz * ryz)"
                        " / SQRT((1 - rxz * rxz) * (1 - ryz * ryz))")}
               END AS r_xy_given_z
        FROM r
    """,
)
def agg_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlation r(x,y|z) of daily event count (x)
    and daily revenue (y) controlling for daily active users (z) — does
    traffic predict revenue BEYOND the user base both ride on?
    r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)): the
    confounder-aware correlation every "metric A drives metric B" claim
    needs before `agg_diff_in_diff`-grade causal designs.  All three
    pairwise Pearsons use the `agg_ccf_lags` mean-normalized centered
    form (scale-free O(cv) deviations, nd=10 decimal sums — the
    raw-power-sum cancellation lesson), so the partial formula is pure
    double algebra on identically-rounded inputs.  One corpus day
    aggregate; windows on the O(span) series; |r| = 1 or zero-variance
    sides (degenerate grain) emit NULL."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("xc"),
        F.countDistinct("user_id").cast("long").alias("zc"),
        dsum("value", "rev"),
    )
    s = daily.select(
        "d",
        F.col("xc").cast("double").alias("x"),
        F.col("rev").alias("y"),
        F.col("zc").cast("double").alias("z"),
    )
    w_all = Window.partitionBy(F.lit(0))
    w = s.select(
        "x",
        "y",
        "z",
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
        exact_double(F.sum(dec_cast("x")).over(w_all)).alias("ex"),
        exact_double(F.sum(dec_cast("y")).over(w_all)).alias("ey"),
        exact_double(F.sum(dec_cast("z")).over(w_all)).alias("ez"),
    )
    n = F.col("n")
    c = w.select(
        "n",
        F.when(F.col("ex") > F.lit(0.0), F.col("x") / (F.col("ex") / n) - F.lit(1)).alias("cx"),
        F.when(F.col("ey") != F.lit(0.0), F.col("y") / (F.col("ey") / n) - F.lit(1)).alias("cy"),
        F.when(F.col("ez") > F.lit(0.0), F.col("z") / (F.col("ez") / n) - F.lit(1)).alias("cz"),
    )
    cx, cy, cz = F.col("cx"), F.col("cy"), F.col("cz")
    sums = c.agg(
        F.max("n").cast("long").alias("n"),
        dsum(cx * cy, "sxy", 10),
        dsum(cx * cz, "sxz", 10),
        dsum(cy * cz, "syz", 10),
        dsum(cx * cx, "sxx", 10),
        dsum(cy * cy, "syy", 10),
        dsum(cz * cz, "szz", 10),
    )
    sxx, syy, szz = F.col("sxx"), F.col("syy"), F.col("szz")

    def pear(num, d1, d2):
        return F.when(
            (d1 > F.lit(0.0)) & (d2 > F.lit(0.0)),
            num / (F.sqrt(d1) * F.sqrt(d2)),
        )

    r = sums.select(
        "n",
        pear(F.col("sxy"), sxx, syy).alias("rxy"),
        pear(F.col("sxz"), sxx, szz).alias("rxz"),
        pear(F.col("syz"), syy, szz).alias("ryz"),
    )
    rxy, rxz, ryz = F.col("rxy"), F.col("rxz"), F.col("ryz")
    den = (F.lit(1) - rxz * rxz) * (F.lit(1) - ryz * ryz)
    return r.select(
        "n",
        dround(rxy).alias("r_xy"),
        dround(rxz).alias("r_xz"),
        dround(ryz).alias("r_yz"),
        F.when(
            den > F.lit(0.0),
            dround((rxy - rxz * ryz) / F.sqrt(den)),
        ).alias("r_xy_given_z"),
    )


_RSI_W = 7  # Cutler RSI window, days


@register(
    "window_rsi",
    oracle=f"""
        WITH daily AS (
            SELECT DATE_TRUNC('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ), delta AS (
            SELECT d, x,
                   x - LAG(x) OVER (ORDER BY d) AS chg
            FROM daily
        ), gl AS (
            SELECT d, x,
                   CASE WHEN chg > 0 THEN chg ELSE 0 END AS gain,
                   CASE WHEN chg < 0 THEN -chg ELSE 0 END AS loss,
                   CASE WHEN chg IS NULL THEN NULL ELSE 1 END AS hasret
            FROM delta
        ), framed AS (
            SELECT d, x,
                   CAST(SUM(gain) OVER w AS BIGINT) AS g{_RSI_W},
                   CAST(SUM(loss) OVER w AS BIGINT) AS l{_RSI_W},
                   CAST(COUNT(hasret) OVER w AS BIGINT) AS nret
            FROM gl
            WINDOW w AS (ORDER BY d ROWS BETWEEN {_RSI_W - 1} PRECEDING
                         AND CURRENT ROW)
        )
        SELECT d, x, nret,
               CASE WHEN nret >= {_RSI_W} THEN
                   CASE WHEN g{_RSI_W} + l{_RSI_W} > 0
                        THEN {sql_dround(
                            f"100 * g{_RSI_W}"
                            f" / CAST(g{_RSI_W} + l{_RSI_W} AS DOUBLE)")}
                        ELSE CAST(50.0 AS DOUBLE) END
               END AS rsi
        FROM framed
    """,
)
def window_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cutler's RSI (simple-average relative strength index) of the
    daily count series over a 7-day (_RSI_W) window — RSI =
    100·Σgain/(Σgain+Σloss): the banded momentum gauge that joins
    `window_drawdown` and `window_bollinger` in the volatility family
    (overbought ≈ >70, oversold ≈ <30).  The SMA variant is chosen over
    Wilder's recursive smoothing deliberately: day-over-day count
    deltas are INTEGERS, so the framed gain/loss sums are exact BIGINT
    window arithmetic — zero float surface until the single final
    division.  RSI emits only once the frame holds 7 (_RSI_W) true returns
    (warm-up rows NULL); an all-flat frame reads 50."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    w_ord = Window.partitionBy(F.lit(0)).orderBy("d")
    delta = daily.select(
        "d", "x", (F.col("x") - F.lag("x").over(w_ord)).alias("chg")
    )
    chg = F.col("chg")
    gl = delta.select(
        "d",
        "x",
        F.when(chg > 0, chg).otherwise(F.lit(0)).alias("gain"),
        F.when(chg < 0, -chg).otherwise(F.lit(0)).alias("loss"),
        F.when(chg.isNull(), F.lit(None)).otherwise(F.lit(1)).alias("hasret"),
    )
    w_f = (
        Window.partitionBy(F.lit(0))
        .orderBy("d")
        .rowsBetween(-(_RSI_W - 1), Window.currentRow)
    )
    framed = gl.select(
        "d",
        "x",
        F.sum("gain").over(w_f).cast("long").alias("g7"),
        F.sum("loss").over(w_f).cast("long").alias("l7"),
        F.count("hasret").over(w_f).cast("long").alias("nret"),
    )
    g, l_ = F.col("g7"), F.col("l7")
    return framed.select(
        "d",
        "x",
        "nret",
        F.when(
            F.col("nret") >= _RSI_W,
            F.when(
                g + l_ > 0,
                dround(F.lit(100) * g / (g + l_).cast("double")),
            ).otherwise(F.lit(50.0)),
        ).alias("rsi"),
    )


@register(
    "agg_changepoint_binseg",
    oracle=f"""
        WITH daily AS (
            SELECT DATE_TRUNC('day', ts) AS d, {sql_dsum("value", "rev")}
            FROM events GROUP BY 1
        ), idx0 AS (
            SELECT d, rev,
                   CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n,
                   {sql_exact_double(f"SUM({sql_dec_cast('rev')}) OVER ()")}
                       AS mrev
            FROM daily
        ), s AS (
            SELECT d, t, n,
                   CASE WHEN mrev > CAST(0.0 AS DOUBLE)
                        THEN rev / (mrev / n) END AS y
            FROM idx0
        ), pref AS (
            SELECT d, t, n, y,
                   {sql_exact_double(
                       f"SUM({sql_dec_cast('y')}) OVER wo", 10)} AS py,
                   {sql_exact_double(
                       f"SUM({sql_dec_cast('y * y')}) OVER wo", 10)} AS py2,
                   {sql_exact_double(
                       f"SUM({sql_dec_cast('y')}) OVER ()", 10)} AS ty,
                   {sql_exact_double(
                       f"SUM({sql_dec_cast('y * y')}) OVER ()", 10)} AS ty2
            FROM s
            WINDOW wo AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)
        ), gains AS (
            SELECT d, t, n, py, ty,
                   CASE WHEN t < n AND n >= 4 THEN
                       (ty2 - ty * ty / n)
                       - ((py2 - py * py / t)
                          + ((ty2 - py2) - (ty - py) * (ty - py) / (n - t)))
                   END AS gain
            FROM pref
        ), mx AS (
            SELECT d, t, n, py, ty, gain,
                   MAX(gain) OVER () AS maxgain
            FROM gains
        ), win AS (
            SELECT *, MIN(CASE WHEN gain = maxgain THEN t END) OVER ()
                          AS tmin
            FROM mx
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_days,
               MIN(CASE WHEN t = tmin THEN d END) AS change_day,
               CAST(MAX(tmin) AS BIGINT) AS split_after,
               {sql_dround("MAX(CASE WHEN t = tmin THEN gain END)")}
                   AS sse_gain,
               {sql_dround("MIN(CASE WHEN t = tmin THEN py / t END)")}
                   AS mean_left,
               {sql_dround(
                   "MIN(CASE WHEN t = tmin"
                   " THEN (ty - py) / (n - t) END)")} AS mean_right
        FROM win
    """,
)
def agg_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single binary-segmentation changepoint on the daily revenue
    series — the split t maximizing the SSE reduction
    SS_total − (SS_left + SS_right), with the two segment means: the
    level-shift detector that complements `window_cusum_change` (CUSUM
    flags WHEN drift accumulates; binseg names the single best
    breakpoint, and is the recursion step of the full PELT/binseg
    family).  Segment SSEs expand in PREFIX sums (running Σy, Σy² via
    the fuzz-pinned framed decimal windows) so every candidate split is
    O(1) per-row arithmetic — the whole search is one window pass over
    the O(span) day table, no per-split re-aggregation.  The series
    mean-normalizes first (the `agg_ccf_lags` lesson; gains are
    scale-free, nd=10 sums keep ~8 digits at any magnitude); a tied
    argmax resolves to the single earliest-t row (tmin window) and ALL
    output columns derive from that one row, so the answer can never mix
    segments from different tied splits; n < 4 emits NULL."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        dsum("value", "rev")
    )
    w_ord = Window.partitionBy(F.lit(0)).orderBy("d")
    w_all = Window.partitionBy(F.lit(0))
    w_pref = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    idx0 = daily.select(
        "d",
        "rev",
        F.row_number().over(w_ord).cast("long").alias("t"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
        exact_double(F.sum(dec_cast("rev")).over(w_all)).alias("mrev"),
    )
    n = F.col("n")
    s = idx0.select(
        "d",
        "t",
        "n",
        F.when(
            F.col("mrev") > F.lit(0.0), F.col("rev") / (F.col("mrev") / n)
        ).alias("y"),
    )
    y = F.col("y")
    pref = s.select(
        "d",
        "t",
        "n",
        exact_double(F.sum(dec_cast(y)).over(w_pref), 10).alias("py"),
        exact_double(F.sum(dec_cast(y * y)).over(w_pref), 10).alias("py2"),
        exact_double(F.sum(dec_cast(y)).over(w_all), 10).alias("ty"),
        exact_double(F.sum(dec_cast(y * y)).over(w_all), 10).alias("ty2"),
    )
    t, py, py2, ty, ty2 = (
        F.col(c) for c in ("t", "py", "py2", "ty", "ty2")
    )
    gain = F.when(
        (t < n) & (n >= 4),
        (ty2 - ty * ty / n)
        - (
            (py2 - py * py / t)
            + ((ty2 - py2) - (ty - py) * (ty - py) / (n - t))
        ),
    )
    gains = pref.select("d", "t", "n", "py", "ty", gain.alias("gain"))
    mx = gains.select(
        "*", F.max("gain").over(w_all).alias("maxgain")
    )
    at_max = F.col("gain") == F.col("maxgain")
    # Resolve a tied max-gain to ONE winning row (earliest t) and derive
    # every output column from it — independent MINs over the tied set
    # could mix segments from different splits (r9 ADVICE item).
    win = mx.select(
        "*", F.min(F.when(at_max, F.col("t"))).over(w_all).alias("tmin")
    )
    at_win = F.col("t") == F.col("tmin")
    return win.agg(
        F.max("n").cast("long").alias("n_days"),
        F.min(F.when(at_win, F.col("d"))).alias("change_day"),
        F.max("tmin").cast("long").alias("split_after"),
        dround(F.max(F.when(at_win, F.col("gain")))).alias("sse_gain"),
        dround(F.min(F.when(at_win, py / t))).alias("mean_left"),
        dround(
            F.min(F.when(at_win, (ty - py) / (n - t)))
        ).alias("mean_right"),
    )
