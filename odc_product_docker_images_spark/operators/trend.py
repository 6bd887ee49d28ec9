"""Mann-Kendall trend test + Theil-Sen slope (A9+/r5).

Reference analog: the EO statistics stack's per-pixel time-series trend
products (⟨pub⟩ datacube-stats / DEA land-cover trend: Mann-Kendall
significance + Theil-Sen slope over a pixel's observation series) —
`agg_linear_trend` covers the least-squares fit; this adds the RANK-based
robust pair: S = Σ_{i<j} sign(x_j − x_i) over the time ordering, the
normal-approximation Z (no tie correction — documented simplification,
formula identical on both engines), and the Theil-Sen slope = median of
pairwise slopes.

Spark-first scale shape: the pairwise stage is a SELF-JOIN WITHIN the
series key, so pair count is bounded by per-series length squared while
the SERIES COUNT is what scales with data volume — the same
bounded-blow-up contract as the blocked dedup joins.  At 100 TB: one
shuffle partitions by series key, pairs never cross series, and a
too-long series is the caller's resampling problem (as in the reference,
which computes per-pixel series of bounded revisit count).

Determinism: S is an integer sum; pair signs are CASE comparisons on raw
doubles; slopes are one IEEE subtract/divide on whole-second epochs; the
median midpoint is the same (lo+hi)/2 in both engines; Z's sqrt is the
one libm op, absorbed by dround(6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import (
    dround,
    dsum,
    dsum_wide,
    sql_dround,
    sql_dsum,
    sql_dsum_wide,
)
from ..io import fanout, load
from ..registry import register

# variance of S under H0, no tie correction: n(n-1)(2n+5)/18
_Z_SQL = (
    "CASE WHEN s_stat > 0 THEN (s_stat - 1) WHEN s_stat < 0 THEN (s_stat + 1)"
    " ELSE 0 END"
    " / SQRT(n_obs * (n_obs - CAST(1.0 AS DOUBLE))"
    " * (CAST(2.0 AS DOUBLE) * n_obs + CAST(5.0 AS DOUBLE))"
    " / CAST(18.0 AS DOUBLE))"
)


@register(
    "agg_mann_kendall",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_id,
                   CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS sec,
                   value
            FROM events
        ), p AS (
            SELECT a.user_id AS user_id,
                   CASE WHEN b.value > a.value THEN 1
                        WHEN b.value < a.value THEN -1 ELSE 0 END AS sgn,
                   CASE WHEN b.sec > a.sec
                        THEN (b.value - a.value) / CAST(b.sec - a.sec AS DOUBLE)
                   END AS slope
            FROM e a JOIN e b
              ON a.user_id = b.user_id
             AND (a.sec < b.sec OR (a.sec = b.sec AND a.event_id < b.event_id))
        ), agg AS (
            SELECT p.user_id,
                   CAST(SUM(sgn) AS BIGINT) AS s_stat,
                   MEDIAN(slope) * CAST(1e6 AS DOUBLE) AS sen_slope_raw,
                   COUNT(*) AS n_pairs
            FROM p GROUP BY p.user_id
        ), c AS (
            SELECT user_id, COUNT(*) AS n_obs FROM e GROUP BY user_id
        )
        SELECT agg.user_id AS user_id,
               CAST(c.n_obs AS BIGINT) AS n_obs,
               s_stat,
               CAST(n_pairs AS BIGINT) AS n_pairs,
               {sql_dround(_Z_SQL, 6)} AS z_stat,
               {sql_dround('sen_slope_raw', 6)} AS sen_slope_ppm
        FROM agg JOIN c ON agg.user_id = c.user_id
    """,
)
def agg_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9+: robust per-series trend — Mann-Kendall S over the (ts,
    event_id) observation order, normal-approximation Z, and the
    Theil-Sen median slope (scaled to ppm/second so the rounded grid
    carries signal; slopes only over strictly-increasing timestamps)."""
    e = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.unix_timestamp("ts").alias("sec"),
            "value",
        )
        .repartition(fanout(spark), "user_id")  # single-file input: parallelize the join
    )
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (
            (F.col("a.sec") < F.col("b.sec"))
            | ((F.col("a.sec") == F.col("b.sec")) & (F.col("a.event_id") < F.col("b.event_id")))
        ),
    ).select(
        F.col("a.user_id").alias("user_id"),
        F.when(F.col("b.value") > F.col("a.value"), 1)
        .when(F.col("b.value") < F.col("a.value"), -1)
        .otherwise(0)
        .alias("sgn"),
        F.when(
            F.col("b.sec") > F.col("a.sec"),
            (F.col("b.value") - F.col("a.value"))
            / (F.col("b.sec") - F.col("a.sec")).cast("double"),
        ).alias("slope"),
    )
    agg = pairs.groupBy("user_id").agg(
        F.sum("sgn").cast("bigint").alias("s_stat"),
        (F.median("slope") * F.lit(1e6)).alias("sen_slope_raw"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    counts = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_obs"))
    s = F.col("s_stat")
    z = (
        F.when(s > 0, s - 1).when(s < 0, s + 1).otherwise(0)
        / F.sqrt(
            F.col("n_obs") * (F.col("n_obs") - F.lit(1.0))
            * (F.lit(2.0) * F.col("n_obs") + F.lit(5.0))
            / F.lit(18.0)
        )
    )
    return agg.join(counts, "user_id").select(
        "user_id",
        "n_obs",
        "s_stat",
        "n_pairs",
        dround(z, 6).alias("z_stat"),
        dround("sen_slope_raw", 6).alias("sen_slope_ppm"),
    )


_RIDGE_LAMBDA = 10.0  # L2 penalty (exact binary; intercept unpenalized)

# Closing arithmetic SHARED AS TEXT: Spark evaluates these with F.expr and
# the oracle inlines the identical strings, so operand order is equal by
# construction (both engines parse the same +-*/ grammar).
_A = {
    "a11": "n",
    "a12": "sx1",
    "a13": "sx2",
    "a22": f"(sx1x1 + {_RIDGE_LAMBDA!r})",
    "a23": "sx1x2",
    "a33": f"(sx2x2 + {_RIDGE_LAMBDA!r})",
    "b1": "sy",
    "b2": "sx1y",
    "b3": "sx2y",
}


def _cramer(col_replaced: int | None) -> str:
    """Cofactor expansion along the first row of the (symmetric) normal
    matrix, with column ``col_replaced`` (0-2) swapped for b."""
    c = dict(_A)
    if col_replaced == 0:
        c["a11"], c["a12_r"], c["a13_r"] = c["b1"], c["a12"], c["a13"]
        return (
            f"{c['b1']}*({c['a22']}*{c['a33']} - {c['a23']}*{c['a23']})"
            f" - {c['a12']}*({c['b2']}*{c['a33']} - {c['a23']}*{c['b3']})"
            f" + {c['a13']}*({c['b2']}*{c['a23']} - {c['a22']}*{c['b3']})"
        )
    if col_replaced == 1:
        return (
            f"{c['a11']}*({c['b2']}*{c['a33']} - {c['a23']}*{c['b3']})"
            f" - {c['b1']}*({c['a12']}*{c['a33']} - {c['a23']}*{c['a13']})"
            f" + {c['a13']}*({c['a12']}*{c['b3']} - {c['b2']}*{c['a13']})"
        )
    if col_replaced == 2:
        return (
            f"{c['a11']}*({c['a22']}*{c['b3']} - {c['b2']}*{c['a23']})"
            f" - {c['a12']}*({c['a12']}*{c['b3']} - {c['b2']}*{c['a13']})"
            f" + {c['b1']}*({c['a12']}*{c['a23']} - {c['a22']}*{c['a13']})"
        )
    return (
        f"{c['a11']}*({c['a22']}*{c['a33']} - {c['a23']}*{c['a23']})"
        f" - {c['a12']}*({c['a12']}*{c['a33']} - {c['a23']}*{c['a13']})"
        f" + {c['a13']}*({c['a12']}*{c['a23']} - {c['a22']}*{c['a13']})"
    )


@register(
    "ml_ridge_closed_form",
    oracle=f"""
        WITH s AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   {sql_dsum('l_quantity', 'sx1')},
                   {sql_dsum('l_discount', 'sx2')},
                   {sql_dsum('l_quantity * l_quantity', 'sx1x1')},
                   {sql_dsum('l_discount * l_discount', 'sx2x2')},
                   {sql_dsum('l_quantity * l_discount', 'sx1x2')},
                   {sql_dsum_wide('l_extendedprice', 'sy')},
                   {sql_dsum_wide('l_quantity * l_extendedprice', 'sx1y')},
                   {sql_dsum_wide('l_discount * l_extendedprice', 'sx2y')}
            FROM lineitem
        )
        SELECT CAST(n AS BIGINT) AS n_rows,
               ({_cramer(0)}) / ({_cramer(None)}) AS beta0,
               ({_cramer(1)}) / ({_cramer(None)}) AS beta1,
               ({_cramer(2)}) / ({_cramer(None)}) AS beta2
        FROM s
    """,
)
def ml_ridge_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML2: closed-form ridge regression (2 features + intercept) —
    y = extendedprice on (quantity, discount), solving the 3×3 normal
    equations (X'X + λ·diag(0,1,1))β = X'y by CRAMER'S RULE over nine
    decimal-exact sufficient sums (the BigDecimal dsum path — the
    quantity*price product addends exceed dsum_fast's long-split domain
    at 10x scale, the agg_assoc_rules lesson).  The distributed-regression pattern at
    its purest: ONE aggregate pass over the fact table (map-side
    partials), then a 1-row fixed-arithmetic solve — no iteration, no
    driver linalgebra, and p features cost a wider aggregate list, never
    another pass.

    Determinism: the closing cofactor arithmetic is SHARED AS TEXT —
    Spark runs the identical expression strings through ``F.expr`` that
    the oracle inlines, so operand order is equal by construction;
    inputs are exact_double(6) decimal sums — unrounded output."""
    li = load(spark, sf_dir, "lineitem")
    q, d, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(q, "sx1"),
        dsum(d, "sx2"),
        dsum(q * q, "sx1x1"),
        dsum(d * d, "sx2x2"),
        dsum(q * d, "sx1x2"),
        # the y block rides the WIDE hop (hop-domain audit): the GLOBAL
        # grain puts Σ qty·price at 8.1e13 by 100x (the agg_weighted_mean
        # overflow family, one decade past the nd=6 int64 domain) and
        # Σ price past 9.2e12 by ~290x; bit-identical in-domain, so no
        # graded hash moves.  The x-only sums stay narrow: qty²-scale
        # sums cross only around ~18,000x (SCALING.md hop-domain table).
        dsum_wide(y, "sy"),
        dsum_wide(q * y, "sx1y"),
        dsum_wide(d * y, "sx2y"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.expr(f"({_cramer(0)}) / ({_cramer(None)})").alias("beta0"),
        F.expr(f"({_cramer(1)}) / ({_cramer(None)})").alias("beta1"),
        F.expr(f"({_cramer(2)}) / ({_cramer(None)})").alias("beta2"),
    )
