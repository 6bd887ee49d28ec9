"""Table profiling / statistics collection (SURVEY.md §4 — the engine's
ANALYZE path, and the data-quality profile every ingest pipeline runs).

The reference side: ``datacube dataset search``-style summaries and the
pre-flight sanity checks product workers run over a new collection
(completeness, value ranges, cardinalities).  Engine side: this is what
``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`` gathers to feed join
reordering and broadcast decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

# Profiled measure columns: (name, needs_double_cast)
_COLS = ["l_quantity", "l_extendedprice", "l_partkey"]


@register(
    "profile_table",
    oracle="""
        SELECT 'l_quantity' AS column_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT(l_quantity) AS n_nulls,
               COUNT(DISTINCT l_quantity) AS n_distinct,
               CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
               CAST(MAX(l_quantity) AS DOUBLE) AS max_v
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
               COUNT(DISTINCT l_extendedprice),
               CAST(MIN(l_extendedprice) AS DOUBLE),
               CAST(MAX(l_extendedprice) AS DOUBLE)
        FROM lineitem
        UNION ALL
        SELECT 'l_partkey', COUNT(*), COUNT(*) - COUNT(l_partkey),
               COUNT(DISTINCT l_partkey),
               CAST(MIN(l_partkey) AS DOUBLE), CAST(MAX(l_partkey) AS DOUBLE)
        FROM lineitem
    """,
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§4: column profiling in ONE scan — per-column row/null/distinct
    counts and min/max, unpivoted to a row per column (the ANALYZE-table
    statistics the optimizer's join reordering and broadcast thresholds
    feed on, and the data-quality profile a new collection gets before
    products run over it).  Spark-first: a single wide aggregate computes
    every column's stats simultaneously (the multi-``COUNT DISTINCT``
    becomes one Expand — rows × |profiled columns|, linear, partial-
    aggregated map-side); ``stack`` unpivots the 1-row result, so the
    table is scanned exactly once where the oracle's UNION ALL form scans
    it three times.  At 100 TB you swap the exact distinct counts for
    ``approx_count_distinct`` (the mergeable-HLL tier demonstrated by
    ``agg_approx_distinct``) — exact is kept here because the oracle
    verifies values, not sketches.  Determinism: counts are integers;
    min/max are selections (no float arithmetic); the only cast is
    bigint→double, exact below 2^53."""
    lf = load(spark, sf_dir, "lineitem").select(*_COLS)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).cast("double").alias(f"mn_{c}"),
            F.max(c).cast("double").alias(f"mx_{c}"),
        ]
    one = lf.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in _COLS
    )
    return one.selectExpr(
        f"stack({len(_COLS)}, {stack_args})"
        " AS (column_name, n_nulls, n_distinct, min_v, max_v)",
        "n_rows",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_v", "max_v")


@register(
    "table_constraint_check",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS qty_range_viol,
               CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                             THEN 1 ELSE 0 END) AS BIGINT) AS disc_range_viol,
               CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS shipdate_null_viol,
               CAST(COUNT(*) - COUNT(DISTINCT l_orderkey * 10 + l_linenumber)
                   AS BIGINT) AS pk_dup_viol,
               CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS price_positive_viol
        FROM lineitem
    """,
)
def table_constraint_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§4+: declarative data-quality constraints (Delta CHECK-constraint /
    dbt-test analog) evaluated in ONE aggregate pass over ONE scan — range
    checks and null checks are conditional sums, primary-key uniqueness is
    ``count − countDistinct(pk)``, all sharing the same partial-aggregated
    shuffle (plan-pinned 1 scan).  The ingest gate every production table
    needs before a bad load poisons downstream composites; pairs with the
    versioned table: check, then commit or RESTORE."""
    lf = load(spark, sf_dir, "lineitem")
    viol = [
        F.sum(
            ((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast("int")
        ).alias("qty_range_viol"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).cast("int")
        ).alias("disc_range_viol"),
        F.sum(F.col("l_shipdate").isNull().cast("int")).alias("shipdate_null_viol"),
        (
            F.count(F.lit(1))
            - F.countDistinct(F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        ).alias("pk_dup_viol"),
        F.sum((F.col("l_extendedprice") <= 0).cast("int")).alias("price_positive_viol"),
    ]
    return lf.agg(F.count(F.lit(1)).alias("n_rows"), *viol)


_SKEW_KEYS = ["l_orderkey", "l_partkey", "l_suppkey"]
# hot-key pick packs (count, key) into one orderable BIGINT: count·10^12 −
# key — max count wins, ties break to the SMALLEST key.  Holds while
# count < 9·10^6 and key < 10^12 (orders beyond any fixture tier).
_PACK = 1_000_000_000_000


@register(
    "profile_skew_keys",
    oracle=f"""
        WITH k AS (
            SELECT 'l_orderkey' AS key_col, l_orderkey AS key_value
            FROM lineitem
            UNION ALL
            SELECT 'l_partkey', l_partkey FROM lineitem
            UNION ALL
            SELECT 'l_suppkey', l_suppkey FROM lineitem
        ), c AS (
            SELECT key_col, key_value, COUNT(*) AS cnt
            FROM k GROUP BY key_col, key_value
        )
        SELECT key_col,
               CAST(SUM(cnt) AS BIGINT) AS n_rows,
               COUNT(*) AS n_distinct,
               ARG_MAX(key_value, cnt * {_PACK} - key_value) AS hot_key,
               CAST(MAX(cnt) AS BIGINT) AS hot_rows,
               CAST(SUM(cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_rows,
               CAST(MAX(cnt) AS DOUBLE)
                 / (CAST(SUM(cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                 AS skew_factor
        FROM c GROUP BY key_col
    """,
)
def profile_skew_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§4+/r5f: join-key skew profiler — the DETECTION tool you run before
    reaching for `join_skew_salted`'s mitigation: per candidate key, row
    and distinct counts, the hottest key and its row count, and the skew
    factor (hot-key rows over the mean).  Spark-first: the three key
    columns unpivot through one map-side Expand over a single scan, so
    profiling K candidate keys costs one pass, not K; two grouped
    shuffles do the rest.  All integer counts + exact IEEE divides —
    nothing to round."""
    lf = load(spark, sf_dir, "lineitem").select(*_SKEW_KEYS)
    k = lf.unpivot([], _SKEW_KEYS, "key_col", "key_value")
    c = k.groupBy("key_col", "key_value").agg(F.count(F.lit(1)).alias("cnt"))
    return c.groupBy("key_col").agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max_by(
            "key_value", F.col("cnt") * F.lit(_PACK) - F.col("key_value")
        ).alias("hot_key"),
        F.max("cnt").cast("bigint").alias("hot_rows"),
        (F.sum("cnt").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mean_rows"
        ),
        (
            F.max("cnt").cast("double")
            / (F.sum("cnt").cast("double") / F.count(F.lit(1)).cast("double"))
        ).alias("skew_factor"),
    )


# Benford first-digit expectation log10(1 + 1/d), computed once in Python
# so BOTH engines parse the identical double literal (DuckDB casts the
# string form to DOUBLE — a bare literal would parse as DECIMAL).
_BENFORD_P = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}

_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN CAST('{p!r}' AS DOUBLE)" for d, p in _BENFORD_P.items()
)


@register(
    "profile_benford",
    oracle=f"""
        WITH d AS (
            SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                       AS VARCHAR), 1, 1) AS INTEGER)
                   AS first_digit
            FROM orders WHERE o_totalprice >= 1.0
        ), c AS (
            SELECT first_digit, COUNT(*) AS n_obs FROM d GROUP BY first_digit
        ), t AS (
            SELECT first_digit, n_obs,
                   CAST(SUM(n_obs) OVER () AS DOUBLE) AS n_total,
                   CASE first_digit {_BENFORD_CASE} END AS p_expected
            FROM c
        )
        SELECT first_digit, CAST(n_obs AS BIGINT) AS n_obs, p_expected,
               n_total * p_expected AS expected,
               (CAST(n_obs AS DOUBLE) - n_total * p_expected)
                   * (CAST(n_obs AS DOUBLE) - n_total * p_expected)
                   / (n_total * p_expected) AS chi_term
        FROM t
    """,
)
def profile_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over the order-value measure —
    the classic fabricated/corrupted-numeric-data detector in data-quality
    profiling.  First significant digit is extracted through the exact
    integer path (FLOOR → BIGINT → leading char; values are ≥ 1 by the
    guard), never via log10, so no libm sits on the digit boundary.
    Output is ≤9 rows post-aggregation, so the total-count window is
    bounded — the only corpus-sized stage is one grouped count.  The
    chi-square term is pure IEEE arithmetic on exact counts and the
    Python-folded Benford constants — left unrounded."""
    digits = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") >= 1.0)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
            )
            .cast("int")
            .alias("first_digit")
        )
    )
    c = digits.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n_obs"))
    # ≤9 rows from here on: the no-partition window is bounded by design
    t = c.withColumn(
        "n_total", F.sum("n_obs").over(Window.partitionBy()).cast("double")
    ).withColumn(
        "p_expected",
        F.element_at(
            F.create_map(
                *[F.lit(x) for dp in _BENFORD_P.items() for x in dp]
            ),
            F.col("first_digit"),
        ),
    )
    n_obs_d = F.col("n_obs").cast("double")
    expected = F.col("n_total") * F.col("p_expected")
    return t.select(
        "first_digit",
        F.col("n_obs").cast("bigint").alias("n_obs"),
        "p_expected",
        expected.alias("expected"),
        ((n_obs_d - expected) * (n_obs_d - expected) / expected).alias(
            "chi_term"
        ),
    )
