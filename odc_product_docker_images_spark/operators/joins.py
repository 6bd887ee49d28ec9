"""Join surface (SURVEY.md §2.3 J1-J9).

Reference analogs: the ODC pipelines never say "join", but three patterns
are joins — epoch combination (NDVI anomaly: baseline composite ⋈ analysis
scene on pixel key), dimension enrichment (platform/zone metadata), and
ledger diffs (scenes indexed but never processed).  The engine exposes the
full Spark join surface.

Scale notes (100 TB): big⋈big equi-joins shuffle both sides on the key —
Catalyst picks sort-merge; AQE converts to broadcast when a side turns out
small and splits skewed partitions.  Dimension joins are explicitly
``broadcast()`` (no shuffle of the fact table).  The range join keeps the
interval side broadcast so the fact side streams through a nested-loop
against a handful of intervals; at scale, bucketize the time axis and
equi-join on the bucket instead.  The as-of join avoids a per-row
subquery: union both sides, one window pass with ``last(ignorenulls)`` —
a single shuffle on (key, time).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.det import (
    davg,
    dec_cast,
    dsum,
    exact_double,
    exact_double_wide,
    fast_sum_parts,
    fast_sum_reassemble,
    sql_davg,
    sql_dsum,
    sql_dsum_wide,
)
from ..io import load
from ..registry import register

_DISC_PRICE = "l_extendedprice * (1 - l_discount)"


def _disc_price() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "join_inner",
    oracle=f"""
        SELECT o_orderpriority,
               {sql_dsum_wide(_DISC_PRICE, "revenue")},
               COUNT(*) AS n_items,
               COUNT(DISTINCT o_orderkey) AS n_orders
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: big⋈big inner equi-join on the fact key (baseline ⋈ analysis on
    pixel id).  Catalyst picks SMJ/SHJ; AQE may flip to broadcast.

    r12 (guide §2.3 "aggregate before you shuffle"): the measures are
    additive over lineitems within an order, so the lineitem side is
    partially aggregated per l_orderkey BEFORE the join — decimal(30,10)
    addition is exact and associative, so the regrouped revenue sum is
    bit-identical to the per-pair form.  The join then carries one row
    per order (4× fewer rows than the item stream) and the groupBy's
    hash-agg shuffle shrinks the same way; countDistinct stays (exact
    under any hypothetical order-key duplication) but now expands over
    the order-grain stream instead of the item-grain one.  Measured
    1.91 s → 1.50 s warm min at sf0.1, hash-identical output."""
    lf = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    per_order = lf.groupBy("l_orderkey").agg(
        F.sum(dec_cast(_disc_price())).alias("rev_dec"),
        F.count(F.lit(1)).alias("n_items_o"),
    )
    return (
        per_order.join(od, per_order.l_orderkey == od.o_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(
            exact_double_wide(F.sum("rev_dec")).alias("revenue"),
            F.sum("n_items_o").cast("long").alias("n_items"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@register(
    "join_broadcast",
    oracle=f"""
        SELECT r_name,
               COUNT(*) AS n_cust,
               {sql_davg("c_acctbal", "avg_bal")}
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: fact ⋈ broadcast dims (platform/zone metadata).  Explicit
    ``broadcast()`` — zero shuffle of the fact side at any scale."""
    cu = load(spark, sf_dir, "customer")
    na = load(spark, sf_dir, "nation")
    re = load(spark, sf_dir, "region")
    return (
        cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_cust"), davg("c_acctbal", "avg_bal"))
    )


@register(
    "join_left",
    oracle=f"""
        SELECT c_custkey,
               COUNT(o_orderkey) AS n_orders,
               {sql_dsum("o_totalprice", "total_spent")}
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left outer — keep all pixels, attach optional observations
    (xarray align/merge semantics).  Customers with no orders keep
    n_orders=0 / NULL spend."""
    cu = load(spark, sf_dir, "customer")
    od = load(spark, sf_dir, "orders")
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"), dsum("o_totalprice", "total_spent"))
    )


@register(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left semi — existence filter ("pixels with >=1 clear obs")."""
    cu = load(spark, sf_dir, "customer")
    od = load(spark, sf_dir, "orders")
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: left anti — ledger diff ("scenes indexed but never processed")."""
    cu = load(spark, sf_dir, "customer")
    od = load(spark, sf_dir, "orders")
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


_EPOCHS = [
    ("e1", _dt.datetime(2024, 1, 1), _dt.datetime(2024, 1, 11)),
    ("e2", _dt.datetime(2024, 1, 11), _dt.datetime(2024, 1, 21)),
    ("e3", _dt.datetime(2024, 1, 21), _dt.datetime(2024, 1, 31)),
    ("all", _dt.datetime(2024, 1, 1), _dt.datetime(2024, 1, 31)),  # overlaps e1-e3
]
_EPOCH_VALUES = ", ".join(
    f"('{n}', TIMESTAMP '{t0:%Y-%m-%d}', TIMESTAMP '{t1:%Y-%m-%d}')" for n, t0, t1 in _EPOCHS
)


@register(
    "join_range",
    oracle=f"""
        SELECT e.epoch, COUNT(*) AS n_events, {sql_dsum("ev.value", "sum_value")}
        FROM events ev
        JOIN (VALUES {_EPOCH_VALUES}) AS e(epoch, t0, t1)
          ON ev.ts >= e.t0 AND ev.ts < e.t1
        GROUP BY e.epoch
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: range/theta join — observation-to-epoch interval membership
    (baseline vs analysis period bucketing in ``dc_ndvi_anomaly``).  The
    interval side is tiny → broadcast nested-loop; events stream through.
    Epochs overlap deliberately (an obs can land in several)."""
    ev = load(spark, sf_dir, "events")
    epochs = F.broadcast(
        spark.createDataFrame(_EPOCHS, "epoch string, t0 timestamp, t1 timestamp")
    )
    return (
        ev.join(epochs, (ev.ts >= epochs.t0) & (ev.ts < epochs.t1))
        .groupBy("epoch")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
    )


@register(
    "join_asof",
    oracle="""
        WITH clicks AS (
            SELECT user_id, ts, MAX(value) AS click_value
            FROM events WHERE event_type = 'click' GROUP BY user_id, ts
        ), purchases AS (
            SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
        )
        SELECT p.event_id, p.user_id, p.ts, p.value,
               c.click_value AS asof_click_value
        FROM purchases p
        ASOF JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: as-of join — "most recent composite at/before scene time"
    (most-recent-mosaic fill-forward).  No native DataFrame primitive, so:
    union both sides tagged, one window pass per (key, time) carrying
    ``last(click, ignorenulls)`` forward, keep right-side rows with a
    match.  Single shuffle; no per-row subquery.  Clicks are pre-deduped
    per (user, ts) with MAX so ties are deterministic on both engines."""
    ev = load(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    u = purchases.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.lit(None).cast("double").alias("click_value"),
        F.lit(1).alias("is_p"),
    ).unionByName(
        clicks.select(
            "user_id",
            "ts",
            F.lit(None).cast("bigint").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
            "click_value",
            F.lit(0).alias("is_p"),
        )
    )
    # click (is_p=0) sorts before a purchase at the same ts → ">=" as-of semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("asof_click_value", F.last("click_value", ignorenulls=True).over(w))
        .where((F.col("is_p") == 1) & F.col("asof_click_value").isNotNull())
        .select("event_id", "user_id", "ts", "value", "asof_click_value")
    )


@register(
    "join_self_change",
    oracle=f"""
        WITH e96 AS (
            SELECT l_partkey, {sql_dsum(_DISC_PRICE, "rev")}
            FROM lineitem WHERE YEAR(l_shipdate) = 1996 GROUP BY l_partkey
        ), e97 AS (
            SELECT l_partkey, {sql_dsum(_DISC_PRICE, "rev")}
            FROM lineitem WHERE YEAR(l_shipdate) = 1997 GROUP BY l_partkey
        )
        SELECT l_partkey, e96.rev AS rev_1996, e97.rev AS rev_1997,
               ROUND(e97.rev - e96.rev, 6) AS delta
        FROM e96 JOIN e97 USING (l_partkey)
    """,
)
def join_self_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: two-epoch self-join — land/vegetation change detection: epoch1 ⋈
    epoch2 on pixel key, difference the composites (``vegetation_change``
    worker).  Aggregate-then-join keeps the join inputs one row per key."""
    lf = load(spark, sf_dir, "lineitem")

    def epoch(year: int) -> DataFrame:
        return (
            lf.where(F.year("l_shipdate") == year)
            .groupBy("l_partkey")
            .agg(dsum(_disc_price(), "rev"))
        )

    e96, e97 = epoch(1996), epoch(1997)
    return (
        e96.alias("a")
        .join(e97.alias("b"), "l_partkey")
        .select(
            "l_partkey",
            F.col("a.rev").alias("rev_1996"),
            F.col("b.rev").alias("rev_1997"),
            F.round(F.col("b.rev") - F.col("a.rev"), 6).alias("delta"),
        )
    )


_ENDMEMBERS = [("pv", 0.5), ("npv", 0.3), ("soil", 0.2)]
_EM_VALUES = ", ".join(f"('{n}', {w})" for n, w in _ENDMEMBERS)


@register(
    "join_cross",
    oracle=f"""
        SELECT r_name, endmember, weight
        FROM region CROSS JOIN (VALUES {_EM_VALUES}) AS em(endmember, weight)
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: cross join with a constant matrix — fractional-cover endmember
    application (``frac_coverage_classify`` applies a fixed 3×N matrix to
    every pixel).  Tiny side broadcast → no shuffle."""
    re = load(spark, sf_dir, "region")
    em = F.broadcast(spark.createDataFrame(_ENDMEMBERS, "endmember string, weight double"))
    return re.crossJoin(em).select("r_name", "endmember", "weight")


# join_interval_overlap blocking grid: 30-minute buckets over epoch-µs;
# intervals are 20 minutes, so each spans at most 2 buckets.
_IV_BUCKET_US = 1_800 * 1_000_000
_IV_DUR_US = 1_200 * 1_000_000


@register(
    "join_interval_overlap",
    oracle="""
        WITH a AS (
            SELECT user_id, event_id AS event_id_a,
                   EPOCH_US(ts) AS sa, EPOCH_US(ts) + 1200000000 AS ea
            FROM events WHERE event_type = 'click'
        ), b AS (
            SELECT user_id, event_id AS event_id_b,
                   EPOCH_US(ts) AS sb, EPOCH_US(ts) + 1200000000 AS eb
            FROM events WHERE event_type = 'purchase'
        )
        SELECT a.user_id, event_id_a, event_id_b,
               LEAST(ea, eb) - GREATEST(sa, sb) AS overlap_us
        FROM a JOIN b ON a.user_id = b.user_id AND sa < eb AND sb < ea
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11: interval-OVERLAP join (both sides are interval sets — activity
    windows, scene validity spans) through BUCKETIZED blocking: each
    interval explodes to the 30-minute epoch buckets it touches (≤2 here),
    the sides equi-join on (key, bucket), the exact overlap predicate runs
    only on co-bucketed candidates, and ``distinct`` collapses the pairs
    that met in two shared buckets.  This is §2.3 J6's "at scale:
    bucketize then equi-join" claim actually demonstrated: shuffle volume
    is rows × ≤2, never |A|×|B| per key — while the ORACLE runs the naive
    per-key theta join, proving blocked == brute force.  Bucket width is
    the tuning knob: ≥ max interval length keeps the fan-out ≤2, smaller
    widths trade fan-out for candidate selectivity.  Determinism: all
    arithmetic is exact int64 epoch-µs (integer ``div`` for bucketing —
    a double divide would round near bucket edges); the overlap length is
    an integer subtraction."""
    ev = load(spark, sf_dir, "events")

    def side(etype: str, tag: str):
        return ev.where(F.col("event_type") == etype).select(
            "user_id",
            F.col("event_id").alias(f"event_id_{tag}"),
            F.unix_micros("ts").alias(f"s{tag}"),
            (F.unix_micros("ts") + F.lit(_IV_DUR_US)).alias(f"e{tag}"),
        )

    def explode_buckets(df, tag: str):
        return df.withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.expr(f"s{tag} div {_IV_BUCKET_US}"),
                    F.expr(f"(e{tag} - 1) div {_IV_BUCKET_US}"),
                )
            ),
        )

    a = explode_buckets(side("click", "a"), "a")
    b = explode_buckets(side("purchase", "b"), "b")
    return (
        a.join(b, ["user_id", "bucket"])
        .where((F.col("sa") < F.col("eb")) & (F.col("sb") < F.col("ea")))
        .select(
            "user_id",
            "event_id_a",
            "event_id_b",
            (
                F.least("ea", "eb") - F.greatest("sa", "sb")
            ).alias("overlap_us"),
        )
        .distinct()
    )


_RB_DAYS = 7  # interval width AND grid-cell width (cells/interval <= 2)
_RB_MIN_QTY = 45  # interval-side predicate: bounds the pair fan-out ~8x


@register(
    "join_range_bucket",
    oracle=f"""
        SELECT l.l_returnflag,
               COUNT(*) AS n_pairs,
               {sql_dsum('o.o_totalprice * CAST(9.5367431640625e-07 AS DOUBLE)',
                         'sum_price_scaled')}
        FROM lineitem l
        JOIN orders o
          ON o.o_orderpriority = '1-URGENT'
         AND o.o_orderdate >= l.l_shipdate
         AND o.o_orderdate < l.l_shipdate + INTERVAL {_RB_DAYS} DAY
        WHERE l.l_quantity >= {_RB_MIN_QTY}
        GROUP BY l.l_returnflag
    """,
)
def join_range_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6+ at scale: interval-point range join where the INTERVAL side is
    the big table — the case ``join_range``'s broadcast nested-loop form
    cannot touch (a nested-loop over 600k intervals × 150k points is
    quadratic; a theta-join has no shuffle key at all).  The scalable
    form quantizes both sides onto a fixed 7-day grid: each ``[shipdate,
    shipdate+7d)`` interval covers at most TWO grid cells (cell width ≥
    interval width) and explodes into them; points map to exactly one
    cell; a plain EQUI-join on the cell key co-locates every candidate
    pair, and the exact interval predicate filters residents of the
    shared cell that don't actually overlap — linear, skew governed by
    cell population, no nested loop anywhere (pinned: the plan contains
    no BroadcastNestedLoopJoin/CartesianProduct).  The oracle is the
    declarative theta-join (DuckDB plans it as an IEJoin).
    The summed measure is pre-scaled by 2⁻²⁰ (an exact power of two —
    the agg_gini lesson): the pair fan-out grows with SF² and the raw
    price sum blew past the decimal path's int64 hop at the 10× replica
    (measured CAST_OVERFLOW at Σ≈4e14); scaling puts the sum inside
    dsum_fast's lane domain at every tier.  Since r12 the point side is
    PRE-AGGREGATED per distinct (o_orderdate, cell) value before the
    join (guide §2.3): the measure and the pair count are additive over
    points, the long-lane accumulators re-aggregate exactly, and the
    SF²-growing pair stream never materializes — the join attaches a
    broadcast of ~|distinct dates| pre-summed rows and the exact
    predicate still runs per candidate (10.1 s → 1.2 s warm min at
    sf0.1, hash-identical output; see OPTIMIZATION_r12.md).  The
    interval side
    also carries a pushed quantity predicate: the demonstration needs
    the fact×fact JOIN geometry, not an unbounded fan-out — the filter
    is pushed to the parquet scan and cuts candidate rows ~8× (the
    realistic "recent high-value lines" slice).
    """
    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= _RB_MIN_QTY)
    od = load(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    epoch_days_l = F.datediff(F.col("l_shipdate"), F.lit("1970-01-01"))
    epoch_days_o = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    cell_l = F.floor(epoch_days_l / _RB_DAYS)
    intervals = li.select(
        "l_returnflag",
        "l_shipdate",
        F.explode(F.array(cell_l, cell_l + 1)).alias("cell"),
    )
    # r12 (guide §2.3 "aggregate before you shuffle" / §8 "decide with small
    # rows"): the measure and the pair count are ADDITIVE over the point
    # side, so aggregate points per DISTINCT (o_orderdate, cell) value
    # BEFORE the join — dsum_fast's long-lane accumulators (hi/lo int64
    # part sums of the 10^-10-scaled decimal addend) re-aggregate exactly
    # because integer addition is associative, so the regrouped total is
    # bit-identical to the per-pair sum.  The join then attaches ~|distinct
    # dates| pre-summed rows (broadcast) instead of materializing the full
    # SF²-growing pair stream through the decimal cast: at sf0.1 the
    # per-pair form evaluated the dec-cast 2x per pair over ~24M pairs
    # (measured 10.1 s); this form does it once per point row and flows
    # ~2.4k aggregate rows (measured 1.2 s).  The exact interval predicate
    # is unchanged and still applied per candidate, so the semantics hold
    # at ANY time grain — nothing assumes date-aligned timestamps.
    x = F.col("o_totalprice") * F.lit(9.5367431640625e-07)
    # r13 (r12 ADVICE): the hi/lo lane split now comes from det.py's
    # exported fast_sum_parts/fast_sum_reassemble — one home for the
    # constants the bit-identity claim depends on; identical expressions
    hi, lo = fast_sum_parts(x)
    per_val = (
        od.select(
            "o_orderdate",
            F.floor(epoch_days_o / _RB_DAYS).alias("cell"),
            hi.alias("hi"),
            lo.alias("lo"),
        )
        .groupBy("o_orderdate", "cell")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("hi").alias("hi_s"),
            F.sum("lo").alias("lo_s"),
        )
    )
    upper = F.col("l_shipdate") + F.expr(f"INTERVAL {_RB_DAYS} DAYS")
    pairs = intervals.join(F.broadcast(per_val), "cell").where(
        (F.col("o_orderdate") >= F.col("l_shipdate")) & (F.col("o_orderdate") < upper)
    )
    # identical reassembly to det._fast_dec_sum (shared helper): Σhi·2^13
    # + Σlo in decimal(38,0), the scale-restoring /10^10 (decimal(38,6),
    # HALF_UP pre-round at 6 dp), then the exact int64 hop
    return pairs.groupBy("l_returnflag").agg(
        F.sum("cnt").cast("long").alias("n_pairs"),
        exact_double(fast_sum_reassemble(F.sum("hi_s"), F.sum("lo_s"))).alias(
            "sum_price_scaled"
        ),
    )


_ASOF_TOL = 3600  # nearest-match tolerance, seconds


@register(
    "join_asof_nearest",
    oracle=f"""
        WITH p AS (
            SELECT user_id, event_id,
                   CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS psec
            FROM events WHERE event_type = 'purchase'
        ), v AS (
            SELECT user_id, event_id AS v_event_id,
                   CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS vsec
            FROM events WHERE event_type = 'view'
        ), cand AS (
            SELECT p.user_id, p.event_id, p.psec, v.v_event_id, v.vsec,
                   ABS(p.psec - v.vsec) AS adist
            FROM p JOIN v ON p.user_id = v.user_id
            WHERE ABS(p.psec - v.vsec) <= {_ASOF_TOL}
        ), ranked AS (
            SELECT user_id, event_id, v_event_id, vsec, adist,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, event_id
                       ORDER BY adist, vsec, v_event_id
                   ) AS rk
            FROM cand
        )
        SELECT user_id, event_id, v_event_id AS nearest_view_id,
               CAST(adist AS BIGINT) AS gap_sec
        FROM ranked WHERE rk = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7+: nearest-in-time AS-OF join with tolerance — pandas
    ``merge_asof(direction='nearest', tolerance=…)`` semantics: each
    purchase matches its closest view event within ±{_ASOF_TOL}s (ties →
    earlier event, then id), purchases with no in-tolerance view drop.
    Completes the as-of family beside ``join_asof``'s backward-only
    match.

    Spark-first: the candidates-then-argmin pattern IN TIME — both sides
    key on (user, ⌊sec/T⌋) and the probe side explodes into its ±1
    adjacent buckets, so a nearest match within T is ALWAYS co-bucketed
    (never a per-user all-pairs); the winner is one min-of-struct
    aggregate (|Δ|, vsec, id — deterministic tie order), no window over
    the candidate set.  The oracle runs the per-user all-pairs form:
    bucketed == exhaustive.  Whole-second integers end to end."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts").alias("sec")
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.col("sec").alias("psec"),
            F.floor(F.col("sec") / _ASOF_TOL).cast("long").alias("b"),
        )
        .select(
            "*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("db")
        )
        .select(
            "user_id", "event_id", "psec", (F.col("b") + F.col("db")).alias("bkt")
        )
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("v_event_id"),
        F.col("sec").alias("vsec"),
        F.floor(F.col("sec") / _ASOF_TOL).cast("long").alias("bkt"),
    )
    adist = F.abs(F.col("psec") - F.col("vsec"))
    cand = (
        p.join(v, (p["user_id"] == v["v_user"]) & (p["bkt"] == v["bkt"]))
        .where(adist <= _ASOF_TOL)
        .select("user_id", "event_id", adist.alias("adist"), "vsec", "v_event_id")
    )
    m = cand.groupBy("user_id", "event_id").agg(
        F.min(F.struct("adist", "vsec", "v_event_id")).alias("m")
    )
    return m.select(
        "user_id",
        "event_id",
        F.col("m.v_event_id").alias("nearest_view_id"),
        F.col("m.adist").cast("bigint").alias("gap_sec"),
    )


@register(
    "agg_fifo_allocation",
    oracle="""
        WITH ins AS (
            SELECT l_partkey AS part,
                   l_orderkey * 10 + l_linenumber AS in_id,
                   CAST(FLOOR(l_quantity) AS BIGINT) AS q,
                   CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) OVER (
                       PARTITION BY l_partkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS hi
            FROM lineitem WHERE l_returnflag = 'N'
        ), outs AS (
            SELECT l_partkey AS part,
                   l_orderkey * 10 + l_linenumber AS out_id,
                   CAST(FLOOR(l_quantity) AS BIGINT) AS q,
                   CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) OVER (
                       PARTITION BY l_partkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS hi
            FROM lineitem WHERE l_returnflag = 'R'
        )
        SELECT i.part, i.in_id, o.out_id,
               LEAST(i.hi, o.hi)
                 - GREATEST(i.hi - i.q, o.hi - o.q) AS qty_alloc
        FROM ins i JOIN outs o ON i.part = o.part
        WHERE LEAST(i.hi, o.hi) > GREATEST(i.hi - i.q, o.hi - o.q)
    """,
)
def agg_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A21: FIFO lot allocation — match each outbound lot against
    inbound lots in first-in-first-out order (inventory costing, tax-lot
    accounting, queue attribution).  The classic relational solution:
    both sides become half-open intervals on their own RUNNING-QUANTITY
    axis ([cum−q, cum)), and FIFO matching IS interval overlap — out lot
    o consumes min(hi_i, hi_o) − max(lo_i, lo_o) units of in lot i
    wherever the intervals intersect.  No loops, no per-lot state.

    Spark-first: two cumulative windows share the (part, date, id)
    ordering; candidates meet on the PART equi-join (per-part lot counts
    bound the fan-out; a global interval index isn't needed because the
    axis is per-part).  All integer arithmetic — quantities floor to
    bigint on both engines (the double/integer cast convention)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        "l_returnflag",
        F.floor("l_quantity").cast("bigint").alias("q"),
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def lots(flag: str, id_alias: str) -> DataFrame:
        return (
            li.where(F.col("l_returnflag") == flag)
            .select(
                F.col("l_partkey").alias("part"),
                (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias(id_alias),
                "q",
                F.sum("q").over(w).cast("bigint").alias("hi"),
                "l_shipdate",
                "l_orderkey",
                "l_linenumber",
            )
            .drop("l_shipdate", "l_orderkey", "l_linenumber")
        )

    ins = lots("N", "in_id").withColumnsRenamed({"q": "iq", "hi": "ihi"})
    outs = lots("R", "out_id").withColumnsRenamed({"q": "oq", "hi": "ohi"})
    lo_i = F.col("ihi") - F.col("iq")
    lo_o = F.col("ohi") - F.col("oq")
    alloc = F.least("ihi", "ohi") - F.greatest(lo_i, lo_o)
    return (
        ins.join(outs, "part")
        .where(alloc > 0)
        .select("part", "in_id", "out_id", alloc.alias("qty_alloc"))
    )
