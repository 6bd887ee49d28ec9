"""Incremental materialized-view maintenance off the change feed
(SURVEY.md §2.1 S7 extension — the Delta/materialized-view pattern).

Own module so the key registers inside the driver grading window;
``sources.versioned`` is imported lazily INSIDE the query fn (a module-level
import would run its ``@register`` decorators early and scramble the
curated registration order — see registry._MODULES).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import dec_cast, exact_double, sql_dsum
from ..io import load
from ..registry import register

_BUCKETS = 16


@register(
    "table_incremental_agg",
    oracle=f"""
        WITH final AS (
            SELECT event_id,
                   CASE WHEN event_id < 1000 AND event_id % 2 = 0
                        THEN value + 1000 ELSE value END AS value
            FROM events
            UNION ALL
            SELECT event_id + 1000000, value * 2
            FROM events WHERE event_id < 100
        )
        SELECT CAST(event_id % {_BUCKETS} AS BIGINT) AS bucket,
               COUNT(*) AS n_rows,
               {sql_dsum("value", "sum_value")}
        FROM final GROUP BY 1
    """,
)
def table_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7+: maintain a materialized aggregate INCREMENTALLY from the
    versioned table's change feed — the reason a 100 TB deployment keeps a
    CDC feed at all.  Recipe: materialize MV₀ = per-bucket (count, exact
    decimal sum) at v0; MERGE a same-shaped update+insert batch (the
    table_change_feed recipe); then refresh the view by joining MV₀ with
    the PER-BUCKET DELTA of the v0→v1 change feed instead of re-scanning
    the table: Δcount = +1 per insert / -1 per delete, Δsum =
    Σ(value_after - value_before) with NULLs zeroed.  The oracle is the
    FULL recompute over the final state — incremental maintenance must be
    indistinguishable from recomputation, which holds exactly because
    every sum stays in decimal(38,10) space until one final rounding (the
    delta algebra is exact there; doubles would drift).

    Scale: the refresh reads ONLY the manifest-diff files (change_feed's
    bounded-CDC property, pinned in tests/test_versioned.py) plus the
    O(buckets) MV — a merge touching 0.1% of a 100 TB table refreshes the
    view at 0.2%-of-table cost, and the refresh join is O(bucket count)
    on both sides, not row count."""
    from .versioned import _fresh_table

    ev = load(spark, sf_dir, "events").select("event_id", "value")
    t = _fresh_table("mvinc")
    t.write(ev.repartitionByRange(8, "event_id"), mode="overwrite")

    bucket = F.pmod(F.col("event_id"), F.lit(_BUCKETS)).cast("bigint").alias("bucket")
    mv0 = (
        t.read(spark, 0)
        .groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n0"),
            F.sum(dec_cast("value")).alias("s0"),
        )
    )

    upd = ev.where((F.col("event_id") < 1000) & (F.col("event_id") % 2 == 0)).select(
        "event_id", (F.col("value") + 1000).alias("value")
    )
    ins = ev.where(F.col("event_id") < 100).select(
        (F.col("event_id") + 1_000_000).alias("event_id"),
        (F.col("value") * 2).alias("value"),
    )
    t.merge(spark, upd.unionByName(ins), key="event_id")

    feed = t.change_feed(spark, 0, t.latest_version(), key="event_id")
    zero = F.lit(0).cast("decimal(30,10)")
    delta = feed.groupBy(bucket).agg(
        F.sum(
            F.when(F.col("change_type") == "insert", 1)
            .when(F.col("change_type") == "delete", -1)
            .otherwise(0)
        ).alias("dn"),
        F.sum(
            F.coalesce(dec_cast("value_after"), zero)
            - F.coalesce(dec_cast("value_before"), zero)
        ).alias("ds"),
    )

    # Full outer (not broadcast: Spark can't broadcast a full-outer side):
    # inserts may mint buckets absent from MV₀ and deletes may empty one.
    # Both sides are O(bucket-count) rows, so this join is trivially small
    # at any table scale.
    # Addend typing is load-bearing: decimal(38,10) + decimal(38,10) would
    # come out decimal(38,9) under Spark's precision-loss adjustment — an
    # intermediate 9-dp half-up round the full-recompute oracle never
    # performs.  Casting both addends to decimal(32,10) first (lossless:
    # |sums| here are orders below 10^22) makes the add type decimal(33,10)
    # — exact, no narrowing — so the delta algebra stays bit-identical to
    # recomputation all the way to the final 6-dp round.
    d3210 = "decimal(32,10)"
    refreshed = mv0.join(delta, "bucket", "full").select(
        "bucket",
        (F.coalesce("n0", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n_rows"),
        exact_double(
            F.coalesce(F.col("s0"), zero).cast(d3210)
            + F.coalesce(F.col("ds"), zero).cast(d3210),
            6,
        ).alias("sum_value"),
    )
    return refreshed


@register(
    "table_incremental_join",
    oracle=f"""
        WITH final AS (
            SELECT o_orderkey, o_custkey,
                   CASE WHEN o_orderkey % 7 = 0 AND o_orderkey < 5000
                        THEN o_totalprice + 100.5 ELSE o_totalprice
                   END AS price
            FROM orders
            UNION ALL
            -- insert keys are DERIVED (max+1 offset): a literal offset
            -- collided with the 100x replica's own PK-shift stride, so
            -- the "inserts" silently became updates on the merge side
            -- while this recompute appended them (r11 100x find)
            SELECT o_orderkey + (SELECT MAX(o_orderkey) + 1 FROM orders),
                   o_custkey, o_totalprice * 2
            FROM orders WHERE o_orderkey < 200
        )
        SELECT c.c_mktsegment AS segment,
               COUNT(*) AS n_orders,
               {sql_dsum('price', 'sum_price')}
        FROM final f JOIN customer c ON f.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
)
def table_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7++: incremental maintenance of a JOIN-aggregate view — the step
    past ``table_incremental_agg``: the materialized view is revenue per
    customer segment over orders ⋈ customer, so the change-feed delta
    must be JOINED to the dimension before folding.  The IVM algebra is
    the signed-row form: each feed row unpivots into ≤2 signed deltas
    (−before, +after) — one uniform rule for inserts, deletes, updates,
    and even key-moving updates — which broadcast-join the dimension and
    fold per segment; the refresh then full-outer-joins MV₀ with the
    O(|segments|) delta.  The oracle recomputes the final state from
    scratch: IVM must be indistinguishable from recomputation, which
    holds exactly because the delta algebra runs in decimal(38,10) (the
    ``table_incremental_agg`` typing discipline — the adjustment +100.5
    and scaling ×2 are binary-exact on both engines).

    Scale: refresh cost is (manifest-diff files) ⋈ broadcast dim +
    O(segments) — a merge touching 0.1% of a 100 TB fact refreshes the
    joined view without re-scanning either table."""
    from .versioned import _fresh_table

    od = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.struct(
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("price"),
        ).alias("val"),
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    t = _fresh_table("mvjoin")
    t.write(od.repartitionByRange(8, "o_orderkey"), mode="overwrite")

    mv0 = (
        t.read(spark, 0)
        .join(F.broadcast(cust), F.col("val.custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n0"),
            F.sum(dec_cast("val.price")).alias("s0"),
        )
    )

    upd = od.where(
        (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") < 5000)
    ).select(
        "o_orderkey",
        F.struct(
            F.col("val.custkey").alias("custkey"),
            (F.col("val.price") + 100.5).alias("price"),
        ).alias("val"),
    )
    # data-derived insert-key offset (max+1): guarantees genuinely-new
    # keys at ANY fixture scale — the literal 10M offset was exactly the
    # scale replicas' PK-shift stride, so at 100x the inserts keyed onto
    # EXISTING rows and the merge absorbed them as updates (r11 find).
    # The view's aggregates don't depend on key VALUES, so in-domain
    # results (and the r7 driver hash) are unchanged.
    off = od.agg((F.max("o_orderkey") + F.lit(1)).alias("off"))
    ins = od.where(F.col("o_orderkey") < 200).crossJoin(F.broadcast(off)).select(
        (F.col("o_orderkey") + F.col("off")).alias("o_orderkey"),
        F.struct(
            F.col("val.custkey").alias("custkey"),
            (F.col("val.price") * 2).alias("price"),
        ).alias("val"),
    )
    t.merge(spark, upd.unionByName(ins), key="o_orderkey")

    feed = t.change_feed(
        spark, 0, t.latest_version(), key="o_orderkey", value_col="val"
    )
    # signed-row unpivot: -1·before (when present) and +1·after (when
    # present) — inserts/deletes/updates all reduce to the same algebra
    signed = feed.select(
        F.explode(
            F.array(
                F.when(
                    F.col("val_before").isNotNull(),
                    F.struct(
                        F.col("val_before.custkey").alias("ck"),
                        F.lit(-1).alias("dn"),
                        (-dec_cast("val_before.price")).alias("ds"),
                    ),
                ),
                F.when(
                    F.col("val_after").isNotNull(),
                    F.struct(
                        F.col("val_after.custkey").alias("ck"),
                        F.lit(1).alias("dn"),
                        dec_cast("val_after.price").alias("ds"),
                    ),
                ),
            )
        ).alias("d")
    ).where(F.col("d").isNotNull())

    delta = (
        signed.select("d.ck", "d.dn", "d.ds")
        .join(F.broadcast(cust), F.col("ck") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.sum("dn").alias("dn"), F.sum("ds").alias("ds"))
    )

    # decimal(32,10) addends: see table_incremental_agg's typing note
    zero = F.lit(0).cast("decimal(30,10)")
    d3210 = "decimal(32,10)"
    return mv0.join(delta, "segment", "full").select(
        "segment",
        (F.coalesce("n0", F.lit(0)) + F.coalesce("dn", F.lit(0)))
        .cast("bigint")
        .alias("n_orders"),
        exact_double(
            F.coalesce(F.col("s0"), zero).cast(d3210)
            + F.coalesce(F.col("ds"), zero).cast(d3210),
            6,
        ).alias("sum_price"),
    )
