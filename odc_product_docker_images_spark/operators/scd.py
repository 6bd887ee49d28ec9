"""Slowly-changing-dimension (SCD type 2) history builder (SURVEY.md §2.8
storage-family extension — the warehouse-side twin of the versioned-table
change feed).

Reference analog: a product catalog rebuilds "what was true when" from an
append-only change log.  The relational form is two window passes over one
partitioned sort: collapse no-op updates (attribute unchanged vs previous
row), then derive each surviving row's validity interval from its
successor.  No joins, no state store — at 100 TB this is a single shuffle
on the dimension key with everything else map-side, and it composes with
`join_asof` / `join_range` for point-in-time lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register


@register(
    "table_scd2_build",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        ), changes AS (
            SELECT user_id, event_type, ts, event_id
            FROM ordered
            WHERE prev_type IS NULL OR event_type <> prev_type
        )
        SELECT user_id,
               event_type AS state,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS BIGINT) AS version,
               ts AS valid_from,
               LEAD(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS valid_to,
               CAST(LEAD(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) IS NULL AS BOOLEAN) AS is_current
        FROM changes
    """,
)
def table_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: build an SCD2 validity-interval dimension from the event log.
    Each user's event_type plays the tracked attribute: consecutive
    duplicates collapse (a no-op update opens no new version), every
    surviving change opens a version stamped ``[valid_from, valid_to)``
    with the successor's timestamp as the exclusive upper bound and
    ``is_current`` on the open interval.  Spark-first: ONE
    ``Window.partitionBy(user_id).orderBy(ts, event_id)`` sort feeds the
    lag-collapse, the version numbering, and the lead-derived interval —
    the filter between the two window passes reuses the same partitioning
    so the whole build is a single shuffle.  Ordering carries the unique
    ``event_id`` tie-break (repo convention).
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .drop("prev_type")
    )
    valid_to = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.row_number().over(w).cast("long").alias("version"),
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


@register(
    "join_scd2_asof",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        ), changes AS (
            SELECT user_id, event_type, ts, event_id
            FROM ordered
            WHERE prev_type IS NULL OR event_type <> prev_type
        ), dim AS (
            SELECT user_id,
                   event_type AS state,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS BIGINT) AS version,
                   ts AS valid_from,
                   LEAD(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS valid_to
            FROM changes
        ), fact AS (
            SELECT user_id, event_id, ts, value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT f.user_id, f.event_id, f.ts, f.value,
               d.state AS state_at_purchase, d.version
        FROM fact f JOIN dim d
          ON f.user_id = d.user_id
         AND f.ts >= d.valid_from
         AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    """,
)
def join_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8+: point-in-time (AS OF) lookup against the SCD2 dimension —
    the read side of ``table_scd2_build``: each purchase joins the
    version whose ``[valid_from, valid_to)`` interval covers its
    timestamp, recovering "what was true when" (the bitemporal lookup
    every audit/attribution backfill runs).

    Spark-first: the interval predicate rides an EQUI-join on the
    dimension key — per-key fan-out is the user's version count (bounded
    by their change history), never a nested-loop over intervals; the
    covering interval is unique by construction (intervals partition the
    timeline), so no dedup pass is needed.  Two scans total (history
    build + fact slice), one dimension-key shuffle each side."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .drop("prev_type")
    )
    dim = changes.select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("state"),
        F.row_number().over(w).cast("long").alias("version"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    fact = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    cond = (
        (fact["user_id"] == dim["d_user"])
        & (fact["ts"] >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (fact["ts"] < dim["valid_to"]))
    )
    return fact.join(dim, cond).select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.col("state").alias("state_at_purchase"),
        "version",
    )
