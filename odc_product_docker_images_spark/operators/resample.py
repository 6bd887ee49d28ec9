"""Time-bucket OHLC resampling (A14/r5e).

Downsampling a series to per-bucket open/high/low/close bars is the
canonical time-series reduction (xarray's ``resample(time=...)`` on the
datacube side; OHLC bars everywhere else).  open/close are
ORDER-dependent aggregates — value at the earliest/latest observation —
which Spark expresses as ``min_by``/``max_by`` over a composite order
key and DuckDB as ``ARG_MIN``/``ARG_MAX``: one hash aggregate, full
map-side partials, no window pass and no self-join.

The order key packs (sec, event_id) into one BIGINT (sec·10^7 +
event_id — event_id stays unique below 10^7 at every fixture scale) so
the argmin tie-break is total and identical on both engines.  At
100 TB: a single grouped shuffle keyed (series, bucket); bar width
controls output cardinality, partial aggregation does the rest.
Determinism: open/high/low/close are RAW stored doubles picked or
compared (no arithmetic); the bucket mean takes the davg decimal path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import davg, sql_davg
from ..io import load
from ..registry import register

_BUCKET_S = 3600  # hourly bars
_OKEY = 10_000_000


@register(
    "agg_resample_ohlc",
    oracle=f"""
        WITH e AS (
            SELECT user_id,
                   CAST(FLOOR(CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT)
                        / {_BUCKET_S}) AS BIGINT) AS bucket,
                   CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) * {_OKEY}
                     + event_id AS okey,
                   value
            FROM events
        )
        SELECT user_id, bucket,
               COUNT(*) AS n_obs,
               ARG_MIN(value, okey) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               ARG_MAX(value, okey) AS close,
               {sql_davg("value", "mean_value")}
        FROM e GROUP BY user_id, bucket
    """,
)
def agg_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: hourly OHLC bars per series — order-dependent open/close via
    min_by/max_by over the packed (sec, event_id) key, plus high/low/
    count/mean; one grouped shuffle."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / F.lit(_BUCKET_S))
        .cast("bigint")
        .alias("bucket"),
        (F.unix_timestamp("ts") * F.lit(_OKEY) + F.col("event_id")).alias("okey"),
        "value",
    )
    return e.groupBy("user_id", "bucket").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.min_by("value", "okey").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "okey").alias("close"),
        davg("value", "mean_value"),
    )
