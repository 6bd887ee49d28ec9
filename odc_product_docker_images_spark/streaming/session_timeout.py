"""Custom stateful sessions with EVENT-TIME TIMEOUT (SURVEY.md §2.9 T3+/T6+).

``stream_session`` uses the built-in ``session_window`` (gap merging done
by Spark); this operator is the HAND-ROLLED version every pipeline needs
the day its session rule stops being "fixed gap": arbitrary per-key state
via ``applyInPandasWithState`` plus ``GroupStateTimeout.EventTimeTimeout``
— the state machine emits a session ONLY when the WATERMARK passes the
session's close time (last event + gap), which is exactly how finalized,
never-amended session records must be produced under late data.

Lifecycle per key and micro-batch:
- data arrives  → fold it into (start, last_ts, n, sum), arm the timeout
  at ``last_ts + GAP``, emit nothing (the session is still open);
- timeout fires → the watermark proved no more in-gap events can arrive:
  emit the FINALIZED session row, drop the state.

Spark runs an extra no-data micro-batch when the watermark advances so
armed timeouts fire deterministically; sessions whose close time the
watermark never passes stay open and are never emitted — both behaviors
are pinned by the key's literal-feed oracle (finalized sessions exactly
for users 1, 2, 3; the user-4 session remains open at shutdown).
"""

from __future__ import annotations

import uuid
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import register

_GAP_MS = 30 * 60 * 1000  # 30 min session gap

_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp,"
    " n_events long, sum_value double"
)
_STATE_SCHEMA = "start_ms long, last_ms long, n long, s double"


def _session_fsm(key, pdfs, state: GroupState):
    (user_id,) = key
    if state.hasTimedOut:
        start_ms, last_ms, n, s = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(last_ms, unit="ms")],
                "n_events": [n],
                "sum_value": [s],
            }
        )
        return
    start_ms = last_ms = None
    n, s = 0, 0.0
    if state.exists:
        start_ms, last_ms, n, s = state.get
    for pdf in pdfs:
        if not len(pdf):
            continue
        # normalize whatever datetime64 unit Arrow handed over straight
        # to epoch-ms (astype("int64") alone would be unit-dependent)
        ms = pdf["ts"].to_numpy().astype("datetime64[ms]").astype("int64")
        lo, hi = int(ms.min()), int(ms.max())
        start_ms = lo if start_ms is None else min(start_ms, lo)
        last_ms = hi if last_ms is None else max(last_ms, hi)
        n += int(len(pdf))
        s += float(pdf["value"].sum())
    state.update((start_ms, last_ms, n, s))
    # arm: fire when the watermark passes last-event + gap
    state.setTimeoutTimestamp(last_ms + _GAP_MS)
    return
    yield  # pragma: no cover — generator form required by the API


@register(
    "stream_session_timeout",
    oracle="""
        SELECT * FROM (VALUES
            (CAST(1 AS BIGINT), TIMESTAMP '2024-01-01 10:00:00',
             TIMESTAMP '2024-01-01 10:10:00', CAST(2 AS BIGINT), 3.0),
            (CAST(2 AS BIGINT), TIMESTAMP '2024-01-01 10:05:00',
             TIMESTAMP '2024-01-01 10:05:00', CAST(1 AS BIGINT), 5.0),
            (CAST(3 AS BIGINT), TIMESTAMP '2024-01-01 12:00:00',
             TIMESTAMP '2024-01-01 12:00:00', CAST(1 AS BIGINT), 7.0)
        ) AS t(user_id, session_start, session_end, n_events, sum_value)
    """,
)
def stream_session_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3+/T6+: watermark-finalized custom sessions.  Feed: users 1+2 in
    batch 0; batch 1's 12:00 event advances the watermark past their
    close times → their sessions FINALIZE via timeout; batch 2's 13:30
    event finalizes user 3 the same way; user 4's session is still open
    when the query stops and must NOT appear.  Append mode: each emitted
    row is immutable — the contract downstream ledgers need."""
    from . import streams as S

    feed = Path(__file__).resolve().parents[2] / ".tmp" / f"sesto_{uuid.uuid4().hex[:8]}"
    feed.mkdir(parents=True, exist_ok=True)
    name = "sesto_" + uuid.uuid4().hex[:6]
    sessions = (
        S.events_stream(spark, str(feed))
        .withWatermark("ts", "10 minutes")
        .select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fsm,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    with S.small_state(spark):
        q = (
            sessions.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        S.write_feed_file(
            str(feed),
            0,
            [
                (1, 1, "2024-01-01T10:00:00", "click", 1.0),
                (2, 1, "2024-01-01T10:10:00", "click", 2.0),
                (3, 2, "2024-01-01T10:05:00", "view", 5.0),
            ],
        )
        q.processAllAvailable()
        S.write_feed_file(str(feed), 1, [(4, 3, "2024-01-01T12:00:00", "click", 7.0)])
        q.processAllAvailable()
        S.write_feed_file(str(feed), 2, [(5, 4, "2024-01-01T13:30:00", "view", 9.0)])
        q.processAllAvailable()
        q.stop()
    return spark.table(name).select(
        "user_id", "session_start", "session_end", "n_events", "sum_value"
    )
