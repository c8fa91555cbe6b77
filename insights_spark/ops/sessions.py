"""Sessionization — gaps-and-islands over per-user event streams.

A web-scale training-data pipeline needs user/session rollups (session
boundaries feed both analytics and per-session document grouping). The
reference has no session operator (its closest shape is the chunked
driver loop, insights.py:1-40); this is engine-native:

Batch path (:func:`sessionize`): classic gaps-and-islands —
``lag(ts) OVER (PARTITION BY user ORDER BY ts)`` → new-session flag when
the gap exceeds the timeout → running SUM of flags = session index →
one groupBy((user, session_idx)). Two window passes + one aggregation,
ALL partitioned by user_id: no global shuffle, no driver state, skew
bounded by the busiest single user (AQE splits beyond that).

Streaming path: use ``F.session_window(ts_col, gap)`` in a watermarked
``groupBy`` (see streaming/ingest.py) — Spark's native session windows
hold only open-session state per key.

Exactly SQL-expressible (lag/sum windows), so the driver oracle pins the
full semantics including tie handling: ties on ts order by the event id
so both engines see the same lag sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """One row per (user, session): session_idx (1-based, chronological),
    session_start, session_end, n_events.

    A new session starts when the gap since the previous event of the SAME
    user exceeds ``gap_minutes`` (strict >; an exactly-gap-sized pause
    stays in-session, matching the SQL oracle's comparison). The gap test
    is interval arithmetic (``ts - prev > INTERVAL n SECONDS``): exact
    integer microseconds on both engines — no epoch floats, no timezone
    interpretation of TIMESTAMP_NTZ.
    """
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    gap_us = int(round(float(gap_minutes) * 60.0 * 1_000_000))
    prev_ts = F.lag(ts_col).over(w)
    is_new = (
        prev_ts.isNull()
        | (
            (F.col(ts_col) - prev_ts)
            > F.expr(f"INTERVAL {gap_us} MICROSECONDS")
        )
    ).cast("int")
    sess = (
        events.select(user_col, ts_col, id_col)
        .withColumn("_new", is_new)
        .withColumn("session_idx", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ))
    )
    return (
        sess.groupBy(F.col(user_col).alias("user_id"), "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )


def rolling_user_activity(
    events: DataFrame,
    window_seconds: float = 3600.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Trailing-window activity per event: for every event, how many
    events the SAME user produced in the preceding `window_seconds`
    (inclusive of now) — the RANGE-frame window family (sliding count,
    no fixed bucketing like the tumbling tile/period rollups).

    Frame semantics are VALUE-based (RANGE, not ROWS): all events with
    equal timestamps fall in or out of the frame together, so the result
    is deterministic regardless of tie order — no tiebreaker needed.
    ORDER BY is epoch seconds as a double (micros/1e6 — the identical
    IEEE value DuckDB's epoch() computes), because Spark range frames
    need a numeric sort key. One user-keyed shuffle, like sessionize.
    """
    sec = F.col(ts_col).cast("timestamp").cast("double")
    # pyspark rangeBetween takes integer bounds (cast to the double order
    # key at plan time); fractional window lengths would need an expr frame
    w = (
        Window.partitionBy(user_col)
        .orderBy(sec)
        .rangeBetween(-int(window_seconds), 0)
    )
    return events.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.col(ts_col).alias("ts"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_trailing"),
    )
