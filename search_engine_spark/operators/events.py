"""Event-time operators over the events table (engine additions).

The reference has no time semantics at all (SURVEY §2.8 — its only
timestamps are crawl bookkeeping); a training-data pipeline needs them
for log/telemetry joins, so the engine adds the two canonical shapes:

- tumbling-window aggregation: `F.window` (Catalyst-native; the same
  expression powers the Structured-Streaming path with a watermark);
- gap-based sessionization: lag/cumsum window functions — one shuffle
  on user_id, all JVM-side.

Both are ANSI-SQL-expressible, so both carry DuckDB oracles in
__spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """(ws, event_type, n, sum_value): tumbling event-time windows."""
    return (
        events.groupBy(
            F.window(F.col("ts"), window).alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sum_value")
    )


def user_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_id, n_events, duration_s): split each user's
    event stream at gaps > gap_minutes.

    session_id = running count of gap-breaks (ts - lag(ts) > gap) per
    user — two window passes over the same (user_id, ts) sort, so
    Catalyst plans ONE shuffle + one sort for both.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts arrives as TIMESTAMP_NTZ; ANSI forbids a direct long cast, so go
    # via timestamp (session tz pinned to UTC → deterministic epoch)
    e = F.col("ts").cast("timestamp").cast("long")
    gap = e - F.lag(e).over(w)
    with_break = events.withColumn(
        "brk", F.when(gap > gap_minutes * 60, 1).otherwise(0)
    )
    with_sess = with_break.withColumn(
        "session_id", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.max(F.col("ts").cast("timestamp").cast("long"))
                - F.min(F.col("ts").cast("timestamp").cast("long"))
            ).alias("duration_s"),
        )
    )
