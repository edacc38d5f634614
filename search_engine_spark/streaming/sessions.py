"""Custom stateful streaming operator: gap-based sessionization via
applyInPandasWithState (the brief's "custom stateful operators" shape).

Batch twin: operators/events.user_sessions (lag/cumsum windows). The
streaming form keeps ONE open session per user in state:

- incoming events (per user, per microbatch) are sorted and folded into
  the open session; a gap > `gap_minutes` CLOSES the current session
  (emitted immediately) and opens a new one;
- the trailing open session stays in state with an EVENT-TIME timeout
  at last_ts + gap: when the watermark passes it, the state times out
  and the session is emitted with no further data — exactly how a
  production sessionizer bounds state on an unbounded stream;
- append mode + stream checkpoint → each closed session is written
  exactly once.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
    ]
)

# state: (session_start_epoch_us, last_ts_epoch_us, n_events)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", IntegerType()),
    ]
)

_US = 1_000_000


def _session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * _US

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        def emit(start_us: int, last_us: int, n: int) -> None:
            closed.append(
                (
                    user_id,
                    dt.datetime.utcfromtimestamp(start_us / _US),
                    dt.datetime.utcfromtimestamp(last_us / _US),
                    n,
                )
            )

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            emit(start_us, last_us, n)
            state.remove()
        else:
            # interval gap-fold: the open session (start, last, n) and
            # each incoming event (t, t, 1) are intervals; sort by start
            # and merge neighbors whose gap is ≤ gap_us — EXACTLY the
            # batch twin's sort+fold, so a chain of late events older
            # than the open session merges into sessions among
            # themselves instead of one emitted session per event (r1
            # advisory), and a chain that reaches back within the gap of
            # the open session correctly extends it.
            intervals = [
                (int(t.value // 1000),) * 2 + (1,)
                for pdf in pdfs
                for t in pd.to_datetime(pdf["ts"])
            ]
            if state.exists:
                intervals.append(tuple(state.get))
            intervals.sort()
            cur = None
            for s, e, c in intervals:
                if cur is None:
                    cur = (s, e, c)
                elif s - cur[1] <= gap_us:
                    cur = (cur[0], max(cur[1], e), cur[2] + c)
                else:
                    emit(*cur)
                    cur = (s, e, c)
            if cur is not None:
                state.update(cur)
                # event-time timeout: fire once the watermark passes the
                # session's gap horizon
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)

        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    return fn


def streaming_sessions(
    spark: SparkSession,
    input_path: str,
    state_path: str,
    gap_minutes: int = 30,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Drain available event files; emit CLOSED sessions (gap elapsed in
    event time) to the sink. Open sessions persist in state across
    drains via the stream checkpoint."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_path)
    sessions = (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{state_path}/sink")
        .option("checkpointLocation", f"{state_path}/_ckpt")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    spark.catalog.refreshByPath(f"{state_path}/sink")
    return spark.read.parquet(f"{state_path}/sink")
