"""Streaming event-time windows with watermarking (late-data handling).

Batch twin: operators/events.windowed_counts — same window expression,
so batch and streaming results are comparable (tested). Streaming adds:

- `withWatermark(ts, delay)`: events later than `delay` behind the max
  observed event time are dropped, and a window finalizes (emits, in
  append mode) only once the watermark passes its end — the standard
  bounded-state contract for unbounded streams.
- append output: each finalized window is written exactly once to the
  parquet sink; the stream checkpoint makes re-drains idempotent.

AvailableNow batch-drain semantics: windows newer than
(max event time - delay) remain in state, not in the sink — they emit
on the NEXT drain once later data advances the watermark. The test
asserts exactly that: emitted windows equal the batch computation
restricted to finalized windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def streaming_windowed_counts(
    spark: SparkSession,
    input_path: str,
    state_path: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Drain available event files → append finalized (ws, event_type,
    n, sum_value) windows to the sink; returns the sink contents."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_path)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sum_value")
    )
    (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{state_path}/sink")
        .option("checkpointLocation", f"{state_path}/_ckpt")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    spark.catalog.refreshByPath(f"{state_path}/sink")
    return spark.read.parquet(f"{state_path}/sink")
