"""Watermarked streaming windows (streaming/windows.py): finalized
windows must equal the batch computation; unfinalized ones stay in
state; late-beyond-watermark data is dropped."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from search_engine_spark.operators.events import windowed_counts
from search_engine_spark.streaming.windows import streaming_windowed_counts

BASE = dt.datetime(2024, 3, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, BASE + dt.timedelta(minutes=m), 1, et, float(v), "{}")
            for i, (m, et, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_finalized_windows_match_batch(spark, tmp_path):
    inp, state = str(tmp_path / "in"), str(tmp_path / "st")
    # hours 0,1,2 populated; watermark 30m → with max ts at 02:10 the
    # watermark is 01:40: windows [00:00,01:00) and [01:00,02:00)
    # finalize, [02:00,03:00) stays in state
    rows = [
        (5, "click", 1), (20, "view", 2), (61, "click", 3),
        (75, "click", 4), (130, "view", 5),
    ]
    _events(spark, rows).write.parquet(f"{inp}/drop1")
    out = streaming_windowed_counts(spark, f"{inp}/drop*", state)
    got = {
        (r["ws"], r["event_type"], r["n"], r["sum_value"]) for r in out.collect()
    }
    batch = windowed_counts(_events(spark, rows))
    finalized_cutoff = BASE + dt.timedelta(minutes=130 - 30)
    expected = {
        (r["ws"], r["event_type"], r["n"], r["sum_value"])
        for r in batch.collect()
        # a window [ws, ws+1h) finalizes when watermark > window end
        if r["ws"] + dt.timedelta(hours=1) <= finalized_cutoff
    }
    assert got == expected
    # watermark = 02:10 - 30m = 01:40 < 02:00, so ONLY the hour-0
    # windows have finalized; hour-1 stays in state for the next drain
    assert len(got) == 2  # 00h click, 00h view

    # second drop advances the watermark → hour-2 window finalizes;
    # a too-late hour-0 event (beyond watermark) must be DROPPED
    rows2 = [(250, "click", 7), (10, "click", 99)]  # 04:10 + a straggler at 00:10
    _events(spark, rows2).write.parquet(f"{inp}/drop2")
    out2 = streaming_windowed_counts(spark, f"{inp}/drop*", state)
    got2 = {(r["ws"], r["event_type"]): (r["n"], r["sum_value"]) for r in out2.collect()}
    h1 = (BASE + dt.timedelta(hours=1), "click")
    assert got2[h1] == (2, 7.0)  # hour-1 window (2 clicks) emitted on drain 2
    h2 = (BASE + dt.timedelta(hours=2), "view")
    assert got2[h2] == (1, 5.0)  # hour-2 window emitted on the 2nd drain
    h0 = (BASE, "click")
    assert got2[h0] == (1, 1.0)  # straggler did NOT mutate the emitted hour-0 window
