"""Stateful streaming sessionization (applyInPandasWithState):
data-driven closes emit immediately; open sessions close via event-time
timeout once the watermark passes their gap horizon (AvailableNow runs
a trailing batch, so timeouts reachable by the drain's own watermark
fire within the same drain); state survives across drains."""

from __future__ import annotations

import datetime as dt

from search_engine_spark.streaming.sessions import streaming_sessions

BASE = dt.datetime(2024, 3, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, BASE + dt.timedelta(minutes=m), u, "click", 1.0, "{}")
            for i, (u, m) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _collect(df):
    return {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in df.collect()
    }


def _s(u, m0, m1, n):
    return (u, BASE + dt.timedelta(minutes=m0), BASE + dt.timedelta(minutes=m1), n)


def test_sessions_close_by_gap_and_timeout(spark, tmp_path):
    inp, state = str(tmp_path / "in"), str(tmp_path / "st")

    # drain 1: u1's in-batch gap (00:10 -> 01:30) closes one session by
    # DATA; the drain's watermark (01:30 - 30m = 01:00) then times out
    # u2's open session (horizon 00:35). u1's 01:30 session stays open
    # (horizon 02:00 > 01:00).
    _events(spark, [(1, 0), (1, 10), (1, 90), (2, 5)]).write.parquet(f"{inp}/d1")
    out1 = _collect(streaming_sessions(spark, f"{inp}/d*", state))
    s1, s2 = _s(1, 0, 10, 2), _s(2, 5, 5, 1)
    assert out1 == {s1, s2}

    # drain 2: 03:00 data → watermark 02:30 ≥ u1's 02:00 horizon → the
    # session held in state SINCE DRAIN 1 times out; u3 stays open.
    _events(spark, [(3, 180)]).write.parquet(f"{inp}/d2")
    out2 = _collect(streaming_sessions(spark, f"{inp}/d*", state))
    s3 = _s(1, 90, 90, 1)
    assert out2 == {s1, s2, s3}
    assert not any(u == 3 for u, *_ in out2)  # u3 still open in state

    # drain 3: 05:00 data → watermark 04:30 ≥ u3's 03:30 horizon.
    _events(spark, [(4, 300)]).write.parquet(f"{inp}/d3")
    out3 = _collect(streaming_sessions(spark, f"{inp}/d*", state))
    s4 = _s(3, 180, 180, 1)
    assert out3 == {s1, s2, s3, s4}
    assert not any(u == 4 for u, *_ in out3)  # newest session open


def test_late_event_extends_or_splits(spark, tmp_path):
    """Within-watermark out-of-order events: one just before the open
    session extends its start backward; one older than start by more
    than the gap becomes its own immediately-closed session."""
    inp, state = str(tmp_path / "in2"), str(tmp_path / "st2")

    _events(spark, [(1, 100), (2, 100)]).write.parquet(f"{inp}/d1")
    streaming_sessions(spark, f"{inp}/d*", state, watermark="10 hours")
    # u1: late event 10m before its open session (within gap) → extend;
    # u2: late event 90m before (beyond gap) → separate closed session
    _events(spark, [(1, 90), (2, 10)]).write.parquet(f"{inp}/d2")
    streaming_sessions(spark, f"{inp}/d*", state)
    # force timeouts with far-future data
    _events(spark, [(9, 2000)]).write.parquet(f"{inp}/d3")
    out = _collect(streaming_sessions(spark, f"{inp}/d*", state))
    assert _s(1, 90, 100, 2) in out      # extended backward
    assert _s(2, 10, 10, 1) in out       # split into its own session
    assert _s(2, 100, 100, 1) in out     # original open session intact


def test_late_event_chain_merges(spark, tmp_path):
    """A chain of late events, each older than the open session by more
    than the gap but within the gap of EACH OTHER, must fold into one
    merged session (batch-twin parity) — not one session per event
    (r1 advisory)."""
    inp, state = str(tmp_path / "in3"), str(tmp_path / "st3")

    _events(spark, [(1, 200)]).write.parquet(f"{inp}/d1")
    streaming_sessions(spark, f"{inp}/d*", state, watermark="10 hours")
    # late chain at 10, 30, 50 (gaps 20m ≤ 30m) — far older than the
    # open session at 200 (gap 150m > 30m)
    _events(spark, [(1, 50), (1, 10), (1, 30)]).write.parquet(f"{inp}/d2")
    streaming_sessions(spark, f"{inp}/d*", state)
    _events(spark, [(9, 2000)]).write.parquet(f"{inp}/d3")
    out = _collect(streaming_sessions(spark, f"{inp}/d*", state))
    assert _s(1, 10, 50, 3) in out       # one merged late session
    assert _s(1, 200, 200, 1) in out     # open session untouched
    assert not any(
        s in out for s in [_s(1, 10, 10, 1), _s(1, 30, 30, 1), _s(1, 50, 50, 1)]
    )
