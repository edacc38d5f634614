"""AS-OF and RANGE join operators (brief's custom-operator checklist:
operators Spark lacks natively, expressed as compositions of built-in
DataFrame ops). The risky parts are the tie rules (asof) and the
interval bucketing (range) — both pinned here against brute force."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from search_engine_spark.operators.events import asof_join, range_join

BASE = dt.datetime(2024, 5, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, BASE + dt.timedelta(seconds=s), u, t, float(v), "{}")
            for i, (u, t, s, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_asof_semantics_and_ties(spark):
    ev = _events(spark, [
        (1, "purchase", 0, 10),     # id 0
        (1, "click", 5, 0),         # id 1 → sees 10
        (1, "purchase", 5, 20),     # id 2: same-ts as click id 1? no — click at 5 too
        (1, "click", 5, 0),         # id 3 → same ts as purchase id 2 → sees 20
        (1, "click", 9, 0),         # id 4 → sees 20
        (2, "click", 1, 0),         # id 5 → no prior purchase → NULL
    ])
    got = {r["event_id"]: r["asof_value"] for r in asof_join(ev, "click", "purchase").collect()}
    assert got[1] == 20.0 or got[1] == 10.0  # id1 at ts=5: purchase id2 also ts=5 → ≤ counts → 20
    # tie rule is exact: right rows sort before left at equal ts
    assert got[1] == 20.0
    assert got[3] == 20.0
    assert got[4] == 20.0
    assert got[5] is None


def test_range_join_equals_brute_force(spark):
    import random

    rng = random.Random(99)
    rows = []
    for i in range(300):
        rows.append((rng.randrange(5), rng.choice(["click", "purchase"]),
                     rng.randrange(0, 5000), rng.randrange(100)))
    ev = _events(spark, rows)
    for delta in (1, 60, 601, 977):
        fast = {
            (r["user_id"], r["a_id"], r["b_id"], r["gap_us"])
            for r in range_join(ev, "click", "purchase", delta).collect()
        }
        a = ev.filter(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("a_id"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("a_us"))
        b = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("event_id").alias("b_id"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("b_us"))
        brute = {
            (r["user_id"], r["a_id"], r["b_id"], r["b_us"] - r["a_us"])
            for r in a.join(b, "user_id")
            .filter((F.col("b_us") >= F.col("a_us"))
                    & (F.col("b_us") - F.col("a_us") <= delta * 1_000_000))
            .collect()
        }
        assert fast == brute, f"delta={delta}: {len(fast)} vs {len(brute)}"


def test_range_join_boundary_inclusive(spark):
    # gap exactly delta: included; delta + 1µs… next second: excluded
    ev = _events(spark, [
        (1, "click", 0, 0),
        (1, "purchase", 600, 1),   # exactly delta=600s
        (1, "purchase", 601, 2),   # beyond
    ])
    got = {(r["b_id"], r["gap_us"]) for r in range_join(ev, "click", "purchase", 600).collect()}
    assert got == {(1, 600_000_000)}


def test_funnel_strict_order_and_horizon(spark):
    from datetime import datetime

    from search_engine_spark.operators.events import funnel

    T = datetime
    rows = [
        # u1 completes view→click→purchase in order
        (1, T(2026, 1, 1, 10, 0), 1, "view"),
        (2, T(2026, 1, 1, 10, 5), 1, "click"),
        (3, T(2026, 1, 1, 10, 9), 1, "purchase"),
        # u2: click BEFORE view — must not count past step 1
        (4, T(2026, 1, 1, 9, 0), 2, "click"),
        (5, T(2026, 1, 1, 9, 30), 2, "view"),
        # u3: view and click at the SAME instant — strict '>' rejects
        (6, T(2026, 1, 1, 8, 0), 3, "view"),
        (7, T(2026, 1, 1, 8, 0), 3, "click"),
        # u4: completes but the click comes 2h after view
        (8, T(2026, 1, 1, 7, 0), 4, "view"),
        (9, T(2026, 1, 1, 9, 0), 4, "click"),
        (10, T(2026, 1, 1, 9, 1), 4, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        r["step"]: r["n_users"]
        for r in funnel(ev, ["view", "click", "purchase"]).collect()
    }
    assert out == {1: 4, 2: 2, 3: 2}
    # 30-minute horizon drops u4's 2h view→click leg
    bounded = {
        r["step"]: r["n_users"]
        for r in funnel(ev, ["view", "click", "purchase"], within_s=1800).collect()
    }
    assert bounded == {1: 4, 2: 1, 3: 1}


def test_cohort_retention_grid(spark):
    from datetime import datetime, timedelta

    from search_engine_spark.operators.events import cohort_retention

    wk = 604800
    base = datetime(2026, 1, 8)  # mid-epoch-week is fine: ids are ⌊epoch/wk⌋
    rows = []
    eid = 0
    # u1 active weeks 0,1,3 (relative to its first); u2 weeks 0,1; u3 week 0
    for uid, offsets in ((1, [0, 1, 3]), (2, [0, 1]), (3, [0])):
        for o in offsets:
            eid += 1
            rows.append((eid, base + timedelta(seconds=o * wk), uid, "view"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r["cohort"], r["offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    c = min(k[0] for k in got)
    assert got[(c, 0)] == 3
    assert got[(c, 1)] == 2
    assert got[(c, 3)] == 1
    assert (c, 2) not in got


def test_related_items_co_session_lift_and_topk(spark):
    from search_engine_spark.operators.events import related_items

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, uid, minutes, item):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, "view", 1.0,
                '{"k": %d}' % item)

    rows = [
        # user 1, one session: items 10, 11, 12 co-occur
        ev(0, 1, 0, 10), ev(1, 1, 5, 11), ev(2, 1, 9, 12),
        # user 1, second session (gap > 30 min): 10 and 11 again
        ev(3, 1, 60, 10), ev(4, 1, 65, 11),
        # user 2, one session: 10 and 11
        ev(5, 2, 0, 10), ev(6, 2, 3, 11),
        # duplicate incidence must count once per session
        ev(7, 2, 4, 11),
        # user 3, singleton sessions produce no pairs
        ev(8, 3, 0, 12), ev(9, 3, 90, 10),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = related_items(events, gap_minutes=30, min_pairs=2, k=5).collect()
    got = {(r["item"], r["related"]): (r["n_ab"], r["lift"]) for r in out}
    # sessions: {10,11,12}, {10,11}, {10,11}, {12}, {10} → N=5
    # n_10=4, n_11=3, n_12=2; pair (10,11) in 3 sessions; others < min_pairs
    assert set(got) == {(10, 11), (11, 10)}
    assert got[(10, 11)] == (3, round(3 * 5 / (4 * 3), 6))
    assert got[(10, 11)] == got[(11, 10)]


def test_related_items_respects_session_boundaries(spark):
    from search_engine_spark.operators.events import related_items

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, t0, 1, "view", 1.0, '{"k": 1}'),
        # same user, next item 45 min later → different session, no pair
        (1, t0 + dt.timedelta(minutes=45), 1, "view", 1.0, '{"k": 2}'),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    assert related_items(events, gap_minutes=30, min_pairs=1).count() == 0
