"""Planted-scenario semantics for the event-analytics operators: funnel
stage ordering, cohort offsets, OHLC tie-breaking — plus closed-form
triangle counting. The oracle-parity suite checks these against DuckDB
on real testdata; these tests pin the SEMANTICS on hand-built inputs
where the right answer is computed by eye."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dateng_data_lakes_apache_spark_spark.operators.graph import triangle_count


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def _funnel_over(spark, rows):
    """Run q_funnel's stage chain over hand-built (user, type, ts) rows."""
    from dateng_data_lakes_apache_spark_spark.operators import events_analytics as ea

    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    stage_users = []
    prior = None
    for stage in ea._FUNNEL_STAGES:
        cur = ev.where(F.col("event_type") == stage)
        if prior is not None:
            cur = cur.join(prior, "user_id").where(F.col("ts") > F.col("t_prev"))
        reached = cur.groupBy("user_id").agg(F.min("ts").alias("t_prev"))
        stage_users.append(reached)
        prior = reached
    return [sorted(r.user_id for r in s.collect()) for s in stage_users]


def test_funnel_requires_stage_order(spark):
    rows = [
        # user 1: proper view → click → purchase
        (1, "view", _ts(0)), (1, "click", _ts(5)), (1, "purchase", _ts(9)),
        # user 2: purchase BEFORE the first view — must not count as converted
        (2, "purchase", _ts(0)), (2, "view", _ts(3)), (2, "click", _ts(6)),
        # user 3: click before view only — stalls at view
        (3, "click", _ts(1)), (3, "view", _ts(2)),
    ]
    views, clicks, purchases = _funnel_over(spark, rows)
    assert views == [1, 2, 3]
    assert clicks == [1, 2]  # user 3's click precedes their view
    assert purchases == [1]  # user 2's purchase precedes everything


def test_funnel_first_touch_click_gates_purchase(spark):
    # The purchase lands between the user's two clicks; the qualifying
    # click is the EARLIEST after the view, so the purchase counts.
    rows = [
        (7, "view", _ts(0)), (7, "click", _ts(2)),
        (7, "purchase", _ts(4)), (7, "click", _ts(8)),
    ]
    views, clicks, purchases = _funnel_over(spark, rows)
    assert (views, clicks, purchases) == ([7], [7], [7])


def _tri_edges(spark, pairs):
    canon = sorted({(min(a, b), max(a, b)) for a, b in pairs})
    return spark.createDataFrame(canon, "a long, b long")


def test_triangle_count_closed_forms(spark):
    # triangle
    assert triangle_count(_tri_edges(spark, [(1, 2), (2, 3), (1, 3)])).collect()[0][0] == 1
    # path: no triangle
    assert triangle_count(_tri_edges(spark, [(1, 2), (2, 3), (3, 4)])).collect()[0][0] == 0
    # K4: 4 triangles
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    assert triangle_count(_tri_edges(spark, k4)).collect()[0][0] == 4
    # two triangles sharing an edge
    bowtie = [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4)]
    assert triangle_count(_tri_edges(spark, bowtie)).collect()[0][0] == 2


def test_ohlc_open_close_follow_event_time(spark):
    from dateng_data_lakes_apache_spark_spark.operators import events_analytics as ea

    # values deliberately NOT monotone in ts: open must follow ts order,
    # not value order; event_id breaks an exact-ts tie deterministically
    rows = [
        (10, _ts(1), 5.0), (11, _ts(2), 1.0), (12, _ts(3), 9.0),
        (13, _ts(4), 2.0),
        (14, _ts(4), 7.0),  # same ts as 13: higher event_id loses the tie
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    key = F.format_string(ea._OHLC_KEY, F.unix_micros("ts"), F.col("event_id"))
    row = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
    ).collect()[0]
    assert (row.open, row.high, row.low, row.close) == (5.0, 9.0, 1.0, 7.0)


def test_mp4_probe_roundtrip():
    from dateng_data_lakes_apache_spark_spark.functions.multimodal import (
        mp4_bytes,
        probe_mp4,
    )

    payload = mp4_bytes(90000, 90000 * 7 + 41, 640, 368)
    assert probe_mp4(payload) == (90000, 90000 * 7 + 41, 640, 368)
    # box-walking, not fixed offsets: a free box before moov must not break it
    import struct

    free = struct.pack(">I", 16) + b"free" + b"\x00" * 8
    ftyp_len = struct.unpack(">I", payload[:4])[0]
    shifted = payload[:ftyp_len] + free + payload[ftyp_len:]
    assert probe_mp4(shifted) == (90000, 90000 * 7 + 41, 640, 368)


def test_attribution_conserves_revenue(spark, sf_dir):
    """First-touch and last-touch models must both attribute EVERY
    purchase exactly once (channel -1 catches unattributable ones), so
    per-model totals equal total purchase revenue."""
    from dateng_data_lakes_apache_spark_spark.catalog import table
    from dateng_data_lakes_apache_spark_spark.operators.events_analytics import (
        q_attribution,
    )
    from pyspark.sql import functions as F

    rows = q_attribution(spark, sf_dir).collect()
    total = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .agg(F.sum(F.col("value").cast("decimal(30,8)")).cast("double"))
        .collect()[0][0]
    )
    n_purch = (
        table(spark, sf_dir, "events").where(F.col("event_type") == "purchase").count()
    )
    assert sum(r.n_first for r in rows) == n_purch
    assert sum(r.n_last for r in rows) == n_purch
    assert abs(sum(r.rev_first for r in rows) - total) < 1e-6
    assert abs(sum(r.rev_last for r in rows) - total) < 1e-6


def test_clamped_balance_reflection_identity_vs_brute_loop():
    """b = S - min(0, running_min(S)) equals the sequential
    max(0, b+d) recurrence on adversarial delta sequences."""
    import numpy as np

    rng = np.random.RandomState(7)
    for _ in range(50):
        d = rng.randint(-100, 80, size=rng.randint(1, 200)).astype("int64")
        s = np.cumsum(d)
        b_vec = s - np.minimum(np.minimum.accumulate(s), 0)
        bal, brute = 0, []
        for x in d:
            bal = max(0, bal + int(x))
            brute.append(bal)
        assert b_vec.tolist() == brute


def test_ewma_fixed_point_recurrence_hand_computed():
    """(9*ew + x) div 10 recurrence matches hand arithmetic."""
    xs = [1000, 2000, 0, 500]
    ew = xs[0]
    expect = [1000]
    for x in xs[1:]:
        ew = (9 * ew + x) // 10
        expect.append(ew)
    assert expect == [1000, 1100, 990, 941]


def test_ewma_constant_series_is_fixed_point():
    """A constant input is a fixed point of the integer recurrence."""
    ew = 4200
    for _ in range(50):
        ew = (9 * ew + 4200) // 10
    assert ew == 4200
