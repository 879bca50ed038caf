"""Sessionization + event-transition goldens (operators/sessions.py)."""

from datetime import datetime, timezone

from mariadb_to_graylog_spark.operators.sessions import (
    event_transitions,
    session_stats,
    sessionize,
)


def _ev(spark, rows):
    # naive-UTC datetimes <-> timestamp_ntz: same convention as the
    # events table (session tz pinned UTC)
    return spark.createDataFrame(
        [
            (
                i,
                datetime.fromtimestamp(ts, tz=timezone.utc).replace(tzinfo=None),
                u,
                t,
            )
            for i, (u, ts, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string",
    )


BASE = 1_700_000_000  # fixed epoch so goldens are absolute


def test_gap_boundary_is_strict(spark):
    """gap == gap_sec stays in-session; gap_sec + 1 starts a new one."""
    df = _ev(
        spark,
        [
            (1, BASE, "click"),
            (1, BASE + 100, "click"),  # same session
            (1, BASE + 200, "click"),  # same
            (1, BASE + 200 + 3600, "click"),  # gap == threshold: same
            (1, BASE + 200 + 3600 + 3601, "click"),  # gap > threshold: new
        ],
    )
    got = {
        (r.event_id, r.session_idx)
        for r in sessionize(df, gap_sec=3600).collect()
    }
    assert got == {(0, 1), (1, 1), (2, 1), (3, 1), (4, 2)}


def test_session_stats_golden(spark):
    df = _ev(
        spark,
        [
            (1, BASE, "click"),
            (1, BASE + 50, "error"),
            (1, BASE + 10000, "view"),  # new session (gap 9950 > 3600)
            (2, BASE + 7, "error"),
        ],
    )
    rows = {
        (r.user_id, r.session_idx): r
        for r in session_stats(df, gap_sec=3600).collect()
    }
    assert set(rows) == {(1, 1), (1, 2), (2, 1)}
    s11 = rows[(1, 1)]
    assert (s11.n_events, s11.duration_sec, s11.n_errors, s11.start_epoch) == (
        2,
        50,
        1,
        BASE,
    )
    s12 = rows[(1, 2)]
    assert (s12.n_events, s12.duration_sec, s12.n_errors) == (1, 0, 0)
    assert rows[(2, 1)].n_errors == 1


def test_same_timestamp_ties_break_on_event_id(spark):
    """Two events at the identical second order deterministically by id
    (the lag stream, and therefore session numbering, cannot flap)."""
    df = _ev(spark, [(1, BASE, "a"), (1, BASE, "b"), (1, BASE + 9999, "c")])
    got = sorted(
        (r.event_id, r.session_idx)
        for r in sessionize(df, gap_sec=3600).collect()
    )
    assert got == [(0, 1), (1, 1), (2, 2)]


def test_transitions_conserve_and_share(spark):
    df = _ev(
        spark,
        [
            (1, BASE, "a"),
            (1, BASE + 1, "b"),
            (1, BASE + 2, "b"),
            (2, BASE, "a"),
            (2, BASE + 1, "b"),
        ],
    )
    rows = {(r.prev_type, r.event_type): r for r in event_transitions(df).collect()}
    # starts: one per user
    assert rows[("_start", "a")].n == 2
    # every event is counted exactly once as a destination
    assert sum(r.n for r in rows.values()) == 5
    # a -> b both times: share within prev='a' is 100%
    assert rows[("a", "b")].n == 2
    assert rows[("a", "b")].share_ppm == 1_000_000
    # b -> b once of one b-transition
    assert rows[("b", "b")].share_ppm == 1_000_000
    # ppm within each prev sums to <= 1e6 (floor) and > 1e6 - n_types
    by_prev: dict = {}
    for (p, _), r in rows.items():
        by_prev.setdefault(p, []).append(r.share_ppm)
    for p, shares in by_prev.items():
        assert sum(shares) <= 1_000_000
        assert sum(shares) > 1_000_000 - len(shares)


def test_single_exchange_plan(spark):
    """sessionize + session aggregate must plan exactly ONE hash exchange
    (the groupBy key is prefixed by the window partition key)."""
    df = _ev(spark, [(u, BASE + i, "click") for u in (1, 2) for i in range(5)])
    plan = session_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_hourly_gapfill_zero_rows_and_trailing_sum(spark):
    """Events at hours 0, 0, 2 for one user: hour 1 must EXIST with
    n_events=0; trailing 3-bucket sums recompute by hand; a second
    user's grid is independent."""
    from datetime import datetime, timezone

    from mariadb_to_graylog_spark.operators.sessions import (
        hourly_gapfilled_counts,
    )

    def ts(h, m=0):
        return datetime(2024, 1, 1, h, m, tzinfo=timezone.utc)

    df = spark.createDataFrame(
        [
            (1, ts(0)), (1, ts(0, 30)), (1, ts(2)),
            (2, ts(5)),
        ],
        "user_id long, ts timestamp",
    )
    got = {
        (r.user_id, r.hour_bucket): (r.n_events, r.trailing_sum)
        for r in hourly_gapfilled_counts(df).collect()
    }
    base = 473352  # 2024-01-01T00 epoch-hours
    assert got[(1, base + 0)] == (2, 2)
    assert got[(1, base + 1)] == (0, 2)  # the gap row exists, zero-filled
    assert got[(1, base + 2)] == (1, 3)  # trailing 3h = 2 + 0 + 1
    assert got[(2, base + 5)] == (1, 1)
    assert len([k for k in got if k[0] == 1]) == 3  # exactly hours 0..2
