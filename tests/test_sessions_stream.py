"""Streaming session windows: cross-batch merge, exactly-once finalize,
batch-twin equality, and the pinned >=/> boundary divergence."""

from __future__ import annotations

import time
from datetime import datetime, timedelta

from pyspark.sql import functions as F

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"
T0 = datetime(2024, 1, 1, 10, 0, 0)


def _ev(i, user, offset_sec, etype="click"):
    return (i, T0 + timedelta(seconds=offset_sec), user, etype)


def test_stream_sessions_merge_across_microbatches(spark, tmp_path):
    from mariadb_to_graylog_spark.streaming.sessions_stream import (
        start_session_stream,
        windowed_sessions,
    )

    gap, wm = "60 seconds", "60 seconds"
    # user 1: batch-1 events at t+0/t+30; batch-2 event at t+70 is within
    # 60s of t+30 -> ALL THREE must merge into ONE session even though
    # they arrive in different micro-batches.  user 2: lone event.
    b1 = [_ev(0, 1, 0), _ev(1, 1, 30, "error"), _ev(2, 2, 5)]
    # the t+70 event extends user 1's session; the t+600 events close
    # every session once the watermark (600 - 60 = t+540) passes them
    b2 = [_ev(3, 1, 70), _ev(4, 1, 600), _ev(5, 2, 600)]

    src = str(tmp_path / "src")
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "out")
    q = start_session_stream(
        stream, out, str(tmp_path / "ck"), gap=gap, watermark=wm,
        trigger_ms=200,
    )

    def _wait_rows(n):
        deadline = time.time() + 120
        while time.time() < deadline:
            if q.exception() is not None:
                raise AssertionError(q.exception())
            try:
                if spark.read.parquet(out).count() >= n:
                    return
            except Exception:
                pass
            time.sleep(1)
        raise AssertionError(f"timed out waiting for {n} sessions")

    time.sleep(1.2)
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    _wait_rows(2)
    q.stop()

    got = {
        (r.user_id, r.session_start_epoch): r
        for r in spark.read.parquet(out).collect()
    }
    base = int(T0.timestamp())
    s1 = got[(1, base)]
    assert (s1.n_events, s1.n_errors, s1.duration_sec) == (3, 1, 70)
    assert got[(2, base + 5)].n_events == 1

    # batch twin over the SAME rows: finalized sessions must match
    # exactly (modulo the still-open t+600 sessions the stream hasn't
    # closed)
    batch = windowed_sessions(
        spark.createDataFrame(b1 + b2, SCHEMA), gap=gap, watermark=wm
    )
    twin = {
        (r.user_id, r.session_start_epoch): (
            r.n_events, r.n_errors, r.duration_sec,
        )
        for r in batch.collect()
    }
    for key, r in got.items():
        assert twin[key] == (r.n_events, r.n_errors, r.duration_sec), key


def test_batch_twin_matches_lag_sessionize_off_boundary(spark):
    """Away from the exact-gap boundary, session_window and the batch
    lag()+cumsum operator carve IDENTICAL sessions."""
    from mariadb_to_graylog_spark.operators.sessions import session_stats
    from mariadb_to_graylog_spark.streaming.sessions_stream import (
        windowed_sessions,
    )

    rows = []
    i = 0
    for u in (1, 2, 3):
        for off in (0, 10, 500, 2000, 2100, 9000):  # gaps != 600 exactly
            rows.append(_ev(i, u, off + u, "error" if i % 3 == 0 else "x"))
            i += 1
    df = spark.createDataFrame(rows, SCHEMA)
    sw = {
        (r.user_id, r.session_start_epoch): (r.n_events, r.n_errors, r.duration_sec)
        for r in windowed_sessions(df, gap="600 seconds").collect()
    }
    lag = {
        (r.user_id, r.start_epoch): (r.n_events, r.n_errors, r.duration_sec)
        for r in session_stats(
            df, gap_sec=600, type_col="event_type", error_type="error"
        ).collect()
    }
    assert sw == lag


def test_boundary_semantics_match_exactly_at_gap(spark):
    """Pinned agreement: an inter-event gap EXACTLY equal to the
    threshold stays in-session under BOTH operators (strict > rule);
    one second past it splits under both.  Probed empirically -- Spark's
    session_window merges next_start <= session_end."""
    from mariadb_to_graylog_spark.operators.sessions import session_stats
    from mariadb_to_graylog_spark.streaming.sessions_stream import (
        windowed_sessions,
    )

    at = spark.createDataFrame([_ev(0, 1, 0), _ev(1, 1, 600)], SCHEMA)
    past = spark.createDataFrame([_ev(0, 1, 0), _ev(1, 1, 601)], SCHEMA)
    assert windowed_sessions(at, gap="600 seconds").count() == 1
    assert session_stats(at, gap_sec=600).count() == 1
    assert windowed_sessions(past, gap="600 seconds").count() == 2
    assert session_stats(past, gap_sec=600).count() == 2
