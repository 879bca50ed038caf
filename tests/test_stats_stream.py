"""Streaming token-percentile drift monitor: windowed mergeable sketches
over micro-batches must finalize each event-time window exactly once and
agree with the batch twin over the same data."""

from __future__ import annotations

import time
from datetime import datetime

from pyspark.sql import functions as F

SCHEMA = "doc_id long, text string, ts timestamp"


def _doc(i, n_tokens, minute, second=0):
    return (i, " ".join(f"w{j}" for j in range(n_tokens)),
            datetime(2024, 1, 1, 10, minute, second))


def test_windowed_percentiles_stream_matches_batch_twin(spark, tmp_path):
    from mariadb_to_graylog_spark.streaming.stats_stream import (
        start_token_percentile_stream,
        windowed_token_percentiles,
    )

    # window A (10:00): token counts 2,4,6,8,10; window B (10:01): 3,9,27
    b1 = [
        _doc(1, 2, 0, 5), _doc(2, 4, 0, 15), _doc(3, 6, 0, 25),
        _doc(4, 8, 0, 35), _doc(5, 10, 0, 45),
        _doc(6, 3, 1, 10), _doc(7, 9, 1, 20),
    ]
    # second batch adds to window B, then a late-minute doc advances the
    # watermark (10:05 - 2min = 10:03) past both windows' ends -> both
    # finalize and emit
    b2 = [_doc(8, 27, 1, 40), _doc(9, 5, 5, 0)]

    src = str(tmp_path / "src")
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    out = str(tmp_path / "out")
    q = start_token_percentile_stream(
        stream, out, str(tmp_path / "ck"), trigger_ms=200
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
        raise AssertionError(f"timed out waiting for {n} finalized windows")

    time.sleep(1.2)
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    _wait_rows(2)
    q.stop()

    got = {
        r.window_start.minute: r
        for r in spark.read.parquet(out).collect()
    }
    # only CLOSED windows are emitted (10:05's window is still open)
    assert set(got) == {0, 1}
    assert got[0].n_docs == 5 and got[1].n_docs == 3

    # batch twin over the union, restricted to the finalized windows,
    # must agree exactly (sketch is exact at these sizes; counts/means
    # are exact integer sums by construction)
    full = spark.createDataFrame(b1 + b2, SCHEMA)
    twin = {
        r.window_start.minute: r
        for r in windowed_token_percentiles(full).collect()
        if r.window_start.minute in (0, 1)
    }
    for m in (0, 1):
        for f in ("n_docs", "mean_tokens", "p50", "p90", "p99"):
            assert getattr(got[m], f) == getattr(twin[m], f), (m, f)
    assert got[0].p50 == 6.0 and got[1].p50 == 9.0
