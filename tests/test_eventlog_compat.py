"""Eventlog file-format compatibility tests (C1/C2)."""

from __future__ import annotations

import pytest

from mariadb_to_graylog_spark.sources.eventlog_compat import (
    EventlogCompat,
    last_coordinate,
)


def test_append_and_resume(tmp_path):
    p = str(tmp_path / "eventlog")
    log = EventlogCompat(p)
    log.log_coordinates(10, "conv-000001")
    log.log_coordinates(25, "conv-000001")
    log.log_coordinates(7, "conv-000002")
    log.close()
    assert last_coordinate(p) == (7, "conv-000002")
    # append mode: reopening keeps history (eventlog.py:105-107)
    log2 = EventlogCompat(p)
    log2.log_coordinates(30, "conv-000002")
    log2.close()
    assert last_coordinate(p) == (30, "conv-000002")
    assert len(open(p).read().splitlines()) == 4


def test_truncate_and_separator_validation(tmp_path):
    p = str(tmp_path / "eventlog")
    log = EventlogCompat(p)
    log.log_coordinates(1, "a")
    log.close()
    log = EventlogCompat(p, truncate=True)
    with pytest.raises(ValueError):
        log.log_coordinates(2, "bad:source")
    log.close()
    assert last_coordinate(p) is None


def test_rotate(tmp_path):
    p = str(tmp_path / "eventlog")
    log = EventlogCompat(p)
    log.log_coordinates(5, "c")
    log.rotate()
    log.log_coordinates(6, "c")
    log.close()
    # post-rotate file contains only post-rotate lines; tmp removed
    assert last_coordinate(p) == (6, "c")
    assert len(open(p).read().splitlines()) == 1
    assert not (tmp_path / "eventlog.tmp").exists()


def test_rotate_concurrent_with_writes(tmp_path):
    """SIGHUP-rotate races a foreachBatch writer in the streaming job; the
    lock must keep every line intact (no torn writes, no lost handle)."""
    import threading

    p = str(tmp_path / "eventlog")
    log = EventlogCompat(p)
    stop = threading.Event()

    def writer():
        i = 0
        while not stop.is_set():
            log.log_coordinates(i, "conv")
            i += 1

    t = threading.Thread(target=writer, daemon=True)
    t.start()
    for _ in range(20):
        log.rotate()
    stop.set()
    t.join(2)
    log.close()
    lines = [l for l in open(p).read().splitlines() if l]
    assert all(l.split(":")[0].isdigit() and l.endswith(":conv") for l in lines)


def test_streaming_eventlog_coordinates(spark, transcripts, tmp_path):
    """start_pipeline_stream(eventlog=...) logs one coordinate line per
    conversation per micro-batch, in the reference's format, and SIGHUP's
    rotate() between batches starts the file fresh."""
    from mariadb_to_graylog_spark.streaming.stream_pipeline import (
        read_transcript_stream,
        start_pipeline_stream,
    )

    src = str(tmp_path / "src")
    transcripts.write.parquet(src)
    evt = str(tmp_path / "stream.eventlog")
    log = EventlogCompat(evt)
    stream = read_transcript_stream(spark, src, max_files_per_trigger=100)
    q = start_pipeline_stream(
        stream, str(tmp_path / "sinks"), str(tmp_path / "ckpt"), eventlog=log
    )
    q.processAllAvailable()
    q.stop()
    n_convs = transcripts.select("conv_id").distinct().count()
    lines = [l for l in open(evt).read().splitlines() if l]
    assert len(lines) == n_convs
    assert all(l.split(":")[0].isdigit() for l in lines)
    log.rotate()
    assert last_coordinate(evt) is None
    log.close()
