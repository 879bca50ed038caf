"""Cross-batch streaming entry assembly (applyInPandasWithState): the
Python line-parse twin must equal the Spark parse field-for-field, and one
conversation split across THREE micro-batches must assemble byte-identical
entries to batch mode (the round-1 boundary documented in
stream_pipeline.py:9-15, now closed)."""

from __future__ import annotations

import time
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from mariadb_to_graylog_spark.operators.assembly import assemble_error_entries
from mariadb_to_graylog_spark.operators.errorlog import parse_error_log_lines
from mariadb_to_graylog_spark.streaming.stateful import (
    _parse_error_line,
    assemble_entries_stateful,
)

LINES = [
    "2019-11-01 16:10:48 0 [Note] InnoDB: Using Linux native AIO",
    "continuation one",
    "continuation two",
    "201030 12:40:21 [ERROR] WSREP: read nil XID",
    "second entry continuation",
    "2019-11-01 :: 7 [ERROR] empty-time-components entry",
    "malformed line between entries",
    "2019-11-01 16:10:55 5 [Warning] last entry",
    "trailing continuation",
]

EDGE_LINES = LINES + [
    "",
    "   leading spaces only",
    "2019-13-40 10:00:00 1 [Note] invalid calendar date",
    "991231 23:59:59 [Note] pivot 99 -> 1999",
    "690101 00:00:00 [Note] pivot 69 -> 1969",
    "680101 00:00:00 [Note] pivot 68 -> 2068",
    "2019-1-2 3:4:5 9 [Note] single digit everything",
    "2019-11-01 16:10:48",  # bare timestamp, no level/message
]


def _conv_df(spark, lines, conv_id="conv-x", turn_offset=0):
    rows = [
        (conv_id, turn_offset + i, "user", ln, None,
         datetime(2024, 1, 1, 0, 0, (turn_offset + i) % 60, tzinfo=timezone.utc))
        for i, ln in enumerate(lines)
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_python_parse_twin_equals_spark_parse(spark):
    df = _conv_df(spark, EDGE_LINES)
    got = {
        r.turn_idx: r
        for r in parse_error_log_lines(df).select(
            "turn_idx", "is_entry_start", "ts_epoch", "thread_raw",
            "level_raw", "severity", "short_message", "message",
        ).collect()
    }
    for i, ln in enumerate(EDGE_LINES):
        p = _parse_error_line(ln)
        r = got[i]
        assert p["is_entry_start"] == r.is_entry_start, (i, ln)
        assert p["ts_epoch"] == r.ts_epoch, (i, ln)
        assert p["thread_raw"] == r.thread_raw, (i, ln)
        assert p["level_raw"] == r.level_raw, (i, ln)
        assert p["severity"] == r.severity, (i, ln)
        assert p["short_message"] == r.short_message, (i, ln)
        assert p["message"] == r.message, (i, ln)


def test_stateful_pipeline_stream_matches_batch_routing(spark, tmp_path):
    """The CLI-reachable stateful streaming pipeline (assemble -> enrich ->
    route -> file sink): routed GELF set equals the batch error branch over
    the same conversation split across three micro-batches."""
    from mariadb_to_graylog_spark.datagen import TRANSCRIPT_SCHEMA
    from mariadb_to_graylog_spark.operators.routing import route
    from mariadb_to_graylog_spark.plans.pipeline import (
        PipelineConfig,
        enrich,
        error_entries_to_events,
    )
    from mariadb_to_graylog_spark.streaming.stream_pipeline import (
        start_stateful_pipeline_stream,
    )

    src = str(tmp_path / "src_routed")
    chunks = [LINES[0:3], LINES[3:6], LINES[6:9]]
    off = 0
    for i, chunk in enumerate(chunks):
        _conv_df(spark, chunk, turn_offset=off).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
        off += len(chunk)
        time.sleep(1.1)

    cfg = PipelineConfig(mode="intended")
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    sink_base = str(tmp_path / "routed_sinks")
    q = start_stateful_pipeline_stream(
        stream, sink_base, str(tmp_path / "ckpt_routed"),
        log_type="ERROR", cfg=cfg, flush_after_ms=200,
    )
    expected = {
        (r.sink, r.gelf_json)
        for r in route(
            enrich(
                error_entries_to_events(
                    assemble_error_entries(
                        parse_error_log_lines(_conv_df(spark, LINES)),
                        mode="intended",
                    )
                ),
                cfg,
            ),
            cfg=cfg.router,
        ).collect()
        if r.sink != "dropped"
    }
    deadline = time.time() + 120
    got: set = set()
    while time.time() < deadline:
        if q.exception() is not None:
            raise AssertionError(q.exception())
        try:
            got = {
                (r.sink, r.gelf_json)
                for r in spark.read.parquet(sink_base).collect()
            }
        except Exception:
            got = set()
        if len(got) >= len(expected):
            break
        time.sleep(1)
    q.stop()
    assert got == expected and len(expected) == 4


@pytest.mark.parametrize("emit_trailing", [False, True])
def test_cross_batch_slowlog_equals_batch(spark, tmp_path, emit_trailing):
    """Slow-log FSM with cross-batch registers: the corpus split across
    THREE micro-batches (boundaries INSIDE entries: mid-meta, mid-SQL)
    must equal batch parse_slow_log column-for-column, including metrics,
    timestamps and fingerprints."""
    from test_slowlog import CORPUS

    from mariadb_to_graylog_spark.datagen import TRANSCRIPT_SCHEMA
    from mariadb_to_graylog_spark.operators.slowlog import parse_slow_log
    from mariadb_to_graylog_spark.streaming.stateful import (
        assemble_slow_entries_stateful,
    )

    src = str(tmp_path / f"slow_{emit_trailing}")
    chunks = [CORPUS[0:9], CORPUS[9:17], CORPUS[17:]]  # mid-entry splits
    off = 0
    for i, chunk in enumerate(chunks):
        _conv_df(spark, chunk, turn_offset=off).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
        off += len(chunk)
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    entries = assemble_slow_entries_stateful(
        stream, emit_trailing=emit_trailing, flush_after_ms=200
    )
    name = f"slow_stateful_{emit_trailing}"
    q = (
        entries.writeStream.format("memory")
        .queryName(name).outputMode("append").start()
    )
    expected = [
        r.asDict()
        for r in parse_slow_log(_conv_df(spark, CORPUS), emit_trailing=emit_trailing)
        .orderBy("entry_id")
        .collect()
    ]
    deadline = time.time() + 120
    while time.time() < deadline:
        if q.exception() is not None:
            raise AssertionError(q.exception())
        if spark.sql(f"select count(*) from {name}").first()[0] >= len(expected):
            break
        time.sleep(1)
    q.stop()
    got = [
        r.asDict()
        for r in spark.sql(f"select * from {name}").orderBy("entry_id").collect()
    ]
    assert len(got) == len(expected) == (4 if emit_trailing else 3)
    for g, e in zip(got, expected):
        for col in e:
            assert g[col] == e[col], (col, g[col], e[col])


@pytest.mark.parametrize("mode", ["intended", "strict"])
def test_cross_batch_assembly_equals_batch(spark, tmp_path, mode):
    from mariadb_to_graylog_spark.datagen import TRANSCRIPT_SCHEMA

    src = str(tmp_path / f"src_{mode}")
    # one conversation split across THREE files = three micro-batches
    chunks = [LINES[0:3], LINES[3:6], LINES[6:9]]
    off = 0
    for i, chunk in enumerate(chunks):
        # one FILE per chunk (a chunk split across part-files would become
        # several out-of-order micro-batches under maxFilesPerTrigger=1)
        _conv_df(spark, chunk, turn_offset=off).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
        off += len(chunk)
        time.sleep(1.1)  # distinct mod times -> deterministic file order

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    entries = assemble_entries_stateful(stream, mode=mode, flush_after_ms=200)
    q = (
        entries.writeStream.format("memory")
        .queryName(f"stateful_{mode}")
        .outputMode("append")
        .start()
    )
    # NOTE: processAllAvailable() never returns under ProcessingTimeTimeout
    # (expired-state cleanup keeps scheduling batches), so poll the sink:
    # 3 complete entries arrive with the data batches, the 4th (trailing)
    # via the timeout flush.
    deadline = time.time() + 120
    while time.time() < deadline:
        if q.exception() is not None:
            raise AssertionError(q.exception())
        n = spark.sql(f"select count(*) from stateful_{mode}").first()[0]
        if n >= 4:
            break
        time.sleep(1)
    q.stop()

    got = [
        r.asDict()
        for r in spark.sql(f"select * from stateful_{mode}")
        .filter(F.col("conv_id") == "conv-x")
        .orderBy("entry_id")
        .collect()
    ]
    full = _conv_df(spark, LINES)
    expected = [
        r.asDict()
        for r in assemble_error_entries(parse_error_log_lines(full), mode=mode)
        .orderBy("entry_id")
        .collect()
    ]
    assert len(got) == len(expected) == 4
    for g, e in zip(got, expected):
        assert g == e, (g, e)


def test_entry_ids_continue_after_timeout_flush(spark, tmp_path):
    """A conversation that resumes AFTER its trailing entry was
    timeout-flushed continues the entry_id sequence (counter-only state row
    survives the flush); state.remove() would restart ids at 1 and mint
    duplicate (conv_id, entry_id) keys."""
    from mariadb_to_graylog_spark.datagen import TRANSCRIPT_SCHEMA

    src = str(tmp_path / "src_resume")
    _conv_df(spark, LINES[0:6]).coalesce(1).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    entries = assemble_entries_stateful(stream, mode="intended", flush_after_ms=200)
    q = (
        entries.writeStream.format("memory")
        .queryName("stateful_resume")
        .outputMode("append")
        .start()
    )

    def _wait_for(n):
        deadline = time.time() + 120
        while time.time() < deadline:
            if q.exception() is not None:
                raise AssertionError(q.exception())
            if spark.sql("select count(*) from stateful_resume").first()[0] >= n:
                return
            time.sleep(1)
        raise AssertionError(f"timed out waiting for {n} entries")

    # entries 1-2 arrive with the batch; entry 3 (trailing open) only via
    # the timeout flush
    _wait_for(3)
    time.sleep(2)  # let further timeout cycles run against counter-only state
    _conv_df(spark, LINES[7:9], turn_offset=7).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _wait_for(4)
    q.stop()

    got = (
        spark.sql("select entry_id, message from stateful_resume")
        .orderBy("entry_id")
        .collect()
    )
    assert [r.entry_id for r in got] == [1, 2, 3, 4]  # no duplicate keys
    assert got[3].message == "last entry\ntrailing continuation"
