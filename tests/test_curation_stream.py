"""Streaming corpus curation: the same gates as the batch pipeline over
micro-batches, with CROSS-BATCH exact dedup (a duplicate arriving in a
later file must be dropped) and per-decision routing partitions."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from mariadb_to_graylog_spark.operators.decontam import (
    contamination,
    eval_gram_set,
)
from mariadb_to_graylog_spark.streaming.curation_stream import (
    curate,
    start_curation_stream,
)

DOC_SCHEMA = "doc_id long, text string"

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the fox runs to "
    "the river of the valley to drink in the morning light of a new day "
    "while the birds sing in the trees of the old forest"
)
EVAL_ITEM = (
    "what is the capital of the ancient kingdom that bordered the "
    "western sea before the long winter"
)


def _docs():
    batch1 = [
        (1, GOOD + " first"),
        (2, "short junk!!!"),  # low quality
        (3, GOOD + " " + EVAL_ITEM + " tail"),  # contaminated
    ]
    batch2 = [
        (4, GOOD + " first"),  # cross-batch duplicate of doc 1 -> dropped
        (5, GOOD + " fresh second"),
    ]
    return batch1, batch2


def test_streaming_curation_matches_batch_and_dedups_across_batches(
    spark, tmp_path
):
    b1, b2 = _docs()
    src = str(tmp_path / "src")
    spark.createDataFrame(b1, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    ev = spark.createDataFrame([(EVAL_ITEM,)], "text string")
    eval_hashes = eval_gram_set(ev, n=13)
    assert eval_hashes  # the eval corpus produced grams

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    out = str(tmp_path / "out")
    q = start_curation_stream(
        stream, out, str(tmp_path / "ck"), eval_hashes, trigger_ms=200
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
        raise AssertionError(f"timed out waiting for {n} output rows")

    _wait_rows(3)
    time.sleep(1.2)  # distinct file mod time -> deterministic order
    spark.createDataFrame(b2, DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _wait_rows(4)
    q.stop()

    got = {
        r.doc_id: (r.decision, r.contaminated)
        for r in spark.read.parquet(out).collect()
    }
    # doc 4 (cross-batch duplicate of doc 1's text) must NOT appear
    assert set(got) == {1, 2, 3, 5}
    assert got[1][0] == "kept" and got[5][0] == "kept"
    assert got[2][0] == "low_quality"
    assert got[3] == ("contaminated", True)

    # batch twin: same transform over the full union gives the same rows
    full = spark.createDataFrame(b1 + b2, DOC_SCHEMA)
    batch = {
        r.doc_id: (r.decision, r.contaminated)
        for r in curate(full, eval_hashes).collect()
    }
    # batch dedup keeps ONE of {1,4} (either id is a valid survivor);
    # normalize both sides to text-identity before comparing
    assert {k for k in batch} - {4} == {k for k in got} - {4} or set(
        batch
    ) == set(got)
    for k in set(got) & set(batch):
        assert got[k] == batch[k]

    # the stateless streaming flag equals the aggregation-based batch
    # contamination operator row-for-row
    agg = {
        r.doc_id: r.contaminated for r in contamination(full, ev, n=13).collect()
    }
    for k, (_, c) in got.items():
        assert agg[k] == c


def test_watermarked_curation_bounds_state_and_readmits_out_of_window(
    spark, tmp_path
):
    """curate_watermarked: an IN-window duplicate is dropped; a duplicate
    arriving after the original's state aged out of the watermark window
    is RE-ADMITTED -- the documented trade for bounded state."""
    from datetime import datetime

    from mariadb_to_graylog_spark.streaming.curation_stream import (
        curate_watermarked,
    )

    schema = "doc_id long, text string, ts timestamp"

    def _ts(minute):
        return datetime(2024, 1, 1, 10, minute)

    src = str(tmp_path / "src")
    b1 = [(1, GOOD + " original", _ts(0))]
    # dup inside the 10-minute window -> dropped; doc 3 pushes the
    # watermark to 10:20
    b2 = [(2, GOOD + " original", _ts(5)), (3, GOOD + " fresh", _ts(30))]
    # doc 1's state expired at 10:10 < watermark 10:20 -> dup re-admitted
    b3 = [(4, GOOD + " original", _ts(21))]

    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    out = str(tmp_path / "out")
    q = (
        curate_watermarked(stream, set(), delay="10 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .outputMode("append")
        .start()
    )

    import time as _t

    def _wait_rows(n):
        deadline = _t.time() + 120
        while _t.time() < deadline:
            if q.exception() is not None:
                raise AssertionError(q.exception())
            try:
                if spark.read.parquet(out).count() >= n:
                    return
            except Exception:
                pass
            _t.sleep(1)
        raise AssertionError(f"timed out waiting for {n} output rows")

    _wait_rows(1)
    _t.sleep(1.2)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
    _wait_rows(2)
    _t.sleep(1.2)
    spark.createDataFrame(b3, schema).coalesce(1).write.mode("append").parquet(src)
    _wait_rows(3)
    q.stop()

    ids = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    # 2 dropped (in-window dup), 4 re-admitted (out-of-window dup)
    assert ids == [1, 3, 4]
