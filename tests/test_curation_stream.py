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


def test_curate_trim_mode_salvages_contaminated_docs(spark):
    """Salvage mode (trim_hashes): a contaminated-but-mostly-clean doc
    routes to 'trimmed' with the eval span excised; a pure-eval husk
    stays 'contaminated'; clean docs keep their RAW text and decisions;
    n_tokens_removed matches the batch trim operator row-for-row."""
    from mariadb_to_graylog_spark.operators.decontam import (
        trim_contaminated_runs,
    )

    docs = spark.createDataFrame(
        [
            (1, GOOD + " first"),
            (2, "short junk!!!"),
            (3, GOOD + " " + EVAL_ITEM + " tail"),
            (4, EVAL_ITEM),  # pure eval -> husk
        ],
        DOC_SCHEMA,
    )
    ev = spark.createDataFrame([(EVAL_ITEM,)], "text string")
    trim_hashes = eval_gram_set(ev, n=13, full_md5=True)
    got = {r.doc_id: r for r in curate(docs, set(), trim_hashes=trim_hashes).collect()}

    assert got[1].decision == "kept"
    assert got[1].text == GOOD + " first"  # raw text untouched
    assert got[1].n_tokens_removed == 0 and not got[1].contaminated
    assert got[2].decision == "low_quality"
    assert got[3].decision == "trimmed" and got[3].contaminated
    assert EVAL_ITEM not in got[3].text
    assert got[3].text.startswith(GOOD.split()[0])  # normalized survivors
    assert got[4].decision == "contaminated"
    assert got[4].n_tokens_removed > 0

    batch = {
        r.doc_id: (r.trimmed_text, r.n_tokens_removed)
        for r in trim_contaminated_runs(docs, ev.select(
            F.lit(0).alias("doc_id"), "text"), n=13).collect()
    }
    for k, row in got.items():
        assert row.n_tokens_removed == batch[k][1]
        if row.decision == "trimmed":
            assert row.text == batch[k][0]


def test_streaming_curation_trim_mode_partitions(spark, tmp_path):
    """The trim lane works under a real stream: the 'trimmed' partition
    appears, rows match the batch twin, and clean docs are untouched."""
    import time as _t

    ev = spark.createDataFrame([(EVAL_ITEM,)], "text string")
    trim_hashes = eval_gram_set(ev, n=13, full_md5=True)
    docs = [
        (1, GOOD + " first"),
        (3, GOOD + " " + EVAL_ITEM + " tail"),
        (4, EVAL_ITEM),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(docs, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "out")
    q = start_curation_stream(
        stream,
        out,
        str(tmp_path / "ck"),
        set(),
        trigger_ms=200,
        trim_hashes=trim_hashes,
    )
    deadline = _t.time() + 120
    while _t.time() < deadline:
        if q.exception() is not None:
            raise AssertionError(q.exception())
        try:
            if spark.read.parquet(out).count() >= 3:
                break
        except Exception:
            pass
        _t.sleep(1)
    q.stop()
    got = {
        r.doc_id: (r.decision, r.n_tokens_removed)
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        r.doc_id: (r.decision, r.n_tokens_removed)
        for r in curate(
            spark.createDataFrame(docs, DOC_SCHEMA), set(), trim_hashes=trim_hashes
        ).collect()
    }
    assert got == batch
    assert got[3][0] == "trimmed" and got[4][0] == "contaminated"
