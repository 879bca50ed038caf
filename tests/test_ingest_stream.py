"""Streaming ingestion near-dup gate: micro-batches of new docs probe the
static corpus's materialized MinHash index; per-decision partitions; each
batch's decisions must equal the batch-twin `incremental_neardup` run."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from mariadb_to_graylog_spark.operators.dedup import incremental_neardup
from mariadb_to_graylog_spark.streaming.ingest_stream import (
    start_ingest_gate_stream,
)

DOC_SCHEMA = "doc_id long, text string"

PAGE_A = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "researchers carefully measure benchmark leakage across training "
    "corpora every single evening"
)
PAGE_B = (
    "an entirely different corpus page about sailing across the western "
    "sea with a crew of twelve and a cargo of salted fish"
)


def test_streaming_ingest_gate_matches_batch_twin(spark, tmp_path):
    corpus = spark.createDataFrame([(1, PAGE_A), (2, PAGE_B)], DOC_SCHEMA)
    b1 = [
        (101, PAGE_A.replace("researchers", "scientists")),  # edited re-crawl
        (102, "completely unrelated text about gardening tools"),
    ]
    b2 = [
        (103, PAGE_B + " q"),  # edited re-crawl of the OTHER corpus page
        (104, "another genuinely fresh page about astronomy at night"),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(b1, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    out = str(tmp_path / "out")
    q = start_ingest_gate_stream(
        stream, corpus, out, str(tmp_path / "ck"), trigger_ms=200
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

    _wait_rows(2)
    time.sleep(1.2)
    spark.createDataFrame(b2, DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _wait_rows(4)
    q.stop()

    got = {
        r.doc_id: (r.decision, r.match_id) for r in spark.read.parquet(out).collect()
    }
    assert got[101] == ("near_duplicate", 1)
    assert got[103] == ("near_duplicate", 2)
    assert got[102][0] == "kept" and got[104][0] == "kept"
    # every batch's rows equal the batch twin run on that batch alone
    for batch in ([(i, t) for i, t in b1], [(i, t) for i, t in b2]):
        twin = {
            r.doc_id: (r.decision, r.match_id)
            for r in incremental_neardup(
                corpus, spark.createDataFrame(batch, DOC_SCHEMA)
            ).collect()
        }
        for doc_id, expect in twin.items():
            assert got[doc_id] == expect
    # batch_id recorded per trigger, two distinct values
    bids = {r.batch_id for r in spark.read.parquet(out).collect()}
    assert len(bids) == 2
