"""Iceberg contract tests (SURVEY.md SRC1 target table format).

This sandbox ships no Iceberg jar, so every test here SKIPS -- but the
moment `iceberg-spark-runtime` lands on the classpath they run for real:
a runtime-registered hadoop catalog, a writeTo/read round trip through
`sources.transcripts`, and the resume high-water-mark path over an
Iceberg table.  This pins the gated `format('iceberg')` branch
(transcripts.py) so it cannot rot as dead code.

Reference analogue: the sourcelog open + seek loop
(mariadb-log-consumer.py:379-382,746-748) -- here the "file" is an
Iceberg table and the seek is the lineage HWM filter.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from mariadb_to_graylog_spark.sources.transcripts import (
    build_lineage,
    iceberg_available,
    read_transcripts,
    resume_filter,
    write_transcripts,
)


def _rows(lo: int, hi: int):
    return [
        ("conv-a", i, "user", f"2019-11-01 16:10:{i % 60:02d} 0 [Note] line {i}",
         None, datetime(2024, 1, 1, tzinfo=timezone.utc))
        for i in range(lo, hi)
    ]


SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


@pytest.fixture()
def iceberg_catalog(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("no Iceberg jar on the classpath (expected in this sandbox)")
    # catalog plugins resolve lazily, so runtime conf registration works
    spark.conf.set(
        "spark.sql.catalog.icetest", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.icetest.type", "hadoop")
    spark.conf.set("spark.sql.catalog.icetest.warehouse", str(tmp_path / "wh"))
    yield "icetest"
    spark.sql("DROP TABLE IF EXISTS icetest.db.transcripts")


def test_iceberg_write_read_roundtrip(spark, iceberg_catalog):
    tbl = f"{iceberg_catalog}.db.transcripts"
    df = spark.createDataFrame(_rows(0, 50), SCHEMA)
    write_transcripts(df, tbl, mode="overwrite")
    back = read_transcripts(spark, tbl)
    assert back.schema == df.schema
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )


def test_iceberg_append_and_resume_hwm(spark, iceberg_catalog):
    tbl = f"{iceberg_catalog}.db.transcripts"
    first = spark.createDataFrame(_rows(0, 30), SCHEMA)
    write_transcripts(first, tbl, mode="overwrite")
    # checkpoint the first run's high-water mark, then append new turns
    routed = first.selectExpr("conv_id", "'udp' AS sink")
    lineage = build_lineage(first, routed, run_id="r1")
    write_transcripts(spark.createDataFrame(_rows(30, 45), SCHEMA), tbl)
    resumed = resume_filter(read_transcripts(spark, tbl), lineage)
    got = sorted(r.turn_idx for r in resumed.collect())
    assert got == list(range(30, 45))  # only past-the-mark turns replay


def test_parquet_fallback_roundtrip(spark, tmp_path):
    """The same helpers on a parquet PATH (the gate's fallback arm) --
    runs everywhere, so the shared code path is never dead."""
    p = str(tmp_path / "transcripts_pq")
    df = spark.createDataFrame(_rows(0, 20), SCHEMA)
    write_transcripts(df, p, mode="overwrite")
    write_transcripts(spark.createDataFrame(_rows(20, 25), SCHEMA), p)
    back = read_transcripts(spark, p)
    assert back.count() == 25
    assert back.schema == df.schema
