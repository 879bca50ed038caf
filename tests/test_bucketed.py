"""Bucketed-table co-location: joins and aggregations on the bucket key
must run WITHOUT a shuffle exchange -- the scale pattern that amortizes
the conv_id exchange across every downstream per-conversation job."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mariadb_to_graylog_spark.sources.bucketed import read_bucketed, write_bucketed


@pytest.fixture()
def bucket_db(spark, tmp_path):
    db = "bktest"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path}/wh'")
    yield db
    for t in spark.catalog.listTables(db):
        spark.sql(f"DROP TABLE IF EXISTS {db}.{t.name}")
    spark.sql(f"DROP DATABASE IF EXISTS {db}")


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_and_agg_are_exchange_free(
    spark, transcripts, bucket_db, no_broadcast
):
    write_bucketed(transcripts, f"{bucket_db}.t_a", buckets=8)
    write_bucketed(
        transcripts.select("conv_id", "turn_idx", "role"),
        f"{bucket_db}.t_b",
        buckets=8,
    )
    a = read_bucketed(spark, f"{bucket_db}.t_a")
    b = read_bucketed(spark, f"{bucket_db}.t_b")

    # the realistic per-conversation shape: enrich every turn with a
    # per-conversation aggregate of the OTHER table.  NOTE the join key
    # must equal the bucket key -- a (conv_id, turn_idx) join disables
    # bucketed reads because the bucket spec can't satisfy the two-column
    # distribution ("Bucketed: false (disabled by query planner)").
    hwm = b.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_b"))
    joined = a.join(hwm, "conv_id")
    # rows correct
    assert joined.count() == transcripts.count()
    # and NO shuffle anywhere: a reads bucketed, b's aggregate inherits
    # the bucket distribution, the join consumes both in place (broadcast
    # disabled so the test is honest)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan

    agg = a.groupBy("conv_id").agg(F.max("turn_idx").alias("hwm"))
    assert agg.count() > 0
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan

    # a NON-bucketed copy of the same data DOES shuffle -- the assertion
    # above is meaningful, not vacuous
    plain = transcripts.groupBy("conv_id").agg(F.max("turn_idx").alias("hwm"))
    plain.count()
    plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan


def test_read_transcripts_resolves_catalog_tables(
    spark, transcripts, bucket_db
):
    """--input can name a catalog table (e.g. a bucketed one): the source
    resolves it before falling back to a parquet path."""
    from mariadb_to_graylog_spark.sources.transcripts import read_transcripts

    write_bucketed(transcripts, f"{bucket_db}.t_cat", buckets=4)
    back = read_transcripts(spark, f"{bucket_db}.t_cat")
    assert back.count() == transcripts.count()
    assert set(back.columns) == set(transcripts.columns)
