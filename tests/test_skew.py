"""Hot-conversation skew: one conversation much larger than all others
(the north-rule's Zipf case).  Verifies correctness of both entry-id
strategies and that the block prefix-sum splits the hot conversation into
many independent tasks."""

from __future__ import annotations

from pyspark.sql import functions as F

from mariadb_to_graylog_spark.operators.assembly import (
    add_entry_ids,
    add_entry_ids_scalable,
)
from mariadb_to_graylog_spark.operators.errorlog import parse_error_log_lines


def test_hot_conversation_block_prefix_sum(spark):
    # hot conv: 20k turns; cold convs: 20 turns each
    hot = spark.range(20000).select(
        F.lit("conv-hot").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(
            F.lit("2024-01-01 10:00:"),
            F.lpad((F.col("id") % 60).cast("string"), 2, "0"),
            F.lit(" 0 [Note] msg "),
            F.col("id").cast("string"),
        ).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2024-01-01").cast("timestamp").alias("ts"),
    )
    # every 7th line malformed -> continuation
    hot = hot.withColumn(
        "text",
        F.when(F.col("turn_idx") % 7 == 3, F.lit("continuation line")).otherwise(
            F.col("text")
        ),
    )
    cold = spark.range(20).select(
        F.concat(F.lit("conv-c"), (F.col("id") % 5).cast("string")).alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("2024-01-01 10:00:00 0 [ERROR] cold").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2024-01-01").cast("timestamp").alias("ts"),
    )
    df = parse_error_log_lines(hot.unionByName(cold).repartition(8))

    simple = add_entry_ids(df).select("conv_id", "turn_idx", "entry_id")
    scalable = add_entry_ids_scalable(df, block_size=1024).select(
        "conv_id", "turn_idx", "entry_id"
    )
    a = {(r.conv_id, r.turn_idx): r.entry_id for r in simple.collect()}
    b = {(r.conv_id, r.turn_idx): r.entry_id for r in scalable.collect()}
    assert a == b
    # hot conv: entries = well-formed lines = 20000 - count(%7==3)
    n_malformed = sum(1 for i in range(20000) if i % 7 == 3)
    assert a[("conv-hot", 19999)] == 20000 - n_malformed

    # the scalable plan's first cumsum stage partitions on (conv, block):
    # the hot conversation spans 20000/1024 ~= 20 independent groups
    plan = scalable._jdf.queryExecution().executedPlan().toString()
    assert "_block" in plan
