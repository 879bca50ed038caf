"""Streaming corpus curation: incremental document ingestion through the
same gates as the batch curation pipeline -- cross-batch exact dedup,
quality scoring, benchmark decontamination -- routed to per-decision
output partitions (the GELF failover router's shape applied to training
data).

Streaming-specific shapes:

* **Dedup is stateful**: ``dropDuplicates`` on the md5 text key keeps one
  32-char hash per distinct document ever seen (unbounded but tiny state;
  at 10^12 docs shard the state store or window the guarantee with
  ``dropDuplicatesWithinWatermark`` once documents carry event time).
* **Decontamination is stateless**: the eval corpus is small by
  definition, so its distinct gram-hash set broadcasts into an Arrow UDF
  (``contamination_flag_udf``) -- no explode, no aggregation, no shuffle,
  which is what lets the whole stream stay in append mode.
* **Routing is a column**, and the file sink partitions by it --
  kept / low_quality / contaminated land in separate directories with
  exactly-once file-sink semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mariadb_to_graylog_spark.operators import textstats as tx
from mariadb_to_graylog_spark.operators.decontam import contamination_flag_udf


def curate(
    docs: DataFrame,
    eval_hashes: set[int],
    quality_threshold: float = 0.5,
    n: int = 13,
) -> DataFrame:
    """The per-row curation transform (works on batch AND streaming
    DataFrames -- the batch-equivalence test runs it both ways):
    dedup on md5(text), score, flag, decide."""
    flag = contamination_flag_udf(eval_hashes, n)
    return (
        docs.withColumn("_h", F.md5("text"))
        .dropDuplicates(["_h"])
        .withColumn("quality", tx.quality_score(F.col("text")))
        .withColumn("contaminated", flag(F.col("text")))
        .withColumn(
            "decision",
            F.when(F.col("contaminated"), "contaminated")
            .when(F.col("quality") < quality_threshold, "low_quality")
            .otherwise("kept"),
        )
        .drop("_h")
    )


def start_curation_stream(
    docs_stream: DataFrame,
    out_base: str,
    checkpoint_dir: str,
    eval_hashes: set[int],
    quality_threshold: float = 0.5,
    trigger_ms: int = 1000,
    n: int = 13,
) -> StreamingQuery:
    routed = curate(docs_stream, eval_hashes, quality_threshold, n)
    return (
        routed.writeStream.format("parquet")
        .option("path", out_base)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("decision")
        .trigger(processingTime=f"{trigger_ms} milliseconds")
        .outputMode("append")
        .start()
    )
