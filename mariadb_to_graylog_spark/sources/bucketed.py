"""Bucketed transcript storage: pay the shuffle ONCE at write time.

At 10^12 turns the dominant recurring cost of every per-conversation
operator (entry assembly windows, slow-log FSM, lineage aggregation,
transcript-to-transcript joins) is the hash exchange on ``conv_id``.
Bucketing the table by ``conv_id`` (and sorting buckets by ``turn_idx``)
persists that partitioning in the table layout: any later join or
aggregation keyed on ``conv_id`` between same-bucket-count tables is
EXCHANGE-FREE -- Catalyst reads the bucket spec from the catalog and
drops the shuffle on both sides (proved by the plan assertion in
tests/test_bucketed.py).

This is the parquet/catalog analogue of the Iceberg
``bucket(conv_id, N)`` partition transform named by SURVEY §1.4 -- same
contract, expressed through Spark's bucketed-table support so it runs in
this sandbox (no Iceberg jar); the Iceberg path takes over via
sources/transcripts.py when a jar is present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 64,
    bucket_col: str = "conv_id",
    sort_col: str = "turn_idx",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed+sorted catalog table.  ``buckets`` must
    match between tables that should co-locate (Spark only elides the
    exchange when both sides agree)."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, bucket_col)
        .sortBy(sort_col)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
