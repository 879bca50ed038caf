"""Streaming corpus-statistics drift monitor: per-event-time-window token
-length percentiles over an incoming document/turn stream -- the
continuous twin of ``textstats.token_length_percentiles`` (the standard
pre-training length diagnostic, computed as data lands instead of in a
nightly batch).

Why this shape scales:

* the percentile state is an ``approx_percentile`` SKETCH
  (QuantileSummaries): fixed memory per (window) group, mergeable across
  partitions AND micro-batches -- the exact interpolated percentile used
  by the batch oracle path buffers every value and cannot stream;
* the watermark bounds state: a window's sketch is finalized and emitted
  once event time passes window end + delay, so state is
  O(open windows), not O(stream length);
* counts and means are exact (integer sums), so drift alerts on volume
  are precise even while the percentile is (bounded-error) approximate.

Accuracy contract: rank error <= n/accuracy per window -- the same bound
tested for the batch sketch in test_token_percentiles_approx_within_rank_bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mariadb_to_graylog_spark.operators.textstats import token_count


def windowed_token_percentiles(
    docs: DataFrame,
    text_col: str = "text",
    time_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """(window_start, window_end, n_docs, mean_tokens, p50, p90, p99) per
    tumbling event-time window.  Works on batch AND streaming frames (the
    batch run is the test twin; ``withWatermark`` is a no-op on batch)."""
    arr = ", ".join(str(p) for p in ps)
    qexpr = F.expr(f"approx_percentile(n, array({arr}), {accuracy})")
    base = docs.select(
        F.col(time_col).alias("_t"), token_count(F.col(text_col)).alias("n")
    ).withWatermark("_t", watermark)
    agg = base.groupBy(F.window("_t", window).alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("n"), 6).alias("mean_tokens"),
        qexpr.alias("_q"),
    )
    cols = [
        F.col("_q").getItem(i).cast("double").alias(f"p{int(p * 100)}")
        for i, p in enumerate(ps)
    ]
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n_docs",
        "mean_tokens",
        *cols,
    )


def start_token_percentile_stream(
    docs_stream: DataFrame,
    out_base: str,
    checkpoint_dir: str,
    text_col: str = "text",
    time_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
    trigger_ms: int = 1000,
) -> StreamingQuery:
    """Append-mode file sink: a window's row is emitted exactly once, when
    the watermark closes it -- the downstream drift detector reads
    finalized windows only.  ``ps``/``accuracy`` pass straight through to
    the windowed aggregate (p999 alerting, coarser sketches)."""
    stats = windowed_token_percentiles(
        docs_stream, text_col, time_col, window, watermark, ps, accuracy
    )
    return (
        stats.writeStream.format("parquet")
        .option("path", out_base)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_ms} milliseconds")
        .outputMode("append")
        .start()
    )
