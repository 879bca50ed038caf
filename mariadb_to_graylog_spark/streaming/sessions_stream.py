"""Streaming sessionization: watermarked ``session_window`` aggregation,
the continuous twin of ``operators/sessions.session_stats``.

Spark's native session window (merging-interval state store, Spark 3.2+)
does exactly what the batch lag()+cumsum pass does, but incrementally:
events landing in different micro-batches MERGE into one session as long
as each arrives within ``gap`` of the session's edge, and a session is
finalized and emitted exactly once when the watermark passes its close
(last event + gap).  State is O(open sessions), not O(stream length).

Boundary semantics match the batch operator exactly (probed, pinned in
``test_boundary_semantics_match_exactly_at_gap``): ``session_window``
merges an event landing EXACTLY ``gap`` after the session edge (new
session only when the inter-event gap is strictly ``> gap``), the same
strict-``>`` rule the batch lag() pass applies at second resolution, so
the two carve identical sessions on whole-second streams.

Scale shape: one hash exchange on the user key (same as batch), session
merge is per-key state-store work, emitted rows are per-session
aggregates only -- raw events are never retained past the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def windowed_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    error_type: str = "error",
) -> DataFrame:
    """Per (user, session) aggregate over ``session_window``.  Works on
    batch AND streaming frames (batch is the test twin; ``withWatermark``
    is a no-op on batch)."""
    base = events.withWatermark(ts_col, watermark)
    return (
        base.groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap).alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum((F.col(type_col) == error_type).cast("long")).alias(
                "n_errors"
            ),
            (
                F.unix_seconds(F.max(ts_col).cast("timestamp"))
                - F.unix_seconds(F.min(ts_col).cast("timestamp"))
            )
            .cast("long")
            .alias("duration_sec"),
        )
        .select(
            F.col(user_col).cast("long").alias(user_col),
            F.unix_seconds(F.col("sw.start").cast("timestamp")).alias(
                "session_start_epoch"
            ),
            "n_events",
            "n_errors",
            "duration_sec",
        )
    )


def start_session_stream(
    events: DataFrame,
    out_path: str,
    checkpoint: str,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    trigger_ms: int = 500,
    **kwargs,
) -> StreamingQuery:
    """Append-mode parquet sink: each finalized session lands exactly
    once (the watermark closes it)."""
    agg = windowed_sessions(events, gap=gap, watermark=watermark, **kwargs)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_ms} milliseconds")
        .start()
    )
