"""Gap-based sessionization and event-transition analytics over the
events/telemetry stream.

The classic log-pipeline pair the reference's aggregate stage implies but
never had capacity for (mariadb-log-consumer.py keeps only global counters,
see mariadb-log-consumer.py:858-899): split each user's event stream into
sessions wherever the inter-event gap exceeds a threshold, then aggregate
per session; and count event-type transitions (the Markov/funnel table).

Scale shape (10^12 events):

* ONE hash exchange on the user key feeds BOTH the lag() pass and the
  per-session aggregate -- Spark plans the window and the groupBy over the
  same hashpartitioning(user_id) without a second shuffle because the
  session key (user_id, session_idx) is prefixed by the partition key.
* Per-partition work is a sort bounded by events-per-user, not corpus
  size.  Pathological users (bots, monitors) are exactly what
  ``textstats.key_skew_stats`` measures; when a key exceeds executor
  memory the mitigation is time-bucketing the key (user_id, day) upstream,
  which this operator accepts unchanged via ``user_col``.
* Everything is built-in window/agg expressions -- whole-stage codegen,
  zero Python, zero UDF.
* Second-resolution epoch math (``unix_seconds``) keeps gap boundaries
  and durations bit-identical across engines (DuckDB twin uses
  ``floor(epoch(ts))``); full-resolution timestamps still order the
  stream, with the event id as the deterministic tiebreak.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_sec(ts_col: str) -> Column:
    # events.ts is TIMESTAMP_NTZ; the session tz is pinned UTC, so the
    # cast reads the naive value as UTC like DuckDB's epoch()
    return F.unix_seconds(F.col(ts_col).cast("timestamp"))


def sessionize(
    df: DataFrame,
    gap_sec: int = 21600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Assign a per-user ``session_idx`` (1-based, in stream order): a new
    session starts at the first event and whenever the gap since the
    previous event exceeds ``gap_sec``.

    lag() flags boundaries, a running sum over the same window numbers
    them -- both ride one hashpartitioning(user) exchange + one in-
    partition sort.  Adds ``_sec`` (epoch seconds) for downstream reuse.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    sec = _epoch_sec(ts_col)
    prev = F.lag(sec).over(w)
    is_new = (prev.isNull() | ((sec - prev) > F.lit(gap_sec))).cast("long")
    return df.withColumn("_sec", sec).withColumn(
        "session_idx",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    gap_sec: int = 21600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    error_type: str = "error",
) -> DataFrame:
    """One row per (user, session): event count, wall duration, error
    count, session start -- the telemetry rollup a per-sink dashboard
    reads.  Same single exchange as :func:`sessionize` (the groupBy key
    is prefixed by the window partition key)."""
    s = sessionize(df, gap_sec, user_col, ts_col, id_col)
    return (
        s.groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.max("_sec") - F.min("_sec")).cast("long").alias("duration_sec"),
            F.sum((F.col(type_col) == error_type).cast("long")).alias(
                "n_errors"
            ),
            F.min("_sec").cast("long").alias("start_epoch"),
        )
        .select(
            F.col(user_col).cast("long").alias(user_col),
            F.col("session_idx").cast("long").alias("session_idx"),
            "n_events",
            "duration_sec",
            "n_errors",
            "start_epoch",
        )
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    ppm_digits: int = 0,
) -> DataFrame:
    """Per-user event-type transition counts (the funnel / first-order
    Markov table): one row per (prev_type, type) with the transition
    count and its integer-ppm share within prev_type.

    Stream starts contribute a synthetic ``'_start'`` prev state so row
    counts conserve (sum of n over prev='_start' == number of users).
    Shares are exact integer ppm (floor of count*1e6/total) so the values
    are fp-order-stable across engines.  Shape: the same single user
    exchange for lag(), then one tiny (|types|+1)^2-bounded aggregate.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.coalesce(F.lag(type_col).over(w), F.lit("_start"))
    pairs = df.select(
        prev.alias("prev_type"), F.col(type_col).alias("event_type")
    )
    counts = pairs.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "event_type",
        "n",
        F.floor(F.col("n") * 1000000 / F.sum("n").over(tot))
        .cast("long")
        .alias("share_ppm"),
    )


def hourly_gapfilled_counts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_buckets: int = 3,
) -> DataFrame:
    """Time-series RESAMPLING with gap-fill -- the telemetry dashboard
    primitive the row-stream ops can't express: per user, one row per
    HOUR bucket from that user's first to last event, zero-filled where
    no event landed (a silent hour IS the signal an alerting rule
    reads), plus a trailing ``window_buckets``-bucket event SUM (the
    moving aggregate kept as an exact integer -- a float moving average
    would be fp-order-unstable across engines).

    (user_id, hour_bucket, n_events, trailing_sum)

    Shape at scale: one (user, hour) count aggregate (map-side combined),
    one per-user min/max aggregate, the gap GRID generated by a
    ``sequence`` explode (rows = active-span hours per user -- data
    generated, never collected), one join back on the already-partitioned
    key, and the trailing window rides the same (user) partitioning.
    Second-resolution epoch math (``unix_seconds`` == DuckDB ``epoch``)
    keeps bucket boundaries engine-portable."""
    from pyspark.sql.window import Window

    ev = df.select(
        F.col(user_col).alias("user_id"), _epoch_sec(ts_col).alias("_es")
    ).select("user_id", F.expr("_es div 3600").cast("long").alias("hb"))
    counts = ev.groupBy("user_id", "hb").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    span = ev.groupBy("user_id").agg(
        F.min("hb").alias("_lo"), F.max("hb").alias("_hi")
    )
    grid = span.select(
        "user_id", F.explode(F.sequence("_lo", "_hi")).alias("hb")
    )
    filled = grid.join(counts, ["user_id", "hb"], "left").select(
        "user_id",
        F.col("hb").alias("hour_bucket"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_bucket")
        .rowsBetween(-(window_buckets - 1), 0)
    )
    return filled.withColumn(
        "trailing_sum", F.sum("n_events").over(w).cast("long")
    )
