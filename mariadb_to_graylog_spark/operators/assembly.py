"""Entry assembly: gaps-and-islands grouping of lines into logical entries.

The reference assembles multi-line entries implicitly, by mutating one
in-flight message as it reads lines in file order
(``mariadb-log-consumer.py:692-697,728-733``).  Here the same semantics are
a *gaps-and-islands* computation: ``entry_id`` = running count of
entry-start lines within a conversation, then a groupBy per entry.

Two physical strategies, same result (tested equal):

* ``add_entry_ids`` -- one window ``sum() over (partition by conv_id order
  by turn_idx)``.  Correct and minimal-shuffle, but a single hot
  conversation serializes into one task.
* ``add_entry_ids_scalable`` -- two-phase distributed prefix sum: each
  conversation is split into fixed ``turn_idx`` blocks; block-local running
  counts are computed in parallel, per-block totals are scanned with a
  (tiny) second window, and the per-block offsets are joined back.  A
  conversation with 10^8 turns becomes ``10^8 / block_size`` independent
  tasks instead of one.  This is the 100 TB path for Zipf-skewed
  conversation length (the north-rule's "salted-key repartitioning to
  defuse hot-conversation skew").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BLOCK_SIZE = 1 << 16


def add_entry_ids(
    df: DataFrame,
    start_col: str = "is_entry_start",
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    w = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("entry_id", F.sum(F.col(start_col).cast("long")).over(w))


def add_entry_ids_scalable(
    df: DataFrame,
    start_col: str = "is_entry_start",
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> DataFrame:
    """Distributed prefix sum over (conv_id, turn_idx) -- see module doc."""
    blocked = df.withColumn("_block", F.floor(F.col(order_col) / F.lit(block_size)))

    w_local = (
        Window.partitionBy(conv_col, "_block")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    blocked = blocked.withColumn(
        "_local_cum", F.sum(F.col(start_col).cast("long")).over(w_local)
    )

    # Per-block totals: tiny relation (rows / block_size), scanned with an
    # exclusive prefix window per conversation.
    totals = blocked.groupBy(conv_col, "_block").agg(
        F.sum(F.col(start_col).cast("long")).alias("_block_total")
    )
    w_blocks = (
        Window.partitionBy(conv_col)
        .orderBy("_block")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        conv_col,
        "_block",
        F.coalesce(F.sum("_block_total").over(w_blocks), F.lit(0)).alias("_block_offset"),
    )

    joined = blocked.join(offsets, on=[conv_col, "_block"], how="inner")
    return joined.withColumn(
        "entry_id", F.col("_block_offset") + F.col("_local_cum")
    ).drop("_block", "_local_cum", "_block_offset")


def with_entry_ids(
    df: DataFrame,
    scalable: bool = False,
    block_size: int = DEFAULT_BLOCK_SIZE,
    **kwargs,
) -> DataFrame:
    if scalable:
        return add_entry_ids_scalable(df, block_size=block_size, **kwargs)
    return add_entry_ids(df, **kwargs)


def assemble_error_entries(
    parsed: DataFrame,
    mode: str = "strict",
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    scalable: bool = False,
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> DataFrame:
    """Group parsed error-log lines into entries.

    ``mode='strict'`` reproduces the reference byte-for-byte: continuation
    text of malformed lines is *dropped* (the append at
    mariadb-log-consumer.py:733 is commented out), so an entry is exactly
    its well-formed first line.  ``mode='intended'`` implements the
    documented intent: continuation lines are appended to the entry's
    message with ``\\n`` joins (lib_consumer/gelf_message.py:57-70).

    Lines before the first well-formed line (entry_id == 0) are dropped in
    both modes, as in the reference (no in-flight message to extend).
    """
    if mode not in ("strict", "intended"):
        raise ValueError(f"unknown mode {mode!r}")

    with_ids = with_entry_ids(parsed, scalable=scalable, block_size=block_size,
                              conv_col=conv_col, order_col=order_col)
    with_ids = with_ids.filter(F.col("entry_id") > 0)

    if mode == "strict":
        return (
            with_ids.filter(F.col("is_entry_start"))
            .select(
                conv_col,
                "entry_id",
                F.col(order_col).alias("start_turn_idx"),
                "ts",
                "role",
                "tool",
                "ts_epoch",
                "thread_raw",
                "level_raw",
                "severity",
                "short_message",
                "message",
            )
        )

    # intended mode: one shuffle on (conv_id, entry_id); partial aggregation
    # (ObjectHashAggregate) runs map-side before the exchange.
    heads = F.sort_array(
        F.collect_list(F.struct(F.col(order_col).alias("i"), F.col("message").alias("m")))
    )
    agg = (
        with_ids.groupBy(conv_col, "entry_id")
        .agg(
            F.min(order_col).alias("start_turn_idx"),
            F.min_by("ts", order_col).alias("ts"),
            F.min_by("role", order_col).alias("role"),
            F.min_by("tool", order_col).alias("tool"),
            F.min_by("ts_epoch", order_col).alias("ts_epoch"),
            F.min_by("thread_raw", order_col).alias("thread_raw"),
            F.min_by("level_raw", order_col).alias("level_raw"),
            F.min_by("severity", order_col).alias("severity"),
            F.min_by("short_message", order_col).alias("short_message"),
            F.array_join(F.transform(heads, lambda s: s["m"]), "\n").alias("message"),
        )
    )
    return agg.select(
        conv_col,
        "entry_id",
        "start_turn_idx",
        "ts",
        "role",
        "tool",
        "ts_epoch",
        "thread_raw",
        "level_raw",
        "severity",
        "short_message",
        "message",
    )
