"""Slow-log parsing operators (SURVEY.md P6-P10).

The reference classifies slow-log lines with a 3-state FSM
(``None``/``META``/``SQL``, mariadb-log-consumer.py:897-954) and mutates one
in-flight ``query_text``.  The FSM is re-derived here as *stateless* window
expressions -- the key observation being that META/SQL classification is a
property of maximal runs of consecutive ``'# '``-prefixed lines:

* an entry starts at the FIRST ``'# Time:'`` line of a hash-run (a
  ``'# Time:'`` line deeper in a run follows META state and is swallowed,
  :915-917; one that follows SQL state starts an entry, :925-931);
* every hash-run line at/after its entry-start is META; every other line
  after the entry start is SQL -- including ``'# '`` comment lines in a run
  that contains no ``'# Time:'`` (:925-933);
* empty lines are ignored entirely, state unchanged (:901-902).

Reference semantics preserved:

* ``use ...`` skipped only as SQL line 0; ``SET timestamp=N;`` harvested and
  skipped only as SQL line 1, with the exact ``line[14:len-1]`` slice
  (:873-895);  SQL lines joined with ``\\n`` (:821-826).
* one-entry-lag flush: an entry is emitted when the *next* ``'# Time:'``
  arrives, so the trailing entry of a conversation is dropped at EOF
  (:947-949,992-993).  ``emit_trailing=True`` opts into the intended
  behavior.
* entries with no SQL-section lines are never emitted (``query_line``
  falsy at flush, :947-948).
* META metric extraction (P9) is *declared but unimplemented* in the
  reference (_metrics at :86-106 stays empty; TODO.md:9); this engine
  implements the intended extraction for all 18 fields, in two equivalent
  flavors: JVM-side ``regexp_extract`` columns (default) and an
  Arrow-vectorized pandas UDF (``extract_metrics_udf``) -- tested equal,
  benchmarked in bench.py.

Headers before the first entry are dropped (reference state ``None``,
:937-939).  A ``'# '`` comment line appearing before any entry would crash
the reference (query_text is None, :894 -- exception dodged by C6); we
drop such lines, divergence documented here.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mariadb_to_graylog_spark.operators.fingerprint import fingerprint_col

# field -> (regex over a META line, cast type); '' group => no match => NULL.
# Patterns avoid lookaround so they are portable across Java regex / RE2.
META_FIELD_PATTERNS: dict[str, tuple[str, str]] = {
    "user": (r"User@Host:\s+([^\[\s]+)\[", "string"),
    "ip": (r"@\s+\S+\s+\[([0-9a-fA-F:.]+)\]", "string"),
    "thread_id": (r"Thread_id:\s+(\d+)", "long"),
    "schema": (r"Schema:\s+(\S+)", "string"),
    "query_cache_hit": (r"QC_hit:\s+(\w+)", "string"),
    "query_time": (r"Query_time:\s+([0-9.]+)", "double"),
    "lock_time": (r"Lock_time:\s+([0-9.]+)", "double"),
    "rows_sent": (r"Rows_sent:\s+(\d+)", "long"),
    "rows_examined": (r"Rows_examined:\s+(\d+)", "long"),
    "rows_affected": (r"Rows_affected:\s+(\d+)", "long"),
    "bytes_sent": (r"Bytes_sent:\s+(\d+)", "long"),
    "tmp_tables": (r"Tmp_tables:\s+(\d+)", "long"),
    "tmp_disk_tables": (r"Tmp_disk_tables:\s+(\d+)", "long"),
    "tmp_table_sizes": (r"Tmp_table_sizes:\s+(\d+)", "long"),
    "full_scan": (r"Full_scan:\s+(\w+)", "string"),
    "full_join": (r"Full_join:\s+(\w+)", "string"),
    "merge_passes": (r"Merge_passes:\s+(\d+)", "long"),
}

METRIC_COLS = list(META_FIELD_PATTERNS)


def classify_slow_log_lines(
    df: DataFrame, conv_col: str = "conv_id", order_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Line classification (P6): adds ``line, is_meta, is_sql, entry_id,
    sql_pos`` columns.  Empty lines are removed (FSM no-ops).

    Physical shape: every window below shares ONE spec -- partitionBy
    conv_id, orderBy turn_idx -- so the whole classification costs a single
    sort (Catalyst chains the window functions into consecutive WindowExec
    nodes without re-sorting).  The earlier formulation partitioned helper
    windows by (conv, hash_run) and (conv, entry), adding two more full
    sorts per pass; because runs and entries are contiguous in turn order,
    each per-run/per-entry quantity is re-expressed as a running max over
    the turn ordering instead:

    * first-Time-of-run (entry start)  -> 'the last Time line seen lies
      before my run's start turn';
    * same-run-as-entry-start (META)   -> 'the last entry start lies at or
      after my run's start turn';
    * SQL position within entry        -> global running SQL count minus
      its value at the entry start.
    """
    line = F.regexp_replace(F.col(text_col), r"\s+$", "")
    out = df.withColumn("line", line).filter(F.col("line") != "")

    is_hash = F.substring("line", 1, 2) == "# "
    is_time = F.substring("line", 2, 6) == " Time:"  # line[1:7] == ' Time:'
    out = out.withColumn("_is_hash", is_hash).withColumn("_is_time", is_hash & is_time)

    w = Window.partitionBy(conv_col).orderBy(order_col)
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)

    # start turn of the current maximal '# '-run (valid for hash rows)
    run_start = F.col("_is_hash") & F.coalesce(
        ~F.lag("_is_hash").over(w), F.lit(True)
    )
    out = out.withColumn(
        "_run_start_turn",
        F.max(F.when(run_start, F.col(order_col))).over(w_cum),
    )

    # entry start = '# Time:' line with no earlier Time inside its run
    prev_time_turn = F.max(F.when(F.col("_is_time"), F.col(order_col))).over(w_prev)
    out = out.withColumn(
        "is_entry_start",
        F.col("_is_time")
        & (
            prev_time_turn.isNull()
            | (prev_time_turn < F.col("_run_start_turn"))
        ),
    )

    out = out.withColumn(
        "entry_id", F.sum(F.col("is_entry_start").cast("long")).over(w_cum)
    )

    # META = hash line whose run contains the current entry's start
    last_entry_start_turn = F.max(
        F.when(F.col("is_entry_start"), F.col(order_col))
    ).over(w_cum)
    out = out.withColumn(
        "is_meta",
        F.col("_is_hash") & (last_entry_start_turn >= F.col("_run_start_turn")),
    )
    out = out.withColumn("is_sql", ~F.col("is_meta"))

    # 0-based SQL-section line number (query_line), counting skipped lines
    sql_cum = F.sum(F.col("is_sql").cast("long")).over(w_cum)
    out = out.withColumn("_sql_cum", sql_cum)
    entry_base = F.max(
        F.when(F.col("is_entry_start"), F.col("_sql_cum"))
    ).over(w_cum)
    out = out.withColumn(
        "sql_pos", F.when(F.col("is_sql"), F.col("_sql_cum") - entry_base - 1)
    )
    return (
        out.filter(F.col("entry_id") > 0)
        .drop("_is_hash", "_is_time", "_run_start_turn", "_sql_cum")
    )


def _scan_layer(
    df: DataFrame,
    specs: list[tuple[str, Column, str, bool]],
    conv_col: str,
    order_col: str,
    block_col: str = "_blk",
) -> DataFrame:
    """One layer of distributed prefix scans over (conv, order): each spec
    (name, value, kind 'sum'|'max', exclusive) becomes a running aggregate
    computed as block-local window + per-block carry.

    The carries relation has rows/block_size rows and is BROADCAST back,
    so the big relation is shuffled/sorted on (conv, block) once for the
    whole layer chain and never again.  Multiple specs share one groupBy.
    """
    w_incl = (
        Window.partitionBy(conv_col, block_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_excl = (
        Window.partitionBy(conv_col, block_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_carry = (
        Window.partitionBy(conv_col)
        .orderBy(block_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    aggs, carry_cols = [], []
    for name, value, kind, exclusive in specs:
        df = df.withColumn(f"_v_{name}", value)
        fn = F.sum if kind == "sum" else F.max
        df = df.withColumn(
            f"_loc_{name}", fn(f"_v_{name}").over(w_excl if exclusive else w_incl)
        )
        aggs.append(fn(f"_v_{name}").alias(f"_tot_{name}"))
        carry_cols.append(fn(f"_tot_{name}").over(w_carry).alias(f"_carry_{name}"))
    totals = df.groupBy(conv_col, block_col).agg(*aggs)
    carries = totals.select(conv_col, block_col, *carry_cols)
    df = df.join(F.broadcast(carries), [conv_col, block_col], "left")
    for name, _, kind, _ in specs:
        if kind == "sum":
            combined = F.coalesce(f"_loc_{name}", F.lit(0)) + F.coalesce(
                f"_carry_{name}", F.lit(0)
            )
        else:
            # greatest() skips NULLs: null local (no value yet in block)
            # falls back to the carry, and vice versa
            combined = F.greatest(f"_loc_{name}", f"_carry_{name}")
        df = df.withColumn(name, combined).drop(
            f"_v_{name}", f"_loc_{name}", f"_carry_{name}"
        )
    return df


def classify_slow_log_lines_scalable(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    block_size: int = 1 << 16,
) -> DataFrame:
    """Block-scan twin of classify_slow_log_lines: same output columns,
    but every running quantity is a distributed prefix scan over fixed
    ``order_col`` blocks instead of one whole-conversation window -- a
    single 10^8-turn conversation becomes 10^8/block_size parallel tasks
    per layer instead of one serial task (the slow-path analogue of
    assembly.add_entry_ids_scalable; tested equal to the window classifier
    with block_size forced tiny to stress the boundaries).

    Four scan layers mirror the classifier's dependency chain:
    run-starts (needs the previous block's last-row hash flag, a tiny
    edge join) -> run/time turns -> entry ids + last entry start ->
    sql position base.
    """
    line = F.regexp_replace(F.col(text_col), r"\s+$", "")
    out = df.withColumn("line", line).filter(F.col("line") != "")

    is_hash = F.substring("line", 1, 2) == "# "
    is_time = F.substring("line", 2, 6) == " Time:"
    out = out.withColumn("_is_hash", is_hash).withColumn("_is_time", is_hash & is_time)
    out = out.withColumn("_blk", F.floor(F.col(order_col) / F.lit(block_size)))

    # previous row's _is_hash: block-local lag, with the boundary fallback
    # taken from the last row of the previous PRESENT block (lag over the
    # per-block edge relation -- a fixed +1 shift would lose the carry
    # across blocks whose rows were all blank-filtered or absent from a
    # turn_idx gap, misclassifying the next block's first rows as a
    # conversation start); null at conversation start.  The edge relation
    # is one row per (conv, block) -- tiny, broadcast.
    w_local = Window.partitionBy(conv_col, "_blk").orderBy(order_col)
    w_edge = Window.partitionBy(conv_col).orderBy("_blk")
    edges = (
        out.groupBy(conv_col, "_blk")
        .agg(F.max_by("_is_hash", F.col(order_col)).alias("_last_hash"))
        .select(
            conv_col, "_blk",
            F.lag("_last_hash").over(w_edge).alias("_edge_hash"),
        )
    )
    out = out.join(F.broadcast(edges), [conv_col, "_blk"], "left")
    prev_hash = F.coalesce(F.lag("_is_hash").over(w_local), F.col("_edge_hash"))
    run_start = F.col("_is_hash") & F.coalesce(~prev_hash, F.lit(True))
    out = out.withColumn("_run_start", run_start).drop("_edge_hash")

    # layer 1: run-start turn (inclusive max) + previous Time turn
    # (exclusive max)
    out = _scan_layer(
        out,
        [
            ("_run_start_turn", F.when(F.col("_run_start"), F.col(order_col)), "max", False),
            ("_prev_time_turn", F.when(F.col("_is_time"), F.col(order_col)), "max", True),
        ],
        conv_col,
        order_col,
    )
    out = out.withColumn(
        "is_entry_start",
        F.col("_is_time")
        & (
            F.col("_prev_time_turn").isNull()
            | (F.col("_prev_time_turn") < F.col("_run_start_turn"))
        ),
    )

    # layer 2: entry ids (sum) + turn of the current entry's start (max)
    out = _scan_layer(
        out,
        [
            ("entry_id", F.col("is_entry_start").cast("long"), "sum", False),
            ("_last_start_turn", F.when(F.col("is_entry_start"), F.col(order_col)), "max", False),
        ],
        conv_col,
        order_col,
    )
    out = out.withColumn(
        "is_meta",
        F.col("_is_hash") & (F.col("_last_start_turn") >= F.col("_run_start_turn")),
    ).withColumn("is_sql", ~F.col("is_meta"))

    # layer 3: running SQL-line count
    out = _scan_layer(
        out, [("_sql_cum", F.col("is_sql").cast("long"), "sum", False)],
        conv_col, order_col,
    )
    # layer 4: the entry's base SQL count (running max of the count AT
    # entry starts -- monotone, so max == most recent)
    out = _scan_layer(
        out,
        [("_entry_base", F.when(F.col("is_entry_start"), F.col("_sql_cum")), "max", False)],
        conv_col, order_col,
    )
    out = out.withColumn(
        "sql_pos",
        F.when(F.col("is_sql"), F.col("_sql_cum") - F.col("_entry_base") - 1),
    )
    return out.filter(F.col("entry_id") > 0).drop(
        "_is_hash", "_is_time", "_blk", "_run_start", "_run_start_turn",
        "_prev_time_turn", "_last_start_turn", "_sql_cum", "_entry_base",
    )


def _meta_extract_cols(line: Column) -> list[Column]:
    cols = []
    for name, (pat, typ) in META_FIELD_PATTERNS.items():
        v = F.regexp_extract(line, pat, 1)
        # try_cast: regex-validated but overflow-able digits must not ANSI-abort
        cols.append(F.when(v != "", v).try_cast(typ).alias(f"_m_{name}"))
    return cols


def extract_metrics_udf(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Arrow-vectorized alternative to the JVM regexp columns: one pandas
    batch pass, ``Series.str.extract`` per field (P9's intended grok)."""
    from pyspark.sql import types as T

    fields = list(META_FIELD_PATTERNS.items())
    _typ = {"string": T.StringType(), "long": T.LongType(), "double": T.DoubleType()}
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(f"_m_{n}", _typ[t], True) for n, (_, t) in fields]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            s = pdf[line_col]
            for name, (pat, typ) in fields:
                v = s.str.extract(pat, expand=False)
                if typ == "long":
                    pdf[f"_m_{name}"] = pd.to_numeric(v, errors="coerce").astype("Int64")
                elif typ == "double":
                    pdf[f"_m_{name}"] = pd.to_numeric(v, errors="coerce")
                else:
                    pdf[f"_m_{name}"] = v
            yield pdf

    return df.mapInPandas(extract, schema=schema)


def assemble_slow_entries(
    classified: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    emit_trailing: bool = False,
    use_pandas_udf: bool = False,
) -> DataFrame:
    """Group classified lines into slow-log entries (P7-P10)."""
    df = classified

    # SET timestamp harvest (P8): exact line[14:len-1] slice semantics
    set_ts = F.when(
        (F.col("sql_pos") == 1) & (F.substring("line", 1, 14) == "SET timestamp="),
        F.substring(F.col("line"), 15, F.length("line") - F.lit(15)).try_cast("long"),
    )
    skip = (
        ((F.col("sql_pos") == 0) & (F.substring("line", 1, 4) == "use "))
        | ((F.col("sql_pos") == 1) & (F.substring("line", 1, 14) == "SET timestamp="))
    )
    df = df.withColumn("_set_ts", set_ts).withColumn("_skip", skip)

    # intended '# Time:' parse: 'yymmdd H:mm:ss' (pivot 69) or ISO datetime
    t_raw = F.regexp_extract("line", r"^# Time:\s+(.*\S)\s*$", 1)
    yy = F.regexp_extract(t_raw, r"^(\d{2})(\d{2})(\d{2})\s", 1).try_cast("int")
    t_f2 = F.unix_seconds(F.try_to_timestamp(
        F.concat(
            F.when(yy <= 68, yy + 2000).otherwise(yy + 1900).cast("string"),
            F.lit("-"),
            F.regexp_extract(t_raw, r"^(\d{2})(\d{2})(\d{2})\s", 2),
            F.lit("-"),
            F.regexp_extract(t_raw, r"^(\d{2})(\d{2})(\d{2})\s", 3),
            F.lit(" "),
            F.regexp_extract(t_raw, r"^\d{6}\s+(\d{1,2}:\d{2}:\d{2})$", 1),
        ),
        F.lit("yyyy-MM-dd H:mm:ss"),
    ))
    t_iso = F.unix_seconds(
        F.try_to_timestamp(t_raw, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
    )
    df = df.withColumn(
        "_time_line_ts", F.when(F.col("is_entry_start"), F.coalesce(t_f2, t_iso))
    )

    if use_pandas_udf:
        meta_in = df.withColumn(
            "_meta_line", F.when(F.col("is_meta"), F.col("line"))
        )
        extracted = extract_metrics_udf(meta_in, line_col="_meta_line")
        metric_aggs = [
            F.max(f"_m_{n}").alias(n) for n in METRIC_COLS
        ]
        df = extracted
    else:
        meta_line = F.when(F.col("is_meta"), F.col("line"))
        df = df.select("*", *_meta_extract_cols(meta_line))
        metric_aggs = [F.max(f"_m_{n}").alias(n) for n in METRIC_COLS]

    sql_struct = F.when(
        F.col("is_sql") & ~F.col("_skip"),
        F.struct(F.col(order_col).alias("i"), F.col("line").alias("m")),
    )
    agg = (
        df.groupBy(conv_col, "entry_id")
        .agg(
            F.min(order_col).alias("start_turn_idx"),
            F.min_by("ts", order_col).alias("ts"),
            F.min_by("role", order_col).alias("role"),
            F.min_by("tool", order_col).alias("tool"),
            F.sum(F.col("is_sql").cast("long")).alias("_sql_line_count"),
            F.max("_set_ts").alias("set_timestamp"),
            F.max("_time_line_ts").alias("time_line_ts"),
            F.array_join(
                F.transform(F.sort_array(F.collect_list(sql_struct)), lambda s: s["m"]),
                "\n",
            ).alias("query_text"),
            F.count(sql_struct).alias("_kept_count"),
            *metric_aggs,
        )
    )

    # Trailing drop BEFORE the >=1-SQL-line filter: the reference flushes
    # entry e when the NEXT '# Time:' arrives (:925-931,947-949), so every
    # non-last entry is flush-eligible even when the LAST entry has no SQL
    # lines (e.g. a truncated log ending in a bare '# Time:' header).
    # Computing max(entry_id) after the SQL filter wrongly dropped the last
    # complete entry in that case.
    if not emit_trailing:
        w_conv = Window.partitionBy(conv_col)
        agg = agg.withColumn("_max_entry", F.max("entry_id").over(w_conv)).filter(
            F.col("entry_id") < F.col("_max_entry")
        ).drop("_max_entry")

    # entries with no SQL-section lines are never emitted (query_line falsy
    # at flush, :947-948)
    agg = agg.filter(F.col("_sql_line_count") >= 1)

    # query_text_raw is byte-equal to the reference's accumulated string,
    # which starts with '\n' (the first append is ''+'\n'+line, :821-826);
    # query_text is the clean join.
    agg = agg.withColumn(
        "query_text_raw",
        F.when(
            F.col("_kept_count") > 0, F.concat(F.lit("\n"), F.col("query_text"))
        ).otherwise(F.lit("")),
    )
    agg = agg.withColumn("ts_epoch", F.coalesce("set_timestamp", "time_line_ts"))
    agg = agg.withColumn("query_fingerprint", fingerprint_col(F.col("query_text")))
    return agg.drop("_sql_line_count", "_kept_count")


def parse_slow_log(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    emit_trailing: bool = False,
    use_pandas_udf: bool = False,
    scalable: bool = False,
    block_size: int = 1 << 16,
) -> DataFrame:
    """Full slow-log path: classify (P6) -> assemble + metrics + fingerprint
    (P7-P10).  ``scalable=True`` switches classification to the block-scan
    variant (hot-conversation skew; same results)."""
    if scalable:
        classified = classify_slow_log_lines_scalable(
            df, conv_col, order_col, text_col, block_size
        )
    else:
        classified = classify_slow_log_lines(df, conv_col, order_col, text_col)
    return assemble_slow_entries(
        classified, conv_col, order_col, emit_trailing, use_pandas_udf
    )
