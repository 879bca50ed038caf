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
) -> DataFrame:
    """Full slow-log path: classify (P6) -> assemble + metrics + fingerprint
    (P7-P10)."""
    classified = classify_slow_log_lines(df, conv_col, order_col, text_col)
    return assemble_slow_entries(
        classified, conv_col, order_col, emit_trailing, use_pandas_udf
    )
