"""Driver-contract queries: each engine operator exercised over the
driver-provided parquet tables, with an ANSI-SQL DuckDB oracle twin.

The transcripts table is not part of the driver's fixed table set, so the
log-pipeline queries *synthesize* transcript lines deterministically from
``events`` / ``orders`` (pure column expressions, identical in the oracle
SQL), then run the real engine operators on them.  This makes the oracle an
end-to-end check of parse -> assemble -> enrich -> route semantics, not a
re-implementation shortcut.

Query -> SURVEY.md section 2 operator map:
  errorlog_entries        P1-P4, P11, P13, SRC1 (strict P5)
  errorlog_intended       P5 intended multiline append
  errorlog_gelf           M1, M3 (byte-compat serializer), P12
  routing_counts          S4, M4, A2
  severity_histogram      A2
  entry_islands           P5 gaps-and-islands core
  slowlog_entries         P6-P10, P8 position quirk, EP2 trailing drop
  offset_limit            SRC3, SRC4
  resume_hwm              SRC2, C1
  windowed_counts         A2 streaming-window semantics (batch twin)
  counters                A1
  tpch_pricing            general agg capability (hash agg, decimal sums)
  join_enrich             P12-style broadcast enrichment joins

Training-data queries (dedup / similarity / text / multimodal) are in the
second half of this module; docs/OPERATOR_MAP.md is the full inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mariadb_to_graylog_spark.functions.gelf import gelf_json_compat, with_gelf_level
from mariadb_to_graylog_spark.operators.assembly import (
    assemble_error_entries,
    with_entry_ids,
)
from mariadb_to_graylog_spark.operators.errorlog import parse_error_log_lines
from mariadb_to_graylog_spark.operators.slowlog import parse_slow_log

HOST = "sparkhost"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


# ---------------------------------------------------------------------------
# synthesized error-log transcripts from `events`
# ---------------------------------------------------------------------------

_SEV_CASE = {
    "error": "[ERROR]",
    "signup": "[Warning]",
    "purchase": "[Note]",
    "click": "[note]",
}


def synth_error_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> transcript lines: F1 for even event_ids, F2 for odd,
    'view' events become malformed continuation lines; value>15 appends a
    non-ASCII char (exercises M4/S4 routing)."""
    ev = _events(spark, sf_dir)
    sev = F.lit(None).cast("string")
    for k, v in _SEV_CASE.items():
        sev = F.when(F.col("event_type") == k, F.lit(v)).otherwise(sev)
    msg = F.concat(
        F.col("event_type"),
        F.lit(" "),
        F.col("props"),
        F.when(F.col("value") > 15.0, F.lit("é")).otherwise(F.lit("")),
    )
    f1 = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
        F.lit(" "),
        (F.col("user_id") % 32).cast("string"),
        F.lit(" "),
        sev,
        F.lit(" "),
        msg,
    )
    f2 = F.concat(F.date_format("ts", "yyMMdd HH:mm:ss"), F.lit(" "), sev, F.lit(" "), msg)
    text = (
        F.when(sev.isNull(), F.concat(F.lit("continuation "), F.col("props")))
        .when(F.col("event_id") % 2 == 0, f1)
        .otherwise(f2)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.concat(F.lit("conv-"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        text.alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col("ts"),
        F.col("user_id"),
    )


_SYNTH_ERROR_SQL = """
WITH turns AS (
  SELECT 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
         user_id, event_id, ts,
         CASE event_type WHEN 'error' THEN '[ERROR]' WHEN 'signup' THEN '[Warning]'
              WHEN 'purchase' THEN '[Note]' WHEN 'click' THEN '[note]' END AS sev_raw,
         CASE WHEN event_type = 'view' THEN 'continuation ' || props
              ELSE event_type || ' ' || props ||
                   CASE WHEN value > 15.0 THEN 'é' ELSE '' END END AS msg,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_epoch,
         (event_id % 2 = 0) AS is_f1
  FROM events
),
entries AS (
  SELECT conv_id, turn_idx, ts_epoch, sev_raw, msg, is_f1, user_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS BIGINT) AS entry_id,
         upper(replace(replace(sev_raw, '[', ''), ']', '')) AS severity,
         sev_raw || ' ' || substr(msg, 1, 20) AS short_message
  FROM turns WHERE sev_raw IS NOT NULL
),
gelfed AS (
  SELECT *,
         CASE severity WHEN 'ERROR' THEN '3' WHEN 'WARNING' THEN '4'
              WHEN 'NOTE' THEN '6' ELSE 'UNKNOWN' END AS gelf_level
  FROM entries
)
"""


def q_errorlog_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = synth_error_transcripts(spark, sf_dir)
    parsed = parse_error_log_lines(t)
    entries = assemble_error_entries(parsed, mode="strict")
    return entries.select(
        "conv_id",
        F.col("entry_id").cast("long").alias("entry_id"),
        F.col("ts_epoch").cast("long").alias("ts_epoch"),
        F.col("level_raw").alias("severity_raw"),
        "severity",
        F.col("thread_raw").cast("long").alias("thread_id"),
        "short_message",
        F.col("message").alias("text"),
    )


ORACLE_ERRORLOG_ENTRIES = (
    _SYNTH_ERROR_SQL
    + """
SELECT conv_id, entry_id, ts_epoch, sev_raw AS severity_raw, severity,
       CAST(CASE WHEN is_f1 THEN user_id % 32 END AS BIGINT) AS thread_id,
       short_message, msg AS text
FROM gelfed
"""
)


def q_errorlog_intended(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = synth_error_transcripts(spark, sf_dir)
    parsed = parse_error_log_lines(t)
    entries = assemble_error_entries(parsed, mode="intended")
    return entries.select(
        "conv_id",
        F.col("entry_id").cast("long").alias("entry_id"),
        F.col("message").alias("text"),
    )


ORACLE_ERRORLOG_INTENDED = """
WITH turns AS (
  SELECT 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
         CASE event_type WHEN 'error' THEN '[ERROR]' WHEN 'signup' THEN '[Warning]'
              WHEN 'purchase' THEN '[Note]' WHEN 'click' THEN '[note]' END AS sev_raw,
         CASE WHEN event_type = 'view' THEN 'continuation ' || props
              ELSE event_type || ' ' || props ||
                   CASE WHEN value > 15.0 THEN 'é' ELSE '' END END AS msg
  FROM events
),
islands AS (
  SELECT *,
         SUM(CASE WHEN sev_raw IS NOT NULL THEN 1 ELSE 0 END)
             OVER (PARTITION BY conv_id ORDER BY turn_idx
                   ROWS UNBOUNDED PRECEDING) AS entry_id
  FROM turns
)
SELECT conv_id, CAST(entry_id AS BIGINT) AS entry_id,
       string_agg(msg, chr(10) ORDER BY turn_idx) AS text
FROM islands WHERE entry_id > 0
GROUP BY conv_id, entry_id
"""


def _gelf_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = synth_error_transcripts(spark, sf_dir)
    parsed = parse_error_log_lines(t)
    entries = assemble_error_entries(parsed, mode="strict")
    entries = with_gelf_level(entries)
    return entries.withColumn(
        "gelf_json",
        gelf_json_compat(
            F.lit(HOST),
            F.col("short_message"),
            F.col("ts_epoch"),
            F.col("gelf_level"),
            F.col("message"),
        ),
    )


def q_errorlog_gelf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _gelf_df(spark, sf_dir).select(
        "conv_id",
        F.col("entry_id").cast("long").alias("entry_id"),
        "gelf_level",
        "gelf_json",
    )


_GELF_EXPR = (
    """'{"version":"1.1","host":"sparkhost","short_message":"'
  || replace(short_message, '"', '\\"')
  || '","timestamp":"' || CAST(ts_epoch AS VARCHAR)
  || '","level":"' || gelf_level
  || '","_text":"' || replace(msg, '"', '\\"') || '"}'"""
)

ORACLE_ERRORLOG_GELF = (
    _SYNTH_ERROR_SQL
    + f"""
SELECT conv_id, entry_id, gelf_level, {_GELF_EXPR} AS gelf_json
FROM gelfed
"""
)


def q_routing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mariadb_to_graylog_spark.operators.routing import route

    routed = route(_gelf_df(spark, sf_dir))
    return routed.groupBy("sink").agg(F.count(F.lit(1)).cast("long").alias("n"))


ORACLE_ROUTING_COUNTS = (
    _SYNTH_ERROR_SQL
    + f"""
SELECT CASE WHEN NOT regexp_matches({_GELF_EXPR}, '[^\\x00-\\x7F]')
            THEN 'udp' ELSE 'http' END AS sink,
       CAST(COUNT(*) AS BIGINT) AS n
FROM gelfed GROUP BY 1
"""
)


def q_severity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = synth_error_transcripts(spark, sf_dir)
    parsed = parse_error_log_lines(t)
    # the entry-assembly window doubles as a codegen barrier: collapsing the
    # full parse expression tree into the aggregate stage overflows janino's
    # 64KB method limit (observed) and falls back to interpreted eval
    entries = assemble_error_entries(parsed, mode="strict")
    user_id = F.split(F.col("conv_id"), "-").getItem(1).cast("long")
    source = F.when(user_id % 3 == 0, F.lit("srcA")).otherwise(F.lit("srcB"))
    return entries.groupBy(source.alias("source"), "severity").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


ORACLE_SEVERITY_HISTOGRAM = (
    _SYNTH_ERROR_SQL
    + """
SELECT CASE WHEN user_id % 3 = 0 THEN 'srcA' ELSE 'srcB' END AS source,
       severity, CAST(COUNT(*) AS BIGINT) AS n
FROM entries GROUP BY 1, 2
"""
)


def q_entry_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands on raw events: sessions start at 'error' events."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    df = ev.select(
        F.col("user_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_id"),
        F.col("props"),
        (F.col("event_type") == "error").alias("is_entry_start"),
    )
    ids = with_entry_ids(df, conv_col="user_id")
    return (
        ids.filter(F.col("entry_id") > 0)
        .groupBy("user_id", "entry_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.min("event_id").cast("long").alias("first_event_id"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("turn_idx").alias("i"), F.col("props").alias("p")))
                    ),
                    lambda s: s["p"],
                ),
                "\n",
            ).alias("texts"),
        )
    )


ORACLE_ENTRY_ISLANDS = """
WITH t AS (
  SELECT user_id, event_id, props,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
         (event_type = 'error') AS is_start
  FROM events
),
i AS (
  SELECT *, SUM(CASE WHEN is_start THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY turn_idx ROWS UNBOUNDED PRECEDING) AS entry_id
  FROM t
)
SELECT user_id, CAST(entry_id AS BIGINT) AS entry_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(MIN(event_id) AS BIGINT) AS first_event_id,
       string_agg(props, chr(10) ORDER BY turn_idx) AS texts
FROM i WHERE entry_id > 0 GROUP BY user_id, entry_id
"""


# ---------------------------------------------------------------------------
# synthesized slow-log transcripts from `orders`
# ---------------------------------------------------------------------------


def synth_slow_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    conv = F.concat(F.lit("slow-"), (F.col("o_custkey") % 50).cast("string"))
    w = Window.partitionBy(F.col("o_custkey") % 50).orderBy("o_orderkey")
    rk = F.row_number().over(w) - 1
    od_epoch = F.unix_timestamp("o_orderdate")
    has_use = F.col("o_orderkey") % 3 == 0
    time_line = F.concat(
        F.lit("# Time: "), F.date_format("o_orderdate", "yyMMdd"), F.lit(" 12:00:00")
    )
    meta1 = F.format_string(
        "# Thread_id: %d  Schema: shop  QC_hit: %s",
        (F.col("o_orderkey") % 97 + 1).cast("long"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("Yes")).otherwise(F.lit("No")),
    )
    meta2 = F.format_string(
        "# Query_time: %.6f  Lock_time: 0.000100  Rows_sent: %d  Rows_examined: %d",
        (F.col("o_orderkey") % 400) / F.lit(100.0),
        (F.col("o_orderkey") % 50).cast("long"),
        (F.col("o_orderkey") % 10000).cast("long"),
    )
    set_line = F.concat(F.lit("SET timestamp="), od_epoch.cast("string"), F.lit(";"))
    # three SQL shapes so the fingerprint rules are all exercised end-to-end:
    # multi-row VALUES collapse (%7=0), ORDER BY ... ASC strip (%7=1),
    # IN-list collapse (the rest)
    sql_line = (
        F.when(
            F.col("o_orderkey") % 7 == 0,
            F.concat(
                F.lit("INSERT INTO audit (k, v) VALUES ("),
                F.col("o_orderkey").cast("string"),
                F.lit(", 'a'), ("),
                (F.col("o_orderkey") + 1).cast("string"),
                F.lit(", 'b');"),
            ),
        )
        .when(
            F.col("o_orderkey") % 7 == 1,
            F.concat(
                F.lit("SELECT * FROM orders WHERE o_custkey = "),
                F.col("o_custkey").cast("string"),
                F.lit(" ORDER BY o_orderdate ASC, o_orderkey DESC LIMIT 10;"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("SELECT * FROM orders WHERE o_orderkey = "),
                F.col("o_orderkey").cast("string"),
                F.lit(" AND o_orderpriority IN ('1-URGENT', '2-HIGH');"),
            )
        )
    )
    lines = F.when(
        has_use,
        F.array(time_line, meta1, meta2, F.lit("use shop;"), set_line, sql_line),
    ).otherwise(F.array(time_line, meta1, meta2, set_line, sql_line))
    exploded = o.select(
        conv.alias("conv_id"),
        rk.alias("_rk"),
        F.col("o_orderdate").alias("ts"),
        F.posexplode(lines).alias("_pos", "text"),
    )
    return exploded.select(
        "conv_id",
        (F.col("_rk") * 8 + F.col("_pos")).cast("int").alias("turn_idx"),
        F.lit("tool").alias("role"),
        "text",
        F.lit("bash").alias("tool"),
        "ts",
    )


def q_slowlog_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = synth_slow_transcripts(spark, sf_dir)
    entries = parse_slow_log(t)
    return entries.select(
        "conv_id",
        F.col("entry_id").cast("long").alias("entry_id"),
        "set_timestamp",
        "ts_epoch",
        "thread_id",
        F.col("schema").alias("db_schema"),
        F.col("query_cache_hit").alias("qc_hit"),
        "query_time",
        "lock_time",
        "rows_sent",
        "rows_examined",
        "query_text",
        "query_fingerprint",
    )


def _fingerprint_sql(expr: str) -> str:
    """The DuckDB twin of fingerprint_col, generated from the SAME rule
    table so engine and oracle can never drift."""
    from mariadb_to_graylog_spark.operators.fingerprint import FINGERPRINT_RULES

    s = f"lower({expr})"
    for pat, rep in FINGERPRINT_RULES:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        s = f"regexp_replace({s}, '{p}', '{r}', 'g')"
    return f"trim({s})"


# DuckDB twin computes expected outputs directly from the synthesis params,
# including the position-sensitive SET-timestamp quirk and the trailing drop.
ORACLE_SLOWLOG_ENTRIES = """
WITH o AS (
  SELECT 'slow-' || CAST(o_custkey % 50 AS VARCHAR) AS conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey % 50 ORDER BY o_orderkey) AS BIGINT) AS entry_id,
         COUNT(*) OVER (PARTITION BY o_custkey % 50) AS n_entries,
         o_orderkey,
         (o_orderkey % 3 = 0) AS has_use,
         CAST(epoch(o_orderdate) AS BIGINT) AS od_epoch,
         CAST(o_orderkey % 97 + 1 AS BIGINT) AS thread_id,
         CASE WHEN o_orderkey % 5 = 0 THEN 'Yes' ELSE 'No' END AS qc_hit,
         CAST(printf('%.6f', (o_orderkey % 400) / 100.0) AS DOUBLE) AS query_time,
         CAST(o_orderkey % 50 AS BIGINT) AS rows_sent,
         CAST(o_orderkey % 10000 AS BIGINT) AS rows_examined,
         CASE WHEN o_orderkey % 7 = 0 THEN
                'INSERT INTO audit (k, v) VALUES (' || CAST(o_orderkey AS VARCHAR)
                  || ', ''a''), (' || CAST(o_orderkey + 1 AS VARCHAR) || ', ''b'');'
              WHEN o_orderkey % 7 = 1 THEN
                'SELECT * FROM orders WHERE o_custkey = ' || CAST(o_custkey AS VARCHAR)
                  || ' ORDER BY o_orderdate ASC, o_orderkey DESC LIMIT 10;'
              ELSE
                'SELECT * FROM orders WHERE o_orderkey = ' || CAST(o_orderkey AS VARCHAR)
                  || ' AND o_orderpriority IN (''1-URGENT'', ''2-HIGH'');'
         END AS sql_line
  FROM orders
),
e AS (
  SELECT conv_id, entry_id,
         CASE WHEN has_use THEN od_epoch END AS set_timestamp,
         CASE WHEN has_use THEN od_epoch ELSE od_epoch + 43200 END AS ts_epoch,
         thread_id, 'shop' AS db_schema, qc_hit, query_time,
         CAST(0.0001 AS DOUBLE) AS lock_time, rows_sent, rows_examined,
         CASE WHEN has_use THEN sql_line
              ELSE 'SET timestamp=' || CAST(od_epoch AS VARCHAR) || ';' || chr(10) || sql_line
         END AS query_text
  FROM o WHERE entry_id < n_entries
),
fp AS (
  SELECT *, {FP0} AS fp0
  FROM e
)
SELECT conv_id, entry_id, set_timestamp, ts_epoch, thread_id, db_schema,
       qc_hit, query_time, lock_time, rows_sent, rows_examined, query_text,
       upper(regexp_extract(fp0, '^([^ ]*)', 1))
         || substr(fp0, length(regexp_extract(fp0, '^([^ ]*)', 1)) + 1) AS query_fingerprint
FROM fp
""".replace("{FP0}", _fingerprint_sql("query_text"))


# ---------------------------------------------------------------------------
# SRC3/SRC4, SRC2, A1, general SQL capability
# ---------------------------------------------------------------------------


def q_offset_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.orderBy("event_id")
        .offset(1234)
        .limit(567)
        .select("event_id", "event_type", "value")
    )


ORACLE_OFFSET_LIMIT = """
SELECT event_id, event_type, value FROM events
ORDER BY event_id LIMIT 567 OFFSET 1234
"""


def q_resume_hwm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    thr = ev.agg(F.floor(F.max("event_id") * 0.4).cast("long").alias("_thr"))
    half1 = ev.crossJoin(F.broadcast(thr)).filter(F.col("event_id") <= F.col("_thr"))
    hwm = half1.groupBy("user_id").agg(F.max("event_id").alias("_hwm"))
    resumed = (
        ev.join(F.broadcast(hwm), "user_id", "left")
        .filter(F.col("event_id") > F.coalesce(F.col("_hwm"), F.lit(-1)))
    )
    return resumed.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_resumed"),
        F.min("event_id").cast("long").alias("min_event_id"),
    )


ORACLE_RESUME_HWM = """
WITH thr AS (SELECT CAST(floor(max(event_id) * 0.4) AS BIGINT) AS t FROM events),
hwm AS (
  SELECT user_id, max(event_id) AS h FROM events, thr WHERE event_id <= t GROUP BY user_id
)
SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_resumed,
       CAST(MIN(event_id) AS BIGINT) AS min_event_id
FROM events e LEFT JOIN hwm USING (user_id)
WHERE e.event_id > COALESCE(h, -1)
GROUP BY e.user_id
"""


def q_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/stream_pipeline.windowed_severity_counts:
    the same tumbling-window groupBy expression, checkable against a
    date_trunc oracle (epoch-aligned 1h windows == date_trunc('hour'))."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            # events.ts is TIMESTAMP_NTZ; the session tz is pinned UTC, so
            # the cast reads the naive value as UTC like DuckDB's epoch()
            F.unix_seconds(F.col("w.start").cast("timestamp")).alias("window_start"),
            "event_type",
            "n",
        )
    )


ORACLE_WINDOWED_COUNTS = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
       event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
"""


def q_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.agg(
        F.count(F.lit(1)).cast("long").alias("rows_total"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("n_error_events"),
        F.sum((F.col("value") > 15.0).cast("long")).alias("n_nonascii"),
    )


ORACLE_COUNTERS = """
SELECT CAST(COUNT(*) AS BIGINT) AS rows_total,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error_events,
       CAST(SUM(CASE WHEN value > 15.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonascii
FROM events
"""


def q_tpch_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    flt = li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (
        flt.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.round(
                F.sum(dec("l_discount")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_disc"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


ORACLE_TPCH_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       round(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    joined = o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey, "inner"
    ).join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
    )


ORACLE_JOIN_ENRICH = """
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (6h inactivity threshold) over the event
    stream: one row per (user, session) with event count, wall duration,
    error count, start epoch.  One hash exchange on user_id feeds both
    the lag() boundary pass and the per-session aggregate."""
    from mariadb_to_graylog_spark.operators.sessions import session_stats

    return session_stats(_events(spark, sf_dir), gap_sec=21600)


ORACLE_SESSION_STATS = """
WITH e AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
),
b AS (
  SELECT *, CASE WHEN lag(sec) OVER w IS NULL
                   OR sec - lag(sec) OVER w > 21600 THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM b
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(session_idx AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(sec) - MIN(sec) AS BIGINT) AS duration_sec,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors,
       CAST(MIN(sec) AS BIGINT) AS start_epoch
FROM s GROUP BY user_id, session_idx
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (funnel / first-order Markov
    table): (prev_type, type) counts + exact integer-ppm share within
    prev_type; stream starts contribute a synthetic '_start' state."""
    from mariadb_to_graylog_spark.operators.sessions import event_transitions

    return event_transitions(_events(spark, sf_dir))


ORACLE_EVENT_TRANSITIONS = """
WITH p AS (
  SELECT COALESCE(lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id),
                  '_start') AS prev_type,
         event_type
  FROM events
),
c AS (
  SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM p GROUP BY prev_type, event_type
)
SELECT prev_type, event_type, n,
       CAST(floor(n * 1000000.0 / SUM(n) OVER (PARTITION BY prev_type))
            AS BIGINT) AS share_ppm
FROM c
"""


LOG_QUERIES = {
    "errorlog_entries": q_errorlog_entries,
    "errorlog_intended": q_errorlog_intended,
    "errorlog_gelf": q_errorlog_gelf,
    "routing_counts": q_routing_counts,
    "severity_histogram": q_severity_histogram,
    "entry_islands": q_entry_islands,
    "slowlog_entries": q_slowlog_entries,
    "offset_limit": q_offset_limit,
    "resume_hwm": q_resume_hwm,
    "windowed_counts": q_windowed_counts,
    "counters": q_counters,
    "tpch_pricing": q_tpch_pricing,
    "join_enrich": q_join_enrich,
    "session_stats": q_session_stats,
    "event_transitions": q_event_transitions,
}

LOG_ORACLES = {
    "errorlog_entries": ORACLE_ERRORLOG_ENTRIES,
    "errorlog_intended": ORACLE_ERRORLOG_INTENDED,
    "errorlog_gelf": ORACLE_ERRORLOG_GELF,
    "routing_counts": ORACLE_ROUTING_COUNTS,
    "severity_histogram": ORACLE_SEVERITY_HISTOGRAM,
    "entry_islands": ORACLE_ENTRY_ISLANDS,
    "slowlog_entries": ORACLE_SLOWLOG_ENTRIES,
    "offset_limit": ORACLE_OFFSET_LIMIT,
    "resume_hwm": ORACLE_RESUME_HWM,
    "windowed_counts": ORACLE_WINDOWED_COUNTS,
    "counters": ORACLE_COUNTERS,
    "tpch_pricing": ORACLE_TPCH_PRICING,
    "join_enrich": ORACLE_JOIN_ENRICH,
    "session_stats": ORACLE_SESSION_STATS,
    "event_transitions": ORACLE_EVENT_TRANSITIONS,
}


# ---------------------------------------------------------------------------
# training-data operators: dedup / similarity / text analysis / multimodal
# (documents + embeddings tables; duplicates synthesized deterministically)
# ---------------------------------------------------------------------------

from mariadb_to_graylog_spark.operators import dedup as dd  # noqa: E402
from mariadb_to_graylog_spark.operators import mixing as mx  # noqa: E402
from mariadb_to_graylog_spark.operators import paragraphs as pg  # noqa: E402
from mariadb_to_graylog_spark.operators import similarity as sim  # noqa: E402
from mariadb_to_graylog_spark.operators import textstats as tx  # noqa: E402


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the driver tables arrive as ONE parquet row group -> one scan task no
    # matter how small maxPartitionBytes is.  The doc-level operators are
    # CPU-bound per row (md5 per shingle, per-bit simhash filters), so
    # spread the rows across the executor cores first: shuffling ~1 MB of
    # text costs microseconds, leaving the map work serial costs seconds.
    # At real scale inputs arrive in thousands of splits and the scan
    # parallelizes natively -- this is the small-file analogue of
    # spark.sql.files.maxPartitionBytes tuning, not part of the plan shape.
    return spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same single-row-group consideration as _documents (SRP dots and
    # cosine folds are CPU-bound per row)
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def docs_with_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + exact copies of every 5th doc under new ids."""
    d = _documents(spark, sf_dir)
    dups = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    return d.unionByName(dups)


_SQL_EXACT_DUPS = """
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 100000, text, lang, source, n_chars
  FROM documents WHERE doc_id % 5 = 0
"""


def docs_with_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + near-copies (' xyz' appended) of every 5th doc."""
    d = _documents(spark, sf_dir)
    dups = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xyz")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return d.unionByName(dups)


_SQL_NEAR_DUPS = """
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' xyz', lang, source, n_chars
  FROM documents WHERE doc_id % 5 = 0
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs_with_exact_dups(spark, sf_dir)
    _, groups = dd.exact_dedup(d)
    return groups.select(
        "text_hash",
        F.col("n").cast("long").alias("n"),
        F.col("keep_id").cast("long").alias("keep_id"),
    )


ORACLE_DEDUP_EXACT = f"""
WITH d AS ({_SQL_EXACT_DUPS})
SELECT md5(text) AS text_hash, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id
FROM d GROUP BY md5(text)
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs_with_near_dups(spark, sf_dir)
    pairs = dd.ngram_jaccard_pairs(d, block_col="lang", n=3, threshold=0.5)
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.round("jaccard", 6).alias("jaccard"),
    )


ORACLE_DEDUP_NGRAM_JACCARD = f"""
WITH d AS ({_SQL_NEAR_DUPS}),
g AS (
  SELECT doc_id AS id, lang AS blk,
         list_distinct(list_transform(
           range(1, greatest(length(text) - 2, 1) + 1),
           i -> substr(text, CAST(i AS INT), 3))) AS grams
  FROM d
),
p AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) AS j
  FROM g a JOIN g b ON a.blk = b.blk AND a.id < b.id
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       round(j, 6) AS jaccard
FROM p WHERE j >= 0.5
"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 8 rows/band: similarity knee ~0.84, so the word-salad corpus's
    # moderately-similar doc mass no longer floods the buckets (the 4-row
    # variant produced 280+-doc degenerate buckets -> B^2 candidates)
    d = docs_with_near_dups(spark, sf_dir)
    pairs = dd.minhash_lsh_pairs(d, shingle_n=4, bands=4, rows_per_band=8)
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
    )


def _minhash_cand_ctes(
    bands: int,
    rows_per_band: int,
    shingle_n: int,
    source_sql: str | None = None,
) -> str:
    """Shared CTE chain d -> hashes -> sigs -> buckets -> cand (DISTINCT
    candidate id pairs), mirroring minhash_lsh_pairs bucket membership.
    ``source_sql`` overrides the unit table (must yield doc_id, text);
    default is the near-dup document corpus."""
    params = dd._hash_params(bands * rows_per_band)
    sig_exprs = ",\n         ".join(
        f"list_min(list_transform(hashes, h -> (h * {a} + {b}) % {dd.MERSENNE31})) AS mh_{j}"
        for j, (a, b) in enumerate(params)
    )
    band_selects = "\n  UNION ALL\n".join(
        "  SELECT id, {b} AS band, ".format(b=b)
        + " || '-' || ".join(
            f"CAST(mh_{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
        )
        + " AS band_sig FROM sigs"
        for b in range(bands)
    )
    return f"""
WITH d AS ({source_sql if source_sql is not None else _SQL_NEAR_DUPS}),
h AS (
  SELECT doc_id AS id,
         list_transform(
           list_distinct(list_transform(
             range(1, greatest(length(text) - {shingle_n - 1}, 1) + 1),
             i -> substr(text, CAST(i AS INT), {shingle_n}))),
           s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)) AS hashes
  FROM d
),
sigs AS (
  SELECT id,
         {sig_exprs}
  FROM h
),
buckets AS (
{band_selects}
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.id < b.id
)"""


def _minhash_oracle_sql(bands: int = 4, rows_per_band: int = 8, shingle_n: int = 4) -> str:
    return (
        _minhash_cand_ctes(bands, rows_per_band, shingle_n)
        + """
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b FROM cand
"""
    )


ORACLE_DEDUP_MINHASH_LSH = _minhash_oracle_sql()


def q_dedup_lsh_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-only scoring twin of dedup_lsh_verified: MinHash collision
    fraction instead of exact Jaccard -- no pass over shingle arrays
    after banding."""
    d = docs_with_near_dups(spark, sf_dir)
    return dd.minhash_jaccard_estimate(
        d, shingle_n=4, bands=4, rows_per_band=8, threshold=0.5
    )


def _minhash_estimate_oracle_sql(
    bands: int = 4, rows_per_band: int = 8, shingle_n: int = 4,
    threshold: float = 0.5,
) -> str:
    k = bands * rows_per_band
    matches = " + ".join(
        f"CASE WHEN a.mh_{j} = b.mh_{j} THEN 1 ELSE 0 END" for j in range(k)
    )
    return (
        _minhash_cand_ctes(bands, rows_per_band, shingle_n)
        + f"""
SELECT CAST(c.id_a AS BIGINT) AS id_a, CAST(c.id_b AS BIGINT) AS id_b,
       round(({matches}) / {k}.0, 6) AS est_jaccard
FROM cand c JOIN sigs a ON a.id = c.id_a JOIN sigs b ON b.id = c.id_b
WHERE round(({matches}) / {k}.0, 6) >= {threshold}
"""
    )


ORACLE_DEDUP_LSH_ESTIMATE = _minhash_estimate_oracle_sql()


def q_dedup_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The default scale-safe near-dup path: LSH candidates -> exact 3-gram
    Jaccard verified on candidates only (no block-quadratic join)."""
    d = docs_with_near_dups(spark, sf_dir)
    pairs = dd.lsh_jaccard_verified(
        d, shingle_n=4, bands=4, rows_per_band=8, n=3, threshold=0.5
    )
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def _lsh_verified_pairs_ctes(
    bands: int = 4, rows_per_band: int = 8, shingle_n: int = 4,
    n: int = 3, source_sql: str | None = None,
) -> str:
    """cand chain + exact-Jaccard verification: ends with CTE ``vp``
    (id_a, id_b, j) -- the lsh_jaccard_verified twin over any unit
    table."""
    return (
        _minhash_cand_ctes(bands, rows_per_band, shingle_n, source_sql)
        + f""",
g AS (
  SELECT doc_id AS id,
         list_distinct(list_transform(
           range(1, greatest(length(text) - {n - 1}, 1) + 1),
           i -> substr(text, CAST(i AS INT), {n}))) AS grams
  FROM d
),
vp AS (
  SELECT cand.id_a, cand.id_b,
         CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(ga.grams, gb.grams))) AS DOUBLE) AS j
  FROM cand JOIN g ga ON ga.id = cand.id_a JOIN g gb ON gb.id = cand.id_b
)"""
    )


def _lsh_verified_oracle_sql(
    bands: int = 4, rows_per_band: int = 8, shingle_n: int = 4,
    n: int = 3, threshold: float = 0.5,
) -> str:
    return (
        _lsh_verified_pairs_ctes(bands, rows_per_band, shingle_n, n)
        + f"""
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       round(j, 6) AS jaccard
FROM vp WHERE j >= {threshold}
"""
    )


ORACLE_DEDUP_LSH_VERIFIED = _lsh_verified_oracle_sql()


# Cross-script plant map: Latin chars swapped for Cyrillic homoglyphs
# (a/e/o) and diacritic variants (u/i/n/s/c) -- each target folds back to
# its source under textstats._FOLD_PAIRS, so the planted copy is a
# near-dup ONLY through the confusable fold.
_XLING_FROM = "aeouinsc"
_XLING_TO = "аеоüíñšç"


def docs_with_crosslingual_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + confusable-substituted copies of every 9th doc (+' xyz'
    so the pair is near, not exact, after folding): visually identical
    text sharing almost no byte-level n-grams with its source -- the
    homoglyph dedup-evasion shape."""
    d = _documents(spark, sf_dir)
    var = d.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat(
            F.translate(F.col("text"), _XLING_FROM, _XLING_TO), F.lit(" xyz")
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return d.unionByName(var)


_SQL_XLING_DUPS = f"""
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 300000,
         translate(text, '{_XLING_FROM}', '{_XLING_TO}') || ' xyz',
         lang, source, n_chars
  FROM documents WHERE doc_id % 9 = 0
"""


def q_crosslingual_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-script near-dedup: every planted homoglyph/diacritic copy
    must pair with its source under the confusable fold; the byte-level
    LSH path scores these pairs near zero (asserted in tests)."""
    d = docs_with_crosslingual_dups(spark, sf_dir)
    pairs = dd.crosslingual_near_dup(
        d, shingle_n=4, bands=4, rows_per_band=8, n=3, threshold=0.5
    )
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.round("jaccard", 6).alias("jaccard"),
    )


ORACLE_CROSSLINGUAL_NEAR_DUP = (
    _lsh_verified_pairs_ctes(
        4,
        8,
        4,
        3,
        source_sql=(
            "SELECT doc_id, "
            + tx.sql_fold_confusables("text")
            + f" AS text FROM ({_SQL_XLING_DUPS})"
        ),
    )
    + """
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       round(j, 6) AS jaccard
FROM vp WHERE j >= 0.5
"""
)


def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dedup: LSH candidates -> exact-Jaccard VERIFY ->
    connected components -> every doc labeled with its group (keep-one =
    doc_id == group_id).

    Components are built over VERIFIED pairs, not raw LSH candidates: a
    single false-positive candidate edge would transitively chain two
    unrelated dup-clusters, and keep-one would then delete genuinely
    distinct documents (r2 verdict #1)."""
    d = docs_with_near_dups(spark, sf_dir)
    pairs = dd.lsh_jaccard_verified(
        d, shingle_n=4, bands=4, rows_per_band=8, n=3, threshold=0.5
    )
    groups = dd.near_dedup_groups(d, pairs)
    return groups.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("group_id").cast("long").alias("group_id"),
    )


# ground truth: LSH candidates -> exact 3-gram Jaccard verification ->
# recursive-CTE reachability over VERIFIED edges -> MIN reachable id per
# node.  UNION (not UNION ALL) dedups states, so the recursion terminates.
# Kept as a CTE block ending in `comp` so keep-best variants can build on
# the identical component labels.
_DEDUP_GROUPS_CTES = (
    _minhash_cand_ctes(4, 8, 4)
    + """,
g AS (
  SELECT doc_id AS id,
         list_distinct(list_transform(
           range(1, greatest(length(text) - 2, 1) + 1),
           i -> substr(text, CAST(i AS INT), 3))) AS grams
  FROM d
),
vp AS (
  SELECT cand.id_a, cand.id_b
  FROM cand JOIN g ga ON ga.id = cand.id_a JOIN g gb ON gb.id = cand.id_b
  WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
          / CAST(len(list_distinct(list_concat(ga.grams, gb.grams))) AS DOUBLE)
        >= 0.5
),
reach(id, grp) AS (
  SELECT doc_id, doc_id FROM d
  UNION
  SELECT CASE WHEN r.id = c.id_a THEN c.id_b ELSE c.id_a END, r.grp
  FROM reach r JOIN vp c ON r.id = c.id_a OR r.id = c.id_b
),
comp AS (
  SELECT CAST(id AS BIGINT) AS doc_id, CAST(MIN(grp) AS BIGINT) AS group_id
  FROM reach GROUP BY id
)"""
).replace("WITH d AS", "WITH RECURSIVE d AS")

ORACLE_DEDUP_GROUPS = (
    _DEDUP_GROUPS_CTES + "\nSELECT doc_id, group_id FROM comp"
)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir)
    return dd.simhash(d, bits=32).select(
        F.col("id").cast("long").alias("id"), F.col("simhash").cast("long").alias("simhash")
    )


def _simhash_oracle_sql(bits: int = 32) -> str:
    terms = "\n       + ".join(
        f"CASE WHEN 2 * len(list_filter(hashes, h -> (h & {1 << i}) != 0)) > len(hashes) THEN {1 << i} ELSE 0 END"
        for i in range(bits)
    )
    return f"""
WITH h AS (
  SELECT doc_id AS id,
         list_transform(regexp_extract_all(lower(text), '([a-z0-9]+)', 1),
                        t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT)) AS hashes
  FROM documents
)
SELECT CAST(id AS BIGINT) AS id,
       CAST({terms} AS BIGINT) AS simhash
FROM h
"""


ORACLE_DEDUP_SIMHASH = _simhash_oracle_sql()


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs_with_near_dups(spark, sf_dir)
    pairs = dd.simhash_pairs(d, block_col="lang", bits=32, max_distance=6)
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("long").alias("hamming"),
    )


def _simhash_pairs_oracle_sql(bits: int = 32, max_distance: int = 6) -> str:
    """Ground-truth ALL-PAIRS SimHash distances within the lang block.
    Serves double duty: oracle for the all-pairs verifier (32 bits, d<=6)
    AND for the banded operator (60 bits, d<=3) -- equality of the banded
    output against this proves the pigeonhole candidates are complete."""
    hexlen = 8 if bits <= 32 else 15
    terms = "\n       + ".join(
        f"CASE WHEN 2 * len(list_filter(hashes, h -> (h & {1 << i}) != 0)) > len(hashes) THEN {1 << i} ELSE 0 END"
        for i in range(bits)
    )
    return f"""
WITH d AS ({_SQL_NEAR_DUPS}),
h AS (
  SELECT doc_id AS id, lang AS blk,
         list_transform(regexp_extract_all(lower(text), '([a-z0-9]+)', 1),
                        t -> CAST('0x' || substr(md5(t), 1, {hexlen}) AS BIGINT)) AS hashes
  FROM d
),
s AS (
  SELECT id, blk, CAST({terms} AS BIGINT) AS sh FROM h
)
SELECT CAST(a.id AS BIGINT) AS id_a, CAST(b.id AS BIGINT) AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM s a JOIN s b ON a.blk = b.blk AND a.id < b.id
WHERE bit_count(xor(a.sh, b.sh)) <= {max_distance}
"""


ORACLE_SIMHASH_PAIRS = _simhash_pairs_oracle_sql()


def q_simhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-ball pigeonhole SimHash pairs (60 bits, 4 bands x 15): the
    scale-safe default.  The oracle is the ALL-PAIRS ground truth, so a
    hash match certifies the banded candidates are complete."""
    d = docs_with_near_dups(spark, sf_dir)
    pairs = dd.simhash_pairs_banded(d, block_col="lang", bits=60, max_distance=3)
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("long").alias("hamming"),
    )


ORACLE_SIMHASH_BANDED = _simhash_pairs_oracle_sql(bits=60, max_distance=3)


# --- similarity search ------------------------------------------------------

_DOT = (
    "list_reduce(list_transform(range(1, len({a}) + 1), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)"
)


def _cos_sql(a: str, b: str, digits: int = 6) -> str:
    return (
        f"round({_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)})), {digits})"
    )


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _embeddings(spark, sf_dir)
    return sim.knn_bruteforce(e, F.col("vec_id") < 10, k=5)


ORACLE_KNN_BRUTEFORCE = f"""
WITH p AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_cos_sql("q.embedding", "c.embedding")} AS cos_sim
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rk
  FROM p
)
SELECT query_id, CAST(rk AS BIGINT) AS rank, neighbor_id, cos_sim
FROM r WHERE rk <= 5
"""


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _embeddings(spark, sf_dir)
    return sim.knn_ivf(e, F.col("vec_id") < 10, F.col("vec_id") < 8, k=3)


ORACLE_KNN_IVF = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8
),
scored AS (
  SELECT e.vec_id, e.embedding, cent.centroid_id,
         {_DOT.format(a="e.embedding", b="cent.c_vec")} /
           (sqrt({_DOT.format(a="e.embedding", b="e.embedding")}) *
            sqrt({_DOT.format(a="cent.c_vec", b="cent.c_vec")})) AS cs
  FROM embeddings e, cent
),
assigned AS (
  SELECT vec_id, embedding, centroid_id AS bucket
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY cs DESC, centroid_id) AS rn
        FROM scored)
  WHERE rn = 1
),
p AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_cos_sql("q.embedding", "c.embedding")} AS cos_sim
  FROM assigned q JOIN assigned c ON q.bucket = c.bucket
  WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rk
  FROM p
)
SELECT query_id, CAST(rk AS BIGINT) AS rank, neighbor_id, cos_sim
FROM r WHERE rk <= 3
"""


def q_knn_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 16 centroids x 3 Lloyd iterations x nprobe=2: recall@3 = 0.93 vs
    # brute force at sf0.1 (0.97 at nprobe=4; curve in bench.py) -- the
    # 8x2 config plateaued at 0.87.  Affordable because the argmax rides
    # two flat literals (see similarity._centroid_cos_array); the struct-
    # per-centroid plan spent 5x the wall in Catalyst analysis alone.
    e = _embeddings(spark, sf_dir)
    return sim.knn_ivf_trained(
        e, F.col("vec_id") < 10, n_centroids=16, iters=3, dim=64, k=3, nprobe=2
    )


def _raw_cos_sql(a: str, b: str) -> str:
    """Unrounded cosine (the assignment/ranking expression; rounding only
    ever happens at output or threshold time)."""
    return (
        f"{_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)}))"
    )


def _kmeans_train_ctes(
    n_centroids: int = 8, iters: int = 2, dim: int = 64,
    round_digits: int = 6,
    source_sql: str = "SELECT vec_id, embedding FROM embeddings",
    prefix: str = "",
    leading_with: bool = True,
) -> str:
    """Unrolled Lloyd iterations: one assignment + one rounded-mean CTE
    per iteration, replicating train_kmeans bit-for-bit (same seed rule,
    same cosine fold, same per-component rounding).  Ends with the final
    per-vector assignment CTE ``{prefix}fin`` (vec_id, embedding, bucket)
    and final centroids ``{prefix}c{iters}``; oracles for every
    trained-k-means consumer (IVF probe, semantic dedup, PQ subspaces)
    build on this shared block so the cluster labels cannot drift between
    them.  ``prefix`` namespaces the CTEs so several independent trainers
    (one per PQ subspace) compose in one statement; pass
    ``leading_with=False`` for every block after the first."""

    def assign(src_cents: str, name: str) -> str:
        return f"""
{name} AS (
  SELECT vec_id, embedding, cid AS bucket
  FROM (SELECT e.vec_id, e.embedding, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_raw_cos_sql("e.embedding", "c.cv")} DESC, c.cid) AS rn
        FROM {prefix}src e, {src_cents} c)
  WHERE rn = 1
)"""

    kw = "WITH " if leading_with else ", "
    parts = [
        f"""{kw}{prefix}src AS ({source_sql}), {prefix}c0 AS (
  SELECT vec_id AS cid, embedding AS cv FROM {prefix}src ORDER BY vec_id LIMIT {n_centroids}
)"""
    ]
    for i in range(iters):
        avg_list = ", ".join(
            f"round(avg(embedding[{j + 1}]), {round_digits})" for j in range(dim)
        )
        parts.append("," + assign(f"{prefix}c{i}", f"{prefix}a{i}"))
        parts.append(
            f""",
{prefix}c{i + 1} AS (
  SELECT bucket AS cid, list_value({avg_list}) AS cv FROM {prefix}a{i} GROUP BY bucket
)"""
        )
    parts.append("," + assign(f"{prefix}c{iters}", f"{prefix}fin"))
    return "".join(parts)


def _kmeans_oracle_sql(
    n_centroids: int = 8, iters: int = 2, dim: int = 64, k: int = 3,
    nprobe: int = 2, round_digits: int = 6,
) -> str:
    cos = _raw_cos_sql
    parts = [_kmeans_train_ctes(n_centroids, iters, dim, round_digits)]
    parts.append(
        f""",
qprobe AS (
  SELECT vec_id, embedding, cid AS bucket
  FROM (SELECT e.vec_id, e.embedding, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos("e.embedding", "c.cv")} DESC, c.cid) AS rn
        FROM src e, c{iters} c
        WHERE e.vec_id < 10)
  WHERE rn <= {nprobe}
),
p AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_cos_sql("q.embedding", "c.embedding")} AS cos_sim
  FROM qprobe q JOIN fin c ON q.bucket = c.bucket
  WHERE c.vec_id != q.vec_id
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rk
  FROM p
)
SELECT query_id, CAST(rk AS BIGINT) AS rank, neighbor_id, cos_sim
FROM r WHERE rk <= {k}
"""
    )
    return "".join(parts)


ORACLE_KNN_IVF_TRAINED = _kmeans_oracle_sql(n_centroids=16, iters=3, nprobe=2)


_SQL_EMBED_DUPS = (
    "SELECT vec_id, embedding FROM embeddings "
    "UNION ALL SELECT vec_id + 100000, embedding FROM embeddings "
    "WHERE vec_id % 10 = 0"
)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embedding corpus + planted exact re-encodes:
    k-means clusters, within-cluster epsilon-ball pruning (keep lowest
    id).  Every planted copy must come back keep=false."""
    e = _embeddings(spark, sf_dir)
    dups = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    both = e.select("vec_id", "embedding").unionByName(dups)
    return sim.semantic_dedup(both, k=8, iters=2, dim=64, threshold=0.95)


def _semantic_dedup_oracle_sql(
    n_centroids: int = 8, iters: int = 2, dim: int = 64,
    threshold: float = 0.95, round_digits: int = 6,
    source_sql: str = "SELECT vec_id, embedding FROM embeddings",
) -> str:
    """Same trained cluster labels as the IVF oracle (shared CTE block),
    then the within-cluster lower-id-neighbor rule on the same rounded
    cosine the engine thresholds on."""
    return (
        _kmeans_train_ctes(n_centroids, iters, dim, round_digits, source_sql)
        + f""",
np AS (
  SELECT DISTINCT b.vec_id AS drop_id
  FROM fin a JOIN fin b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE round({_raw_cos_sql("a.embedding", "b.embedding")}, {round_digits})
          >= {threshold}
)
SELECT CAST(f.vec_id AS BIGINT) AS vec_id, CAST(f.bucket AS BIGINT) AS bucket,
       (np.drop_id IS NULL) AS keep
FROM fin f LEFT JOIN np ON np.drop_id = f.vec_id
"""
    )


ORACLE_SEMANTIC_DEDUP = _semantic_dedup_oracle_sql(
    n_centroids=8, iters=2, threshold=0.95, source_sql=_SQL_EMBED_DUPS
)


def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN, two-stage: 4 subspaces x 8 sub-centroids
    compress each 64-dim vector to a 4-int code; ADC (query vs
    reconstruction, scored once per DISTINCT code tuple) shortlists 50,
    exact cosine re-ranks the shortlist to top-3.  recall@3 = 0.70 at
    sf0.01 vs brute force (0.33/0.53 at R=10/25 -- raw ADC alone is 0.2;
    curve in bench extras), touching 50/N of the corpus at full precision."""
    e = _embeddings(spark, sf_dir)
    books = sim.train_pq(e, m=4, ksub=8, iters=2, dim=64)
    return sim.pq_adc_topk(
        e, F.col("vec_id") < 10, books, dim=64, k=3, rerank=50
    )


def _pq_oracle_sql(
    m: int = 4, ksub: int = 8, iters: int = 2, dim: int = 64, k: int = 3,
    round_digits: int = 6, rerank: int = 0,
) -> str:
    """m independent prefixed trainer blocks (identical to the Spark
    ``train_pq`` subspace slices), reconstruction by codebook join, ADC
    ranking, and (with ``rerank``) the exact-cosine second stage over the
    shortlist -- the same rounded-cosine orderings the engine uses."""
    dsub = dim // m
    blocks = [
        _kmeans_train_ctes(
            ksub, iters, dsub, round_digits,
            source_sql=(
                f"SELECT vec_id, embedding[{j * dsub + 1}:{(j + 1) * dsub}]"
                " AS embedding FROM embeddings"
            ),
            prefix=f"p{j}", leading_with=(j == 0),
        )
        for j in range(m)
    ]
    fin_joins = "".join(
        f"\n  JOIN p{j}fin f{j} ON f{j}.vec_id = f0.vec_id" for j in range(1, m)
    )
    cb_joins = "".join(
        f"\n  JOIN p{j}c{iters} cb{j} ON cb{j}.cid = f{j}.bucket"
        for j in range(m)
    )
    recon = "cb0.cv"
    for j in range(1, m):
        recon = f"list_concat({recon}, cb{j}.cv)"
    head = "".join(blocks) + f""",
dec AS (
  SELECT f0.vec_id, {recon} AS recon
  FROM p0fin f0{fin_joins}{cb_joins}
),
q AS (
  SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10
),
scored AS (
  SELECT q.query_id, d.vec_id AS neighbor_id,
         {_cos_sql("q.q_vec", "d.recon", round_digits)} AS cos_sim
  FROM dec d, q WHERE d.vec_id != q.query_id
)"""
    if not rerank:
        return head + f""",
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, CAST(rk AS BIGINT) AS rank, neighbor_id, cos_sim
FROM r WHERE rk <= {k}
"""
    return head + f""",
sl AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS slrk
  FROM scored
),
ex AS (
  SELECT s.query_id, s.neighbor_id,
         {_cos_sql("q.q_vec", "e.embedding", round_digits)} AS cos_sim
  FROM sl s
  JOIN embeddings e ON e.vec_id = s.neighbor_id
  JOIN q ON q.query_id = s.query_id
  WHERE s.slrk <= {rerank}
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rk
  FROM ex
)
SELECT query_id, CAST(rk AS BIGINT) AS rank, neighbor_id, cos_sim
FROM r WHERE rk <= {k}
"""


ORACLE_KNN_PQ = _pq_oracle_sql(m=4, ksub=8, iters=2, dim=64, k=3, rerank=50)


def q_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (IVFADC): 8-centroid coarse quantizer prunes to nprobe=2
    inverted lists; 4x8 product quantization over the coarse RESIDUALS
    (not the raw vectors -- residuals carry less variance, so the same
    code budget quantizes tighter); ADC scored once per distinct
    (bucket, code) tuple; exact-cosine rerank of the 50-shortlist."""
    e = _embeddings(spark, sf_dir)
    return sim.knn_ivfpq(
        e, F.col("vec_id") < 10, n_coarse=8, coarse_iters=2,
        m=4, ksub=8, pq_iters=2, dim=64, k=3, nprobe=2, rerank=50,
    )


def _ivfpq_oracle_sql(
    n_coarse: int = 8, coarse_iters: int = 2, m: int = 4, ksub: int = 8,
    pq_iters: int = 2, dim: int = 64, k: int = 3, nprobe: int = 2,
    rerank: int = 0, round_digits: int = 6,
) -> str:
    """Coarse trainer (prefix ``g``) -> residual CTE (element-wise
    subtraction, unrolled) -> m prefixed sub-trainers over residual
    slices -> reconstruction = coarse centroid + decoded residual ->
    probe-limited ADC ranking -> exact rerank.  Every stage reuses the
    shared ``_kmeans_train_ctes`` block so cluster labels cannot drift
    from the Spark twins."""
    dsub = dim // m
    gi, cos = coarse_iters, _raw_cos_sql
    parts = [
        _kmeans_train_ctes(
            n_coarse, coarse_iters, dim, round_digits,
            source_sql="SELECT vec_id, embedding FROM embeddings",
            prefix="g", leading_with=True,
        )
    ]
    sub_res = ", ".join(
        f"f.embedding[{i + 1}] - cb.cv[{i + 1}]" for i in range(dim)
    )
    parts.append(f""",
res AS (
  SELECT f.vec_id, list_value({sub_res}) AS embedding, f.bucket
  FROM gfin f JOIN gc{gi} cb ON cb.cid = f.bucket
)""")
    for j in range(m):
        parts.append(
            _kmeans_train_ctes(
                ksub, pq_iters, dsub, round_digits,
                source_sql=(
                    f"SELECT vec_id, embedding[{j * dsub + 1}:{(j + 1) * dsub}]"
                    " AS embedding FROM res"
                ),
                prefix=f"p{j}", leading_with=False,
            )
        )
    fin_joins = "".join(
        f"\n  JOIN p{j}fin f{j} ON f{j}.vec_id = f0.vec_id"
        for j in range(1, m)
    )
    cb_joins = "".join(
        f"\n  JOIN p{j}c{pq_iters} cb{j} ON cb{j}.cid = f{j}.bucket"
        for j in range(m)
    )
    rres = "cb0.cv"
    for j in range(1, m):
        rres = f"list_concat({rres}, cb{j}.cv)"
    full_add = ", ".join(
        f"gcb.cv[{i + 1}] + d.rres[{i + 1}]" for i in range(dim)
    )
    parts.append(f""",
decr AS (
  SELECT f0.vec_id, {rres} AS rres
  FROM p0fin f0{fin_joins}{cb_joins}
),
dec AS (
  SELECT d.vec_id, r.bucket, list_value({full_add}) AS recon
  FROM decr d
  JOIN res r ON r.vec_id = d.vec_id
  JOIN gc{gi} gcb ON gcb.cid = r.bucket
),
qprobe AS (
  SELECT vec_id AS query_id, embedding AS q_vec, cid AS bucket
  FROM (SELECT e.vec_id, e.embedding, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos("e.embedding", "c.cv")} DESC, c.cid) AS rn
        FROM gsrc e, gc{gi} c
        WHERE e.vec_id < 10)
  WHERE rn <= {nprobe}
),
scored AS (
  SELECT q.query_id, d.vec_id AS neighbor_id,
         {_cos_sql("q.q_vec", "d.recon", round_digits)} AS cos_sim
  FROM dec d JOIN qprobe q ON q.bucket = d.bucket
  WHERE d.vec_id != q.query_id
)""")
    if not rerank:
        parts.append(f""",
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, CAST(rk AS BIGINT) AS rank, neighbor_id, cos_sim
FROM r WHERE rk <= {k}
""")
        return "".join(parts)
    parts.append(f""",
sl AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS slrk
  FROM scored
),
ex AS (
  SELECT s.query_id, s.neighbor_id,
         {_cos_sql("q.q_vec", "e.embedding", round_digits)} AS cos_sim
  FROM sl s
  JOIN embeddings e ON e.vec_id = s.neighbor_id
  JOIN (SELECT DISTINCT query_id, q_vec FROM qprobe) q
    ON q.query_id = s.query_id
  WHERE s.slrk <= {rerank}
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rk
  FROM ex
)
SELECT query_id, CAST(rk AS BIGINT) AS rank, neighbor_id, cos_sim
FROM r WHERE rk <= {k}
""")
    return "".join(parts)


ORACLE_KNN_IVFPQ = _ivfpq_oracle_sql(
    n_coarse=8, coarse_iters=2, m=4, ksub=8, pq_iters=2, dim=64,
    k=3, nprobe=2, rerank=50,
)


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _embeddings(spark, sf_dir)
    dups = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    both = e.unionByName(dups)
    return sim.embedding_neardup_pairs(both, threshold=0.999, round_digits=6)


ORACLE_EMBED_NEARDUP = f"""
WITH e AS (
  SELECT vec_id, embedding, label FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding, label FROM embeddings WHERE vec_id % 10 = 0
),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         {_cos_sql("a.embedding", "b.embedding")} AS cos_sim
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, cos_sim
FROM p WHERE cos_sim >= 0.999
"""


def q_embed_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe embedding near-dup: SRP-LSH candidates -> exact cosine
    verified on candidates only (no block-quadratic join)."""
    e = _embeddings(spark, sf_dir)
    dups = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    both = e.unionByName(dups)
    return sim.embedding_neardup_lsh(
        both, dim=64, bands=3, rows_per_band=8, threshold=0.999, round_digits=6
    )


def _embed_lsh_oracle_sql(
    dim: int = 64, bands: int = 3, rows_per_band: int = 8, threshold: float = 0.999
) -> str:
    planes = sim.srp_planes(bands * rows_per_band, dim)
    bit_exprs = ",\n         ".join(
        "CASE WHEN "
        + _DOT.format(a="embedding", b="[" + ",".join(str(x) for x in p) + "]")
        + f" >= 0 THEN 1 ELSE 0 END AS bit_{j}"
        for j, p in enumerate(planes)
    )
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, {b} AS band, "
        + " + ".join(
            f"bit_{b * rows_per_band + r} * {1 << r}" for r in range(rows_per_band)
        )
        + " AS bv FROM s"
        for b in range(bands)
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding, label FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding, label FROM embeddings WHERE vec_id % 10 = 0
),
s AS (
  SELECT vec_id,
         {bit_exprs}
  FROM e
),
b AS (
{band_selects}
),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM b x JOIN b y ON x.band = y.band AND x.bv = y.bv AND x.vec_id < y.vec_id
),
p AS (
  SELECT cand.id_a, cand.id_b,
         {_cos_sql("ea.embedding", "eb.embedding")} AS cos_sim
  FROM cand JOIN e ea ON ea.vec_id = cand.id_a JOIN e eb ON eb.vec_id = cand.id_b
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, cos_sim
FROM p WHERE cos_sim >= {threshold}
"""


ORACLE_EMBED_NEARDUP_LSH = _embed_lsh_oracle_sql()


# --- text analysis ----------------------------------------------------------


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir)
    scored = tx.lang_scores(d)
    return scored.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "pred_lang",
        "en_score",
        "de_score",
        "fr_score",
    )


_STOP_SQL = {
    "en": r"\b(the|a|of|to|and|in)\b",
    "de": r"\b(der|die|das|und|ein|zu)\b",
    "fr": r"\b(le|la|et|les|des|un)\b",
}

ORACLE_LANG_ID = f"""
WITH s AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '{_STOP_SQL["en"]}', 1)) AS BIGINT) AS en_score,
         CAST(len(regexp_extract_all(lower(text), '{_STOP_SQL["de"]}', 1)) AS BIGINT) AS de_score,
         CAST(len(regexp_extract_all(lower(text), '{_STOP_SQL["fr"]}', 1)) AS BIGINT) AS fr_score
  FROM documents
)
SELECT doc_id,
       CASE WHEN en_score >= de_score AND en_score >= fr_score THEN 'en'
            WHEN de_score >= fr_score THEN 'de' ELSE 'fr' END AS pred_lang,
       en_score, de_score, fr_score
FROM s
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir)
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tx.token_count(F.col("text")).alias("n_tokens"),
        tx.quality_score(F.col("text")).alias("quality"),
    )


# the one SQL mirror of textstats.quality_score -- every oracle that
# needs the score builds on this fragment so the weights cannot drift
_SQL_QUALITY_EXPR = (
    "round(least(n_tok / 100.0, 1.0) * 0.5"
    " + (n_stop / greatest(n_tok, 1.0)) * 0.3"
    " + (1.0 - least(n_punct / greatest(n_tok, 1.0), 1.0)) * 0.2, 6)"
)

_SQL_QUALITY_INPUTS = f"""
         CAST(len(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS DOUBLE) AS n_tok,
         CAST(len(regexp_extract_all(lower(text), '{_STOP_SQL["en"]}', 1)) AS DOUBLE) AS n_stop,
         CAST(len(regexp_extract_all(text, '([.,;:!?])', 1)) AS DOUBLE) AS n_punct
"""

ORACLE_QUALITY_SCORE = f"""
WITH s AS (
  SELECT doc_id,
{_SQL_QUALITY_INPUTS}
  FROM documents
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
       {_SQL_QUALITY_EXPR} AS quality
FROM s
"""


def docs_with_mirrored_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + every 7th doc republished under a 'mirror-site'
    source -- the cross-source verbatim copying a source-overlap matrix
    exists to expose (the exact-dup corpus keeps copies in the SAME
    source, which this measure must NOT count)."""
    d = _documents(spark, sf_dir)
    mirr = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        "text",
        "lang",
        F.lit("mirror-site").alias("source"),
        "n_chars",
    )
    return d.unionByName(mirr)


_SQL_MIRROR_DOCS = """
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 200000, text, 'mirror-site' FROM documents WHERE doc_id % 7 = 0
"""


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source copying matrix: distinct 15-gram hashes shared per
    source pair.  The planted mirror pairs dominate the matrix (hundreds
    of shared grams each); a small organic tail exists because the
    synthetic generator's template occasionally repeats 15-token runs
    across sources -- exactly the background level the matrix exists to
    separate copying from."""
    d = docs_with_mirrored_sources(spark, sf_dir)
    return dd.source_ngram_overlap(d, n=15)


ORACLE_SOURCE_OVERLAP = f"""
WITH d AS ({_SQL_MIRROR_DOCS}),
s AS (
  SELECT source, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM d
),
g AS (
  SELECT DISTINCT source AS src, unnest(list_distinct(list_transform(
    range(1, greatest(len(str_split(s, ' ')) - 14, 0) + 1),
    i -> CAST('0x' || substr(md5(array_to_string(
           list_slice(str_split(s, ' '), CAST(i AS INT), CAST(i AS INT) + 14),
           ' ')), 1, 8) AS BIGINT)))) AS h
  FROM s
)
SELECT a.src AS source_a, b.src AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared_grams
FROM g a JOIN g b ON a.h = b.h AND a.src < b.src
GROUP BY a.src, b.src
"""


def docs_with_shifted_copies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + every 6th doc republished with an injected preamble:
    every byte offset in the copy shifts, so fixed-width blocks and
    whole-doc hashing both miss the duplication -- the case
    content-defined chunking exists for."""
    d = _documents(spark, sf_dir)
    cp = d.filter(F.col("doc_id") % 6 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat(
            F.lit("Editor's note: this article is republished from our "
                  "archive with permission. "),
            F.col("text"),
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return d.unionByName(cp)


_SQL_SHIFTED_DOCS = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 300000,
         'Editor''s note: this article is republished from our archive ' ||
         'with permission. ' || text
  FROM documents WHERE doc_id % 6 = 0
"""


def q_cdc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunk dedup over the shifted-copy corpus: the
    injected preamble shifts every byte of the copy, yet interior chunk
    boundaries re-align and the shared chunks light up."""
    d = docs_with_shifted_copies(spark, sf_dir)
    return dd.cdc_chunk_stats(d, window=8, boundary_mod=64).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_chunks",
        "n_dup_chunks",
        "dup_chunk_ratio",
        "dup_char_frac",
    )


ORACLE_CDC_CHUNK_STATS = f"""
WITH d AS ({_SQL_SHIFTED_DOCS}),
s0 AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM d
),
s AS (SELECT * FROM s0 WHERE length(s) > 0),
rh AS (
  SELECT doc_id, s, list_transform(
    range(1, greatest(length(s) - 7, 1) + 1),
    i -> list_reduce(
           list_prepend(0, list_transform(
                          range(1, length(substr(s, CAST(i AS INT), 8)) + 1),
                          j -> CAST(ascii(substr(substr(s, CAST(i AS INT), 8),
                                                 CAST(j AS INT), 1)) AS BIGINT))),
           (acc, x) -> (acc * 31 + x) % 1000003)
  ) AS hs
  FROM s
),
cut AS (
  SELECT doc_id, s,
         list_prepend(CAST(1 AS BIGINT), list_transform(
           list_transform(
             list_filter(range(1, len(hs) + 1),
                         i -> hs[CAST(i AS INT)] % 64 = 0),
             i -> i + 7),
           p -> p + 1)) AS starts,
         list_append(list_transform(
           list_filter(range(1, len(hs) + 1),
                       i -> hs[CAST(i AS INT)] % 64 = 0),
           i -> i + 7), CAST(length(s) AS BIGINT)) AS ends
  FROM rh
),
ch AS (
  SELECT doc_id, md5(c) AS h, length(c) AS n_chars FROM (
    SELECT doc_id, unnest(list_filter(
      list_transform(range(1, len(starts) + 1),
        k -> substr(s, CAST(starts[CAST(k AS INT)] AS INT),
                    CAST(greatest(ends[CAST(k AS INT)]
                                  - starts[CAST(k AS INT)] + 1, 0) AS INT))),
      c -> length(c) > 0)) AS c
    FROM cut
  )
),
f AS (SELECT h, count(DISTINCT doc_id) AS n_docs FROM ch GROUP BY h)
SELECT CAST(ch.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_chunks,
       round(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS dup_chunk_ratio,
       round(sum(CASE WHEN n_docs >= 2 THEN n_chars ELSE 0 END)::DOUBLE
             / sum(n_chars), 6) AS dup_char_frac
FROM ch JOIN f USING (h)
GROUP BY ch.doc_id
"""


def q_quality_dup_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-picking table: fixed-width quality buckets (floor(q*10),
    top-clamped) x verbatim-duplication rate over the exact-dup corpus.
    Equal-WIDTH buckets, not deciles, on purpose: a global ntile needs a
    single-partition sort (a scale killer) while floor(q*10) is map-side;
    the table answers the same question ('does low quality co-occur with
    duplication, and where would a cutoff land').  Exact integer sums,
    single rounded division."""
    d = docs_with_exact_dups(spark, sf_dir)
    s = d.select(
        "doc_id",
        F.least(
            F.floor(tx.quality_score(F.col("text")) * 10).cast("int"), F.lit(9)
        ).alias("bucket"),
        F.md5("text").alias("h"),
    )
    freq = s.groupBy("h").agg(F.count(F.lit(1)).alias("_n"))
    dup = (F.col("_n") >= 2).cast("long")
    return (
        s.join(freq, "h")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(dup).alias("n_dup_docs"),
        )
        .select(
            "bucket",
            "n_docs",
            "n_dup_docs",
            F.round(F.col("n_dup_docs") / F.col("n_docs"), 6).alias("dup_rate"),
        )
    )


ORACLE_QUALITY_DUP_CALIBRATION = f"""
WITH d AS ({_SQL_EXACT_DUPS}),
q AS (
  SELECT doc_id, md5(text) AS h,
{_SQL_QUALITY_INPUTS}
  FROM d
),
s AS (
  SELECT doc_id, h,
         least(CAST(floor({_SQL_QUALITY_EXPR} * 10) AS INT), 9) AS bucket
  FROM q
),
f AS (SELECT h, count(*) AS n FROM s GROUP BY h)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       round(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         AS dup_rate
FROM s JOIN f USING (h)
GROUP BY bucket
"""


def q_quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What a quality cutoff at t actually KEEPS -- the table a data-mixing
    run consults before picking the threshold (r5 verdict ask #6,
    extending ``q_quality_dup_calibration`` from per-bucket description to
    per-threshold decision support): for each candidate cutoff t,
    (docs kept, training tokens kept, exact-dup rate among kept,
    English share among kept).

    Scale shape: ONE pass over the corpus into <= 10 fixed-width quality
    buckets (floor(q*10), map-side -- same no-global-ntile argument as
    the calibration table), per-bucket exact integer sums, then the
    sweep is a SUFFIX-CUMULATIVE window over the <= 10 bucket rows
    (keep-at-threshold-t = everything in buckets >= 10t), so the
    unpartitioned window is over a provably tiny aggregate, never the
    data.  Dup flags use corpus-wide md5 frequency (is this doc a copy
    of anything in the corpus, same semantics as the calibration
    table); lang mix uses the table's lang column."""
    d = docs_with_exact_dups(spark, sf_dir)
    s = d.select(
        F.least(
            F.floor(tx.quality_score(F.col("text")) * 10).cast("int"), F.lit(9)
        ).alias("bucket"),
        F.md5("text").alias("h"),
        F.size(tx.tokens(F.col("text"))).cast("long").alias("n_tok"),
        (F.col("lang") == "en").cast("long").alias("is_en"),
    )
    freq = s.groupBy("h").agg(F.count(F.lit(1)).alias("_n"))
    per = (
        s.join(freq, "h")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_docs"),
            F.sum((F.col("_n") >= 2).cast("long")).alias("_dups"),
            F.sum("n_tok").alias("_toks"),
            F.sum("is_en").alias("_en"),
        )
    )
    # suffix-cumulative over <= 10 rows: single-partition window is fine
    w = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return per.select(
        F.round(F.col("bucket") / 10.0, 1).alias("threshold"),
        F.sum("_docs").over(w).alias("n_docs_kept"),
        F.sum("_toks").over(w).alias("kept_tokens"),
        F.round(F.sum("_dups").over(w) / F.sum("_docs").over(w), 6).alias(
            "dup_rate_kept"
        ),
        F.round(F.sum("_en").over(w) / F.sum("_docs").over(w), 6).alias(
            "en_share_kept"
        ),
    )


ORACLE_QUALITY_THRESHOLD_SWEEP = f"""
WITH d AS ({_SQL_EXACT_DUPS}),
q AS (
  SELECT doc_id, md5(text) AS h, lang,
{_SQL_QUALITY_INPUTS}
  FROM d
),
s AS (
  SELECT h, CAST(n_tok AS BIGINT) AS n_tok_i,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
         least(CAST(floor({_SQL_QUALITY_EXPR} * 10) AS INT), 9) AS bucket
  FROM q
),
f AS (SELECT h, count(*) AS n FROM s GROUP BY h),
per AS (
  SELECT bucket, count(*) AS docs,
         sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS dups,
         sum(n_tok_i) AS toks, sum(is_en) AS en
  FROM s JOIN f USING (h)
  GROUP BY bucket
)
SELECT round(bucket / 10.0, 1) AS threshold,
       CAST(sum(docs) OVER w AS BIGINT) AS n_docs_kept,
       CAST(sum(toks) OVER w AS BIGINT) AS kept_tokens,
       round(CAST(sum(dups) OVER w AS DOUBLE) / (sum(docs) OVER w), 6)
         AS dup_rate_kept,
       round(CAST(sum(en) OVER w AS DOUBLE) / (sum(docs) OVER w), 6)
         AS en_share_kept
FROM per
WINDOW w AS (ORDER BY bucket DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir)
    toks = tx.tokens(F.col("text"))
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    n = F.size(toks)
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.round(
            total_len.cast("double") / F.greatest(n, F.lit(1)).cast("double"), 6
        ).alias("avg_token_len"),
    )


ORACLE_TOKEN_STATS = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '([a-z0-9]+)', 1) AS toks
  FROM documents
)
SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
       round(CAST(list_reduce(list_prepend(0, list_transform(toks, t -> length(t))), (x, y) -> x + y) AS DOUBLE)
             / CAST(greatest(len(toks), 1) AS DOUBLE), 6) AS avg_token_len
FROM t
"""


def q_token_stats_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenizer stats: the LLM-token-count proxy."""
    d = _documents(spark, sf_dir)
    toks = tx.bpe_ish_tokens(F.col("text"))
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    n = F.size(toks)
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n.cast("long").alias("n_tokens_bpe"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_bpe"),
        F.round(
            total_len.cast("double") / F.greatest(n, F.lit(1)).cast("double"), 6
        ).alias("avg_bpe_token_len"),
    )


def _token_stats_bpe_oracle() -> str:
    from mariadb_to_graylog_spark.operators.textstats import BPE_ISH_PATTERN

    pat = BPE_ISH_PATTERN.replace("'", "''")
    return f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{pat}', 1) AS toks
  FROM documents
)
SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens_bpe,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_bpe,
       round(CAST(list_reduce(list_prepend(0, list_transform(toks, t -> length(t))), (x, y) -> x + y) AS DOUBLE)
             / CAST(greatest(len(toks), 1) AS DOUBLE), 6) AS avg_bpe_token_len
FROM t
"""


ORACLE_TOKEN_STATS_BPE = _token_stats_bpe_oracle()


def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish tokens per whitespace
    word from EXACT integer corpus sums (one rounded division at the
    end, fp-order-stable) -- the compute-cost-per-word metric a
    multilingual tokenizer choice is judged on."""
    d = _documents(spark, sf_dir)
    ws = tx.token_count(F.col("text")).cast("long")
    bpe = F.size(tx.bpe_ish_tokens(F.col("text"))).cast("long")
    return (
        d.select("lang", ws.alias("_w"), bpe.alias("_b"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_w").alias("ws_tokens"),
            F.sum("_b").alias("bpe_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "ws_tokens",
            "bpe_tokens",
            F.round(
                F.col("bpe_tokens").cast("double")
                / F.greatest(F.col("ws_tokens"), F.lit(1).cast("long")),
                6,
            ).alias("fertility"),
        )
    )


def _token_fertility_oracle() -> str:
    from mariadb_to_graylog_spark.operators.textstats import BPE_ISH_PATTERN

    pat = BPE_ISH_PATTERN.replace("'", "''")
    return f"""
WITH t AS (
  SELECT lang,
         CAST(len(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS BIGINT) AS w,
         CAST(len(regexp_extract_all(lower(text), '{pat}', 1)) AS BIGINT) AS b
  FROM documents
), g AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(w) AS BIGINT) AS ws_tokens,
         CAST(SUM(b) AS BIGINT) AS bpe_tokens
  FROM t GROUP BY lang
)
SELECT lang, n_docs, ws_tokens, bpe_tokens,
       round(CAST(bpe_tokens AS DOUBLE) / greatest(ws_tokens, 1), 6) AS fertility
FROM g
"""


ORACLE_TOKEN_FERTILITY = _token_fertility_oracle()


def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter diagnostic on the language key: top strata by row
    count with integer-ppm shares -- what a salting/AQE-skew decision
    reads before a big groupBy/join."""
    d = _documents(spark, sf_dir)
    return tx.key_skew_stats(d, "lang", top_n=10)


ORACLE_KEY_SKEW = """
WITH c AS (
  SELECT CAST(lang AS VARCHAR) AS key, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents GROUP BY 1
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c
), r AS (
  SELECT key, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rank FROM c
)
SELECT CAST(r.rank AS BIGINT) AS rank, r.key, r.cnt,
       CAST(r.cnt * 1000000 // tot.n AS BIGINT) AS share_ppm
FROM r, tot WHERE r.rank <= 10
"""


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: duplicate-word-bigram ratio, with a planted
    highly-repetitive variant of every 7th doc (text doubled) so the
    signal separates."""
    d = _documents(spark, sf_dir)
    boiler = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" "), F.col("text")).alias("text"),
    )
    both = d.select("doc_id", "text").unionByName(boiler)
    return both.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(tx.word_bigrams(F.col("text"))).cast("long").alias("n_bigrams"),
        tx.dup_bigram_ratio(F.col("text")).alias("dup_bigram_ratio"),
    )


ORACLE_REPETITION = """
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000, text || ' ' || text FROM documents WHERE doc_id % 7 = 0
),
g AS (
  SELECT doc_id,
         list_transform(
           range(1, greatest(len(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) - 1, 1) + 1),
           i -> concat_ws(' ',
                regexp_extract_all(lower(text), '([a-z0-9]+)', 1)[CAST(i AS INT)],
                regexp_extract_all(lower(text), '([a-z0-9]+)', 1)[CAST(i AS INT) + 1])
         ) AS grams
  FROM d
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(grams) AS BIGINT) AS n_bigrams,
       round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / CAST(len(grams) AS DOUBLE), 6) AS dup_bigram_ratio
FROM g
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir)
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tx.doc_fingerprint(F.col("text")).alias("fp"),
    )


ORACLE_DOC_FINGERPRINT = """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
FROM documents
"""


def _pii_snippet():
    # built lazily: Column construction needs an active SparkContext
    return (
        F.when(F.col("doc_id") % 4 == 0, F.lit(" contact user@example.com now"))
        .when(F.col("doc_id") % 4 == 1, F.lit(" seen from 10.1.2.3 port 80"))
        .when(F.col("doc_id") % 4 == 2, F.lit(" call 555-123-4567 today"))
        .otherwise(F.lit(""))
    )

_PII_SNIPPET_SQL = """CASE doc_id % 4
  WHEN 0 THEN ' contact user@example.com now'
  WHEN 1 THEN ' seen from 10.1.2.3 port 80'
  WHEN 2 THEN ' call 555-123-4567 today' ELSE '' END"""


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII hygiene over documents with deterministically-planted PII:
    per-rule counts + the redacted text's hash."""
    d = _documents(spark, sf_dir)
    t = F.concat(F.col("text"), _pii_snippet())
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        *tx.pii_counts(t),
        F.md5(tx.redact_pii(t)).alias("redacted_md5"),
    )


def _pii_oracle_sql() -> str:
    """Generated from the SAME PII_RULES table as the engine chain."""
    expr = f"text || {_PII_SNIPPET_SQL}"
    count_cols = []
    for name, pat, rep in tx.PII_RULES:
        p = pat.replace("'", "''")
        count_cols.append(
            f"CAST(len(regexp_extract_all({expr}, '({p})', 1)) AS BIGINT) AS n_{name}"
        )
        expr = f"regexp_replace({expr}, '{p}', '{rep}', 'g')"
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       {", ".join(count_cols)},
       md5({expr}) AS redacted_md5
FROM documents
"""


ORACLE_PII_REDACT = _pii_oracle_sql()


def q_sample_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible hash-mod sampling (engine-independent, unlike
    df.sample): ~30% of documents by salted doc_id hash."""
    d = _documents(spark, sf_dir)
    kept = d.filter(tx.deterministic_sample_filter(F.col("doc_id"), 30, salt="s1"))
    return kept.select(F.col("doc_id").cast("long").alias("doc_id"), "lang")


ORACLE_SAMPLE_DET = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
FROM documents
WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 's1'), 1, 8) AS BIGINT) % 100 < 30
"""

_STRATA_RATES = {"en": 50, "de": 20, "fr": 10}


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language rebalancing: per-stratum deterministic rates."""
    d = _documents(spark, sf_dir)
    kept = d.filter(
        tx.stratified_sample_filter(
            F.col("doc_id"), F.col("lang"), _STRATA_RATES, salt="s1"
        )
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
    )


ORACLE_SAMPLE_STRATIFIED = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM documents
WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 's1'), 1, 8) AS BIGINT) % 100
      < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20 WHEN 'fr' THEN 10 ELSE 0 END
GROUP BY lang
"""


_MIX_QUOTAS = {"en": 50, "de": 25, "fr": 25, "zh": 10}


def q_sample_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-count data mixing: keep exactly min(quota, stratum size)
    docs per language by salted-hash rank ('es' unlisted -> dropped) --
    the budget-denominated twin of the rate-based sample_stratified."""
    d = _documents(spark, sf_dir)
    kept = tx.stratified_quota_sample(d, _MIX_QUOTAS, salt="mix1")
    return kept.select(F.col("doc_id").cast("long").alias("doc_id"), "lang")


ORACLE_SAMPLE_QUOTA = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang FROM (
  SELECT doc_id, lang, row_number() OVER (
    PARTITION BY lang
    ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'mix1'),
                  1, 8) AS BIGINT), doc_id) AS rk
  FROM documents WHERE lang IN ('en', 'de', 'fr', 'zh'))
WHERE rk <= CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 25
                      WHEN 'fr' THEN 25 WHEN 'zh' THEN 10 END
"""


def q_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency token profile per document: hapax (corpus freq 1)
    and rare (freq <= 2) occurrence fractions -- the OCR-garbage /
    gibberish signal the shape-based quality score misses."""
    d = _documents(spark, sf_dir)
    return tx.token_rarity(d, rare_max=2).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_tokens",
        "n_hapax",
        "n_rare",
        "hapax_frac",
        "rare_frac",
    )


ORACLE_TOKEN_RARITY = """
WITH occ AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS tok
  FROM documents
),
freq AS (SELECT tok, count(*) AS cnt FROM occ GROUP BY tok),
agg AS (
  SELECT occ.doc_id, count(*) AS n_tokens,
         sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS n_hapax,
         sum(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) AS n_rare
  FROM occ JOIN freq USING (tok) GROUP BY occ.doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(n_hapax, 0) AS BIGINT) AS n_hapax,
       CAST(coalesce(n_rare, 0) AS BIGINT) AS n_rare,
       round(coalesce(n_hapax, 0)::DOUBLE / greatest(coalesce(n_tokens, 0), 1), 6)
         AS hapax_frac,
       round(coalesce(n_rare, 0)::DOUBLE / greatest(coalesce(n_tokens, 0), 1), 6)
         AS rare_frac
FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
"""


def docs_with_excerpts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + prefix excerpts (first 120 chars) of every 7th doc --
    true partial CONTAINMENT: the excerpt shares ~all of its own sketch
    with its source but little of the source's (low whole-doc Jaccard)."""
    d = _documents(spark, sf_dir)
    ex = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.substring("text", 1, 120).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return d.unionByName(ex)


_SQL_EXCERPTS = """
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 200000, substr(text, 1, 120), lang, source, n_chars
  FROM documents WHERE doc_id % 7 = 0
"""


def q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing containment pairs: excerpt docs must pair with their
    sources at high overlap even where whole-doc Jaccard is low."""
    d = docs_with_excerpts(spark, sf_dir)
    return dd.winnow_overlap_pairs(d, window=8, select_every=4, min_overlap=0.5)


# the winnow sketch, validated value-identical to the Spark fold: the
# inner rolling hash is list_reduce over list_prepend(0, ...) so the fold
# is genuinely 0-seeded like Spark's aggregate (a bare first-element seed
# would skip the first `% mod` step and diverge for codepoints >= the
# modulus, i.e. planes 15-16 private use); list_distinct reorders, which
# the explode erases
ORACLE_WINNOW_OVERLAP = f"""
WITH d AS ({_SQL_EXCERPTS}),
s AS (
  SELECT doc_id AS id,
         lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM d
),
rh AS (
  SELECT id, list_transform(
    range(1, greatest(length(s) - 7, 1) + 1),
    i -> list_reduce(
           list_prepend(0, list_transform(
                          range(1, length(substr(s, CAST(i AS INT), 8)) + 1),
                          j -> CAST(ascii(substr(substr(s, CAST(i AS INT), 8),
                                                 CAST(j AS INT), 1)) AS BIGINT))),
           (acc, x) -> (acc * 31 + x) % 1000003)
  ) AS hs
  FROM s WHERE length(s) > 0
),
sk AS (
  SELECT id, list_distinct(list_transform(
           range(0, CAST((len(hs) - 1) / 4 AS INT) + 1),
           k -> list_min(list_slice(hs, CAST(k AS INT) * 4 + 1, CAST(k AS INT) * 4 + 4))
         )) AS sketch
  FROM rh
),
e AS (SELECT id, len(sketch) AS sz, unnest(sketch) AS h FROM sk),
p AS (
  SELECT a.id AS id_a, b.id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
         COUNT(*) AS shared
  FROM e a JOIN e b ON a.h = b.h AND a.id < b.id
  GROUP BY 1, 2, 3, 4
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(shared AS BIGINT) AS shared,
       round(CAST(shared AS DOUBLE) / least(sz_a, sz_b), 6) AS overlap
FROM p
WHERE round(CAST(shared AS DOUBLE) / least(sz_a, sz_b), 6) >= 0.5
"""


def docs_with_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with deterministic planted URLs (the corpus has none):
    a per-source page URL, a subdomained mirror with a port, and a
    per-lang asset on a second registrable domain -- exercises extraction,
    host parsing, and the two-label domain fold."""
    d = _documents(spark, sf_dir)
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Read https://"), F.col("source"), F.lit(".example.com/d/"),
            F.col("doc_id").cast("string"),
            F.lit(" mirror http://cdn."), F.col("source"),
            F.lit(".example.com:8080/d/"), F.col("doc_id").cast("string"),
            F.lit(" img https://img-"), F.col("lang"),
            F.lit(".example.org/x.png"),
        ).alias("text"),
        "lang",
        "source",
    )


_SQL_URL_DOCS = """
  SELECT doc_id,
         text || ' Read https://' || source || '.example.com/d/' || doc_id ||
         ' mirror http://cdn.' || source || '.example.com:8080/d/' || doc_id ||
         ' img https://img-' || lang || '.example.org/x.png' AS text,
         lang
  FROM documents
"""


def q_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/domain harvest: per-doc URL count + sorted-distinct hosts and
    registrable domains (C4/RefinedWeb-style source signal input)."""
    d = docs_with_urls(spark, sf_dir)
    return tx.url_features(d).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_urls",
        "hosts",
        "domains",
    )


_SQL_HOST = "regexp_extract(x, 'https?://([A-Za-z0-9](?:[A-Za-z0-9.\\-]*[A-Za-z0-9])?)', 1)"

ORACLE_URL_EXTRACT = f"""
WITH d AS ({_SQL_URL_DOCS}),
u AS (
  SELECT doc_id,
         regexp_extract_all(text, '(https?://[A-Za-z0-9](?:[A-Za-z0-9.\\-]*[A-Za-z0-9])?(?::\\d+)?(?:/[^\\s]*)?)', 1) AS urls
  FROM d
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(urls) AS BIGINT) AS n_urls,
       array_to_string(list_sort(list_distinct(list_transform(urls,
         x -> {_SQL_HOST}))), ',') AS hosts,
       array_to_string(list_sort(list_distinct(list_transform(urls,
         x -> array_to_string(list_slice(str_split({_SQL_HOST}, '.'),
                greatest(len(str_split({_SQL_HOST}, '.')) - 1, 1),
                99), '.')))), ',') AS domains
FROM u
"""


def q_domain_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cited-domain reputation joined back to (doc, domain) rows --
    the URL-derived counterpart of source_reputation."""
    d = docs_with_urls(spark, sf_dir)
    return tx.domain_reputation(d).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "domain",
        "dom_n_docs",
        "dom_mean_chars",
        "dom_stop_ratio",
    )


ORACLE_DOMAIN_REPUTATION = f"""
WITH d AS ({_SQL_URL_DOCS}),
per AS (
  SELECT doc_id,
         length(text) AS chars,
         len(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS tok,
         len(regexp_extract_all(lower(text), '{_STOP_SQL["en"]}', 1)) AS stop,
         unnest(list_distinct(list_transform(
           regexp_extract_all(text, '(https?://[A-Za-z0-9](?:[A-Za-z0-9.\\-]*[A-Za-z0-9])?(?::\\d+)?(?:/[^\\s]*)?)', 1),
           x -> array_to_string(list_slice(str_split({_SQL_HOST}, '.'),
                  greatest(len(str_split({_SQL_HOST}, '.')) - 1, 1),
                  99), '.')))) AS domain
  FROM d
),
dom AS (
  SELECT domain, COUNT(*) AS n, SUM(chars) AS sc, SUM(tok) AS st,
         SUM(stop) AS ss
  FROM per GROUP BY domain
)
SELECT CAST(per.doc_id AS BIGINT) AS doc_id, per.domain,
       CAST(n AS BIGINT) AS dom_n_docs,
       round(CAST(sc AS DOUBLE)/n, 6) AS dom_mean_chars,
       round(CAST(ss AS DOUBLE)/greatest(st, 1), 6) AS dom_stop_ratio
FROM per JOIN dom USING (domain)
"""


def q_domain_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cited-domain language distribution: counts, shares, and the
    deterministic plurality flag -- the routing table that sends a
    domain's crawl to the right language pipeline."""
    d = docs_with_urls(spark, sf_dir)
    return tx.domain_language_mix(d).select(
        "domain", "lang", "n_docs", "lang_share", "is_dominant"
    )


ORACLE_DOMAIN_LANG_MIX = f"""
WITH d AS ({_SQL_URL_DOCS}),
per AS (
  SELECT doc_id, lang,
         unnest(list_distinct(list_transform(
           regexp_extract_all(text, '(https?://[A-Za-z0-9](?:[A-Za-z0-9.\\-]*[A-Za-z0-9])?(?::\\d+)?(?:/[^\\s]*)?)', 1),
           x -> array_to_string(list_slice(str_split({_SQL_HOST}, '.'),
                  greatest(len(str_split({_SQL_HOST}, '.')) - 1, 1),
                  99), '.')))) AS domain
  FROM d
),
c AS (SELECT domain, lang, count(*) AS n_docs FROM per GROUP BY domain, lang),
w AS (
  SELECT domain, lang, n_docs,
         sum(n_docs) OVER (PARTITION BY domain) AS tot,
         min({{'negn': -n_docs, 'l': lang}}) OVER (PARTITION BY domain) AS top
  FROM c
)
SELECT domain, lang, CAST(n_docs AS BIGINT) AS n_docs,
       round(n_docs::DOUBLE / tot, 6) AS lang_share,
       (-n_docs = top.negn AND lang = top.l) AS is_dominant
FROM w
"""


def q_source_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source reputation (doc counts, verbatim-dup rate, mean chars,
    stopword ratio) joined back to every document as features."""
    d = _documents(spark, sf_dir)
    return tx.source_reputation(d).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        "src_n_docs",
        "src_dup_rate",
        "src_mean_chars",
        "src_stop_ratio",
    )


ORACLE_SOURCE_REPUTATION = f"""
WITH s AS (
  SELECT doc_id, source, md5(text) AS h, length(text) AS chars,
         len(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS tok,
         len(regexp_extract_all(lower(text), '{_STOP_SQL["en"]}', 1)) AS stop
  FROM documents
),
src AS (
  SELECT source, COUNT(*) AS n, COUNT(DISTINCT h) AS nd, SUM(chars) AS sc,
         SUM(tok) AS st, SUM(stop) AS ss
  FROM s GROUP BY source
)
SELECT CAST(s.doc_id AS BIGINT) AS doc_id, s.source,
       CAST(n AS BIGINT) AS src_n_docs,
       round(CAST(n - nd AS DOUBLE)/n, 6) AS src_dup_rate,
       round(CAST(sc AS DOUBLE)/n, 6) AS src_mean_chars,
       round(CAST(ss AS DOUBLE)/greatest(st, 1), 6) AS src_stop_ratio
FROM s JOIN src USING (source)
"""


def q_substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup over the containment corpus: excerpt docs
    must pair with their verbatim sources, duplicate docs with each other;
    n_shared_grams counts shared 15-token windows."""
    d = docs_with_excerpts(spark, sf_dir)
    return dd.shared_ngram_pairs(d, n=15).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("n_shared_grams").cast("long").alias("n_shared_grams"),
    )


ORACLE_SUBSTRING_PAIRS = f"""
WITH d AS ({_SQL_EXCERPTS}),
s AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM d
),
g AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(str_split(s, ' ')) - 14, 0) + 1),
    i -> CAST('0x' || substr(md5(array_to_string(
           list_slice(str_split(s, ' '), CAST(i AS INT), CAST(i AS INT) + 14),
           ' ')), 1, 8) AS BIGINT)
  )) AS grams
  FROM s
),
e AS (SELECT doc_id, unnest(grams) AS h FROM g)
SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_grams
FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


def q_substring_run_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal verbatim-run extents per substring-sharing pair: excerpt
    docs recover ~their whole token span against their sources, duplicate
    docs recover the full document length."""
    d = docs_with_excerpts(spark, sf_dir)
    return dd.shared_run_extents(d, n=15).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "max_run_tokens",
    )


ORACLE_SUBSTRING_RUN_EXTENTS = f"""
WITH d AS ({_SQL_EXCERPTS}),
s AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM d
),
t AS (SELECT doc_id, str_split(s, ' ') AS toks FROM s),
g AS (
  SELECT doc_id, u.pos AS pos, u.h AS h FROM (
    SELECT doc_id, unnest(list_transform(
      range(1, greatest(len(toks) - 14, 0) + 1),
      i -> {{'pos': i - 1,
            'h': CAST('0x' || substr(md5(array_to_string(
                   list_slice(toks, CAST(i AS INT), CAST(i AS INT) + 14),
                   ' ')), 1, 8) AS BIGINT)}})) AS u
    FROM t
  )
),
m AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pos_a, b.pos AS pos_b
  FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id
),
i AS (
  SELECT id_a, id_b, pos_a,
         pos_a - dense_rank() OVER (
           PARTITION BY id_a, id_b, pos_a - pos_b ORDER BY pos_a) AS grp,
         pos_a - pos_b AS diag
  FROM m
),
r AS (SELECT id_a, id_b, count(DISTINCT pos_a) AS c
      FROM i GROUP BY id_a, id_b, diag, grp)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(max(c) + 14 AS BIGINT) AS max_run_tokens
FROM r GROUP BY 1, 2
"""


def q_verbatim_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lee-et-al dedup DECISION metric over the containment corpus:
    fraction of each doc's tokens inside any >= 15-token run shared with
    any other doc, overlapping runs from different partners counted once
    (interval union).  Excerpt docs approach coverage 1.0; clean docs
    report 0.0."""
    d = docs_with_excerpts(spark, sf_dir)
    return dd.verbatim_coverage(d, n=15).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_tokens",
        "covered_tokens",
        "coverage",
    )


def _verbatim_merged_ctes(pred: str) -> str:
    """Shared oracle CTE chain for the extents family over the excerpts
    corpus: normalized tokens -> positioned FULL-md5 grams (the
    coverage/trim ops use 128-bit gram identity -- see
    dedup._positioned_grams) -> ``pred``-oriented matches -> dense_rank
    islands -> per-doc RAW run intervals (CTE ``r``: id, s_, e_, possibly
    overlapping) -- one definition so the twin oracles cannot drift.

    Deliberately ends BEFORE any interval merging: the original merge
    used ``max(e_) OVER (... ROWS BETWEEN UNBOUNDED PRECEDING AND 1
    PRECEDING)``, which DuckDB's parallel window executor INTERMITTENTLY
    mis-evaluates (caught by tools/vc_flake_hunt.py: doc 200070 reported
    covered 44 of 23 tokens -- every interval double-counted; in-process
    deterministic, cross-process flaky -- the r5/r6 gate's one recurring
    FAIL).  Both consumers are order-independent instead: coverage
    counts DISTINCT covered positions, trim tests membership in ANY raw
    interval -- merged and unmerged intervals are equivalent for both."""
    return f"""
WITH d AS ({_SQL_EXCERPTS}),
s AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM d
),
t AS (SELECT doc_id, str_split(s, ' ') AS toks FROM s),
g AS (
  SELECT doc_id, u.pos AS pos, u.h AS h FROM (
    SELECT doc_id, unnest(list_transform(
      range(1, greatest(len(toks) - 14, 0) + 1),
      i -> {{'pos': i - 1,
            'h': md5(array_to_string(
                   list_slice(toks, CAST(i AS INT), CAST(i AS INT) + 14),
                   ' '))}})) AS u
    FROM t
  )
),
m AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pos_a,
         a.pos - b.pos AS diag
  FROM g a JOIN g b ON a.h = b.h AND a.doc_id {pred} b.doc_id
),
i AS (
  SELECT id_a, id_b, diag, pos_a,
         pos_a - dense_rank() OVER (
           PARTITION BY id_a, id_b, diag ORDER BY pos_a) AS grp
  FROM m
),
r AS (
  SELECT id_a AS id, min(pos_a) AS s_,
         min(pos_a) + count(DISTINCT pos_a) + 13 AS e_
  FROM i GROUP BY id_a, id_b, diag, grp
)"""


ORACLE_VERBATIM_COVERAGE = (
    _verbatim_merged_ctes("!=")
    + """,
tok AS (SELECT doc_id, len(toks) AS n_tokens FROM t),
cov AS (
  SELECT id, count(DISTINCT p) AS covered
  FROM (SELECT id, unnest(range(s_, e_ + 1)) AS p FROM r)
  GROUP BY id
)
SELECT CAST(tok.doc_id AS BIGINT) AS doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(coalesce(covered, 0) AS BIGINT) AS covered_tokens,
       round(coalesce(covered, 0)::DOUBLE / n_tokens, 6) AS coverage
FROM tok LEFT JOIN cov ON cov.id = tok.doc_id
"""
)


def q_trim_verbatim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring DEDUPLICATION (not just detection): every >= 15-token
    span also present in a lower-id document is trimmed, so one
    occurrence of each duplicated run survives corpus-wide; excerpt
    docs lose their pasted spans, sources keep theirs."""
    d = docs_with_excerpts(spark, sf_dir)
    return dd.trim_verbatim_runs(d, n=15).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "trimmed_text",
        "n_tokens",
        "n_tokens_removed",
    )


ORACLE_TRIM_VERBATIM = (
    _verbatim_merged_ctes(">")
    + """,
iv AS (
  SELECT id, list({'ms': s_, 'me': e_} ORDER BY s_, e_) AS ivs FROM r GROUP BY id
),
j AS (
  SELECT t.doc_id, t.toks,
         coalesce(iv.ivs, []::STRUCT(ms BIGINT, me BIGINT)[]) AS ivs
  FROM t LEFT JOIN iv ON iv.id = t.doc_id
),
k AS (
  SELECT doc_id, toks,
         list_filter(toks, (x, i) ->
           len(list_filter(ivs, v -> (i - 1) >= v.ms AND (i - 1) <= v.me)) = 0
         ) AS kept
  FROM j
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       coalesce(array_to_string(kept, ' '), '') AS trimmed_text,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(toks) - len(kept) AS BIGINT) AS n_tokens_removed
FROM k
"""
)


def docs_with_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents restructured into paragraph-shaped pages: the text's two
    halves plus a PLANTED per-language boilerplate footer ('subscribe'
    line) -- the shape whole-doc dedup misses: every doc is unique as a
    whole, yet one paragraph repeats across the whole language slice."""
    d = _documents(spark, sf_dir)
    return d.select(
        "doc_id",
        F.concat_ws(
            "\n\n",
            F.trim(F.substring("text", 1, 100)),
            F.trim(F.expr("substring(text, 101)")),
            F.concat(
                F.lit("Subscribe to the "),
                F.col("lang"),
                F.lit(" newsletter for updates."),
            ),
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )


_SQL_PARA_DOCS = """
  SELECT doc_id,
         concat_ws(chr(10)||chr(10),
                   trim(substr(text, 1, 100)),
                   trim(substr(text, 101)),
                   'Subscribe to the ' || lang || ' newsletter for updates.') AS text
  FROM documents
"""


def q_paragraph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level dedup profile: dup-paragraph ratio + boilerplate
    fraction per document (paragraph appears in >= 2 distinct docs)."""
    d = docs_with_paragraphs(spark, sf_dir)
    return pg.paragraph_stats(d).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_paras").cast("long").alias("n_paras"),
        F.col("n_dup_paras").cast("long").alias("n_dup_paras"),
        "dup_para_ratio",
        "boilerplate_frac",
    )


ORACLE_PARAGRAPH_STATS = f"""
WITH d AS ({_SQL_PARA_DOCS}),
p AS (
  SELECT doc_id, trim(para) AS para
  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\n\\s*\\n')) AS para FROM d)
  WHERE length(trim(para)) > 0
),
f AS (SELECT md5(para) AS h, count(DISTINCT doc_id) AS n_docs FROM p GROUP BY 1)
SELECT CAST(p.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_paras,
       CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_paras,
       round(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         AS dup_para_ratio,
       round(sum(CASE WHEN n_docs >= 2 THEN length(para) ELSE 0 END)::DOUBLE
             / sum(length(para)), 6) AS boilerplate_frac
FROM p JOIN f ON md5(p.para) = f.h
GROUP BY p.doc_id
"""


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal: documents reassembled without the paragraphs
    shared by >= 2 distinct docs (the planted footer must vanish from
    every document; unique halves survive in order)."""
    d = docs_with_paragraphs(spark, sf_dir)
    return pg.drop_duplicate_paragraphs(d).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "clean_text",
        F.col("n_dropped").cast("long").alias("n_dropped"),
    )


# string_agg(... ORDER BY para_idx) mirrors the Spark sort_array-of-structs
# reassembly; the struct-list unnest gives DuckDB the paragraph ordinal
ORACLE_PARAGRAPH_DEDUP = (
    """
WITH d AS ("""
    + _SQL_PARA_DOCS
    + """),
p AS (
  SELECT doc_id, u.para_idx AS para_idx, u.para AS para FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(parts)+1),
             i -> {'para_idx': i-1, 'para': trim(parts[CAST(i AS INT)])})) AS u
    FROM (SELECT doc_id, regexp_split_to_array(text, '\\n\\s*\\n') AS parts FROM d)
  )
  WHERE length(para) > 0
),
f AS (SELECT md5(para) AS h, count(DISTINCT doc_id) AS n_docs FROM p GROUP BY 1),
j AS (SELECT p.*, f.n_docs FROM p JOIN f ON md5(p.para) = f.h)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       coalesce(string_agg(CASE WHEN n_docs < 2 THEN para END,
                           chr(10)||chr(10) ORDER BY para_idx), '') AS clean_text,
       CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM j GROUP BY doc_id
"""
)


def q_paragraph_near_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Templated-boilerplate profile: the planted footer varies by {lang},
    so md5 sees per-slice duplicates only; the near path additionally
    connects footer VARIANTS across languages (LSH-verified one-hop
    neighborhood) before counting distinct documents."""
    d = docs_with_paragraphs(spark, sf_dir)
    return pg.paragraph_near_stats(
        d, threshold=0.6, shingle_n=4, bands=4, rows_per_band=8, n=3
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_paras").cast("long").alias("n_paras"),
        F.col("n_near_dup_paras").cast("long").alias("n_near_dup_paras"),
        "near_dup_ratio",
        "near_boilerplate_frac",
    )


_SQL_PARA_UNITS = f"""
  SELECT md5(para) AS doc_id, min(para) AS text FROM (
    SELECT trim(para) AS para
    FROM (SELECT unnest(regexp_split_to_array(text, '\\n\\s*\\n')) AS para
          FROM ({_SQL_PARA_DOCS}))
    WHERE length(trim(para)) > 0
  ) GROUP BY 1
"""

ORACLE_PARAGRAPH_NEAR_STATS = (
    _lsh_verified_pairs_ctes(
        bands=4, rows_per_band=8, shingle_n=4, n=3, source_sql=_SQL_PARA_UNITS
    )
    + f""",
pd AS ({_SQL_PARA_DOCS}),
p AS (
  SELECT doc_id, trim(para) AS para
  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\n\\s*\\n')) AS para FROM pd)
  WHERE length(trim(para)) > 0
),
dp AS (SELECT md5(para) AS h, doc_id, length(para) AS n_chars FROM p),
vpairs AS (SELECT id_a, id_b FROM vp WHERE j >= 0.6),
edges AS (
  SELECT id_a AS h, id_b AS nb FROM vpairs
  UNION ALL
  SELECT id_b AS h, id_a AS nb FROM vpairs
),
alln AS (
  SELECT h, doc_id FROM dp
  UNION ALL
  SELECT e.h, dp2.doc_id FROM edges e JOIN dp dp2 ON dp2.h = e.nb
),
nf AS (SELECT h, count(DISTINCT doc_id) AS n_near_docs FROM alln GROUP BY 1)
SELECT CAST(dp.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_paras,
       CAST(sum(CASE WHEN n_near_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_near_dup_paras,
       round(sum(CASE WHEN n_near_docs >= 2 THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS near_dup_ratio,
       round(sum(CASE WHEN n_near_docs >= 2 THEN n_chars ELSE 0 END)::DOUBLE
             / sum(n_chars), 6) AS near_boilerplate_frac
FROM dp JOIN nf USING (h)
GROUP BY dp.doc_id
"""
)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 13th document plays the leaked
    eval set; any document sharing a 13-word window with it is flagged.
    Eval gram-hash set broadcasts; documents never move."""
    from mariadb_to_graylog_spark.operators.decontam import contamination

    d = _documents(spark, sf_dir)
    eval_df = d.filter(F.col("doc_id") % 13 == 0)
    return contamination(d, eval_df, n=13)


def q_decontaminate_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-vs-corpus decontamination: same semantics and oracle as
    ``decontaminate`` but the reference gram set stays DISTRIBUTED (no
    driver collect, no broadcast pin, no size ceiling) -- the path for
    decontaminating one training shard against another at 100 TB."""
    from mariadb_to_graylog_spark.operators.decontam import contamination_bucketed

    d = _documents(spark, sf_dir)
    eval_df = d.filter(F.col("doc_id") % 13 == 0)
    return contamination_bucketed(d, eval_df, n=13)


ORACLE_DECONTAMINATE = """
WITH s AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM documents
),
g AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(str_split(s, ' ')) - 12, 0) + 1),
    i -> CAST('0x' || substr(md5(array_to_string(
           list_slice(str_split(s, ' '), CAST(i AS INT), CAST(i AS INT) + 12),
           ' ')), 1, 8) AS BIGINT)
  )) AS grams
  FROM s
),
ev AS (SELECT DISTINCT unnest(grams) AS h FROM g WHERE doc_id % 13 = 0),
dg AS (SELECT doc_id, unnest(grams) AS h FROM g),
hits AS (
  SELECT dg.doc_id, COUNT(*) AS n_hits
  FROM dg JOIN ev USING (h) GROUP BY dg.doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
"""


def q_decontaminate_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE contamination lives: one row per maximal verbatim run a
    document shares with the leaked eval slice (doc_id % 13 == 0) --
    start/end token in the doc, start token in the eval item, run length.
    The audit/appeal record behind ``decontaminate``'s boolean."""
    from mariadb_to_graylog_spark.operators.decontam import contamination_extents

    d = _documents(spark, sf_dir)
    eval_df = d.filter(F.col("doc_id") % 13 == 0)
    return contamination_extents(d, eval_df, n=13).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("eval_id").cast("long").alias("eval_id"),
        "doc_start",
        "doc_end",
        "eval_start",
        "run_tokens",
    )


ORACLE_DECONTAMINATE_EXTENTS = """
WITH s AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM documents
),
t AS (SELECT doc_id, str_split(s, ' ') AS toks FROM s),
g AS (
  SELECT doc_id, u.pos AS pos, u.h AS h FROM (
    SELECT doc_id, unnest(list_transform(
      range(1, greatest(len(toks) - 12, 0) + 1),
      i -> {'pos': i - 1,
            'h': CAST('0x' || substr(md5(array_to_string(
                   list_slice(toks, CAST(i AS INT), CAST(i AS INT) + 12),
                   ' ')), 1, 8) AS BIGINT)})) AS u
    FROM t
  )
),
m AS (
  SELECT d.doc_id AS doc_id, e.doc_id AS eval_id, d.pos AS pos_a,
         d.pos - e.pos AS diag
  FROM g d JOIN g e ON d.h = e.h AND e.doc_id % 13 = 0
),
i AS (
  SELECT doc_id, eval_id, diag, pos_a,
         pos_a - dense_rank() OVER (
           PARTITION BY doc_id, eval_id, diag ORDER BY pos_a) AS grp
  FROM m
),
r AS (
  SELECT doc_id, eval_id, diag, min(pos_a) AS doc_start,
         count(DISTINCT pos_a) AS c
  FROM i GROUP BY doc_id, eval_id, diag, grp
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(eval_id AS BIGINT) AS eval_id,
       CAST(doc_start AS BIGINT) AS doc_start,
       CAST(doc_start + c + 11 AS BIGINT) AS doc_end,
       CAST(doc_start - diag AS BIGINT) AS eval_start,
       CAST(c + 12 AS BIGINT) AS run_tokens
FROM r
"""


# Shared oracle CTE chain for the vs-eval-set coverage/trim twins: the
# leaked slice (doc_id % 13 = 0) plays the eval set, grams carry FULL md5
# (destructive family -- mirrors dedup._positioned_grams), CTE ``r`` ends
# at RAW per-doc cover intervals.  Like _verbatim_merged_ctes, deliberately
# NO interval-merge window in SQL (DuckDB's parallel window executor
# intermittently mis-evaluates the running-max-end frame); both consumers
# are order-independent (DISTINCT positions / membership in ANY interval).
_DECONTAM_COVER_CTES = """
WITH s AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM documents
),
t AS (SELECT doc_id, str_split(s, ' ') AS toks FROM s),
g AS (
  SELECT doc_id, u.pos AS pos, u.h AS h FROM (
    SELECT doc_id, unnest(list_transform(
      range(1, greatest(len(toks) - 12, 0) + 1),
      i -> {'pos': i - 1,
            'h': md5(array_to_string(
                   list_slice(toks, CAST(i AS INT), CAST(i AS INT) + 12),
                   ' '))})) AS u
    FROM t
  )
),
ev AS (SELECT DISTINCT h FROM g WHERE doc_id % 13 = 0),
r AS (
  SELECT g.doc_id AS id, pos AS s_, pos + 12 AS e_
  FROM g JOIN ev USING (h)
)"""


def q_decontaminate_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trim-vs-drop decision metric behind ``decontaminate``'s
    boolean: fraction of each document's tokens inside any >= 13-token
    run shared with the leaked eval slice, overlapping runs counted once
    (interval union).  Eval docs themselves report contamination 1.0 by
    construction; clean docs 0.0; every doc appears."""
    from mariadb_to_graylog_spark.operators.decontam import contamination_coverage

    d = _documents(spark, sf_dir)
    eval_df = d.filter(F.col("doc_id") % 13 == 0)
    return contamination_coverage(d, eval_df, n=13).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_tokens",
        "contaminated_tokens",
        "contamination",
    )


ORACLE_DECONTAMINATE_COVERAGE = (
    _DECONTAM_COVER_CTES
    + """,
tok AS (SELECT doc_id, len(toks) AS n_tokens FROM t),
cov AS (
  SELECT id, count(DISTINCT p) AS covered
  FROM (SELECT id, unnest(range(s_, e_ + 1)) AS p FROM r)
  GROUP BY id
)
SELECT CAST(tok.doc_id AS BIGINT) AS doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(coalesce(covered, 0) AS BIGINT) AS contaminated_tokens,
       round(coalesce(covered, 0)::DOUBLE / n_tokens, 6) AS contamination
FROM tok LEFT JOIN cov ON cov.id = tok.doc_id
"""
)


def q_decontaminate_coverage_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-vs-corpus contamination coverage: same semantics and oracle
    as ``decontaminate_coverage`` but the reference gram set stays
    DISTRIBUTED (``pin_broadcast=False`` -- no driver collect, no
    broadcast pin; the semi-join shuffles both sides on the gram hash and
    AQE picks the strategy) -- the shard-vs-shard trim-vs-drop metric at
    100 TB, mirroring ``decontaminate_bucketed``'s relationship to
    ``decontaminate``."""
    from mariadb_to_graylog_spark.operators.decontam import contamination_coverage

    d = _documents(spark, sf_dir)
    eval_df = d.filter(F.col("doc_id") % 13 == 0)
    return contamination_coverage(d, eval_df, n=13, pin_broadcast=False).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_tokens",
        "contaminated_tokens",
        "contamination",
    )


def q_trim_contaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surgical decontamination: every >= 13-token span shared with the
    leaked eval slice is removed, so mostly-clean documents survive
    curation instead of being dropped whole; eval docs husk to empty."""
    from mariadb_to_graylog_spark.operators.decontam import trim_contaminated_runs

    d = _documents(spark, sf_dir)
    eval_df = d.filter(F.col("doc_id") % 13 == 0)
    return trim_contaminated_runs(d, eval_df, n=13).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "trimmed_text",
        "n_tokens",
        "n_tokens_removed",
    )


# _DECONTAM_COVER_CTES extended through the kept-token filter (CTE ``k``):
# shared by the per-doc trim oracle and the per-source loss rollup.
_TRIM_KEPT_CTES = (
    _DECONTAM_COVER_CTES
    + """,
iv AS (
  SELECT id, list({'ms': s_, 'me': e_} ORDER BY s_, e_) AS ivs FROM r GROUP BY id
),
j AS (
  SELECT t.doc_id, t.toks,
         coalesce(iv.ivs, []::STRUCT(ms BIGINT, me BIGINT)[]) AS ivs
  FROM t LEFT JOIN iv ON iv.id = t.doc_id
),
k AS (
  SELECT doc_id, toks,
         list_filter(toks, (x, i) ->
           len(list_filter(ivs, v -> (i - 1) >= v.ms AND (i - 1) <= v.me)) = 0
         ) AS kept
  FROM j
)"""
)


ORACLE_TRIM_CONTAMINATED = (
    _TRIM_KEPT_CTES
    + """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       coalesce(array_to_string(kept, ' '), '') AS trimmed_text,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(toks) - len(kept) AS BIGINT) AS n_tokens_removed
FROM k
"""
)


def q_trim_loss_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source accounting of what surgical decontamination costs: for
    each ingest source, documents touched, tokens before/removed, docs
    husked to nothing, and the removed fraction -- the table a source-
    weighting decision reads after a trim pass (a source losing half its
    tokens to eval overlap is an eval-set mirror, not training data).

    Composition check: ``trim_contaminated_runs`` -> join back to the
    source dimension -> exact-integer rollup.  ``trimmed_text`` is
    projected AWAY before the join, so only (id, two longs) tuples ever
    shuffle -- document text moves zero times after the trim's own
    interval join-back."""
    from mariadb_to_graylog_spark.operators.decontam import trim_contaminated_runs

    d = _documents(spark, sf_dir)
    eval_df = d.filter(F.col("doc_id") % 13 == 0)
    t = trim_contaminated_runs(d, eval_df, n=13).select(
        "doc_id", "n_tokens", "n_tokens_removed"
    )
    return (
        t.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tokens_before"),
            F.sum("n_tokens_removed").cast("long").alias("tokens_removed"),
            F.sum(
                (F.col("n_tokens_removed") == F.col("n_tokens")).cast("long")
            )
            .cast("long")
            .alias("docs_husked"),
        )
        .withColumn(
            "removed_frac",
            F.round(F.col("tokens_removed") / F.col("tokens_before"), 6),
        )
    )


ORACLE_TRIM_LOSS_BY_SOURCE = (
    _TRIM_KEPT_CTES
    + """
SELECT d.source AS source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(toks)) AS BIGINT) AS tokens_before,
       CAST(sum(len(toks) - len(kept)) AS BIGINT) AS tokens_removed,
       CAST(sum(CASE WHEN len(kept) = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_husked,
       round(sum(len(toks) - len(kept))::DOUBLE / sum(len(toks)), 6)
         AS removed_frac
FROM k JOIN documents d USING (doc_id)
GROUP BY d.source
"""
)


def q_novelty_by_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-growth novelty trend: the documents table split into 8
    deterministic ingest batches (``doc_id % 8`` -- stand-in for crawl
    day/wave; the sandbox corpus has no ingest timestamp), per batch the
    fraction of its distinct 8-gram hashes unseen in every earlier
    batch.  Batch 0 is 100% novel by construction; later batches decay
    toward the generator's template-repetition floor."""
    d = _documents(spark, sf_dir)
    batched = d.select((F.col("doc_id") % 8).alias("batch"), "text")
    return dd.gram_novelty_trend(batched, batch_col="batch", text_col="text", n=8)


ORACLE_NOVELTY_BY_BATCH = """
WITH s AS (
  SELECT doc_id % 8 AS batch,
         lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM documents
),
g AS (
  SELECT DISTINCT batch, h FROM (
    SELECT batch, unnest(list_distinct(list_transform(
      range(1, greatest(len(str_split(s, ' ')) - 7, 0) + 1),
      i -> CAST('0x' || substr(md5(array_to_string(
             list_slice(str_split(s, ' '), CAST(i AS INT), CAST(i AS INT) + 7),
             ' ')), 1, 8) AS BIGINT)))) AS h
    FROM s)
),
tot AS (SELECT batch, CAST(count(*) AS BIGINT) AS n_grams FROM g GROUP BY batch),
fb AS (SELECT h, min(batch) AS batch FROM g GROUP BY h),
nov AS (SELECT batch, CAST(count(*) AS BIGINT) AS n_novel FROM fb GROUP BY batch)
SELECT CAST(tot.batch AS BIGINT) AS batch, n_grams,
       CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
       round(coalesce(n_novel, 0)::DOUBLE / n_grams, 6) AS novelty
FROM tot LEFT JOIN nov ON nov.batch = tot.batch
"""


def q_dedup_rate_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-flight dup-rate estimate: exact 8-gram occurrence count
    (pure arithmetic, no shuffle) vs distinct grams extrapolated from a
    deterministic 16-of-256 hash-bucket sample -- only 1/16 of the gram
    stream shuffles, the shape that makes "should we pay for the full
    dedup pass" answerable at 100 TB."""
    d = _documents(spark, sf_dir)
    return dd.sampled_dedup_rate(d, n=8, buckets=256, sample_buckets=16)


ORACLE_DEDUP_RATE_SAMPLED = """
WITH s AS (
  SELECT lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM documents
),
t AS (SELECT str_split(s, ' ') AS toks FROM s),
occ AS (
  SELECT CAST(coalesce(sum(greatest(len(toks) - 7, 0)), 0) AS BIGINT)
           AS n_gram_occurrences
  FROM t
),
g AS (
  SELECT DISTINCT h FROM (
    SELECT unnest(list_distinct(list_transform(
      range(1, greatest(len(toks) - 7, 0) + 1),
      i -> CAST('0x' || substr(md5(array_to_string(
             list_slice(toks, CAST(i AS INT), CAST(i AS INT) + 7),
             ' ')), 1, 8) AS BIGINT)))) AS h
    FROM t)
  WHERE h % 256 < 16
),
samp AS (SELECT CAST(count(*) AS BIGINT) AS n_sampled_distinct FROM g)
SELECT n_gram_occurrences, n_sampled_distinct,
       CAST(n_sampled_distinct * 16 AS BIGINT) AS est_distinct_grams,
       CASE WHEN n_gram_occurrences > 0
            THEN greatest(round(1 - (n_sampled_distinct * 16)::DOUBLE
                                    / n_gram_occurrences, 6), 0)
       END AS dup_rate_est
FROM occ, samp
"""


def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring: mean per-token surprisal under
    the corpus's own unigram LM, 64-token vocabulary so the OOV floor
    path is exercised (everything outside the head of the synthetic
    vocab distribution scores ln N)."""
    d = _documents(spark, sf_dir)
    return tx.unigram_surprisal(d, top_v=64)


ORACLE_UNIGRAM_SURPRISAL = """
WITH occ AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS tok
  FROM documents
),
tot AS (SELECT greatest(count(*), 1) AS n FROM occ),
freq AS (SELECT tok, count(*) AS cnt FROM occ GROUP BY tok),
vocab AS (
  SELECT tok,
         CAST(round((ln((SELECT n FROM tot)) - ln(cnt)) * 1000000) AS BIGINT)
           AS micro
  FROM freq ORDER BY cnt DESC, tok LIMIT 64
),
agg AS (
  SELECT occ.doc_id,
         count(*) AS n_tokens,
         sum(CASE WHEN micro IS NULL THEN 1 ELSE 0 END) AS n_oov,
         sum(coalesce(micro,
               CAST(round(ln((SELECT n FROM tot)) * 1000000) AS BIGINT)))
           AS sum_micro
  FROM occ LEFT JOIN vocab USING (tok) GROUP BY occ.doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(n_oov, 0) AS BIGINT) AS n_oov,
       CASE WHEN coalesce(n_tokens, 0) > 0
            THEN round(sum_micro::DOUBLE / (n_tokens * 1000000.0), 6)
       END AS surprisal
FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
"""


def q_paragraph_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-paragraph language segmentation over the paragraph corpus:
    its planted 'Subscribe to the <lang> newsletter' footer is English
    by stopword evidence, so every non-English page is a PLANTED
    code-switched document -- majority_ppm < 1e6 and n_langs >= 2,
    the mix a whole-doc language ID silently averages away."""
    d = docs_with_paragraphs(spark, sf_dir)
    return pg.paragraph_language_mix(d).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_paragraphs",
        "n_langs",
        "majority_lang",
        "majority_ppm",
    )


ORACLE_PARAGRAPH_LANG_MIX = f"""
WITH d AS ({{para_docs}}),
p AS (
  SELECT doc_id, trim(para) AS para
  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\n\\s*\\n')) AS para
        FROM d)
  WHERE length(trim(para)) > 0
),
s AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(para), '{_STOP_SQL["en"]}', 1)) AS BIGINT) AS en_score,
         CAST(len(regexp_extract_all(lower(para), '{_STOP_SQL["de"]}', 1)) AS BIGINT) AS de_score,
         CAST(len(regexp_extract_all(lower(para), '{_STOP_SQL["fr"]}', 1)) AS BIGINT) AS fr_score
  FROM p
),
pl AS (
  SELECT doc_id,
         CASE WHEN en_score >= de_score AND en_score >= fr_score THEN 'en'
              WHEN de_score >= fr_score THEN 'de' ELSE 'fr' END AS lang
  FROM s
),
c AS (SELECT doc_id, lang, count(*) AS cnt FROM pl GROUP BY 1, 2),
r AS (
  SELECT doc_id, lang, cnt,
         sum(cnt) OVER (PARTITION BY doc_id) AS total,
         count(*) OVER (PARTITION BY doc_id) AS n_langs,
         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, lang) AS rk
  FROM c
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(total AS BIGINT) AS n_paragraphs,
       CAST(n_langs AS BIGINT) AS n_langs,
       lang AS majority_lang,
       CAST(cnt * 1000000 // total AS BIGINT) AS majority_ppm
FROM r WHERE rk = 1
""".format(para_docs=_SQL_PARA_DOCS)


def q_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-crawl NEAR-dup gate: the new batch = fresh docs (every
    7th = 3) plus lightly-EDITED re-crawls of corpus docs (' q'
    appended -- invisible to the exact md5 lane); MinHash-LSH probe of
    the corpus bucket index, char-3-gram Jaccard verified on candidates,
    one decision row per batch doc (best match, ties to lowest corpus
    id)."""
    d = _documents(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") % 7 != 3).select("doc_id", "text")
    batch = (
        d.filter(F.col("doc_id") % 7 == 3)
        .select("doc_id", "text")
        .unionByName(
            d.filter(F.col("doc_id") % 21 == 0).select(
                (F.col("doc_id") + 400000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" q")).alias("text"),
            )
        )
    )
    out = dd.incremental_neardup(corpus, batch, threshold=0.5)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "decision",
        F.col("match_id").cast("long").alias("match_id"),
        "jaccard",
    )


def _incremental_neardup_oracle_sql(
    bands: int = 4,
    rows_per_band: int = 8,
    shingle_n: int = 4,
    n: int = 3,
    jt: float = 0.5,
) -> str:
    """Corpus-vs-batch twin of the fuzzy-decontam banding CTEs, plus the
    per-batch-doc best-match/kept decision tail."""
    params = dd._hash_params(bands * rows_per_band)
    sig_exprs = ",\n         ".join(
        f"list_min(list_transform(hashes, h -> (h * {a} + {b}) % {dd.MERSENNE31})) AS mh_{j}"
        for j, (a, b) in enumerate(params)
    )
    band_selects = "\n  UNION ALL\n".join(
        "  SELECT side, id, {b} AS band, ".format(b=b)
        + " || '-' || ".join(
            f"CAST(mh_{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
        )
        + " AS band_sig FROM sigs"
        for b in range(bands)
    )
    return f"""
WITH u AS (
  SELECT 'c' AS side, doc_id AS id, text FROM documents WHERE doc_id % 7 != 3
  UNION ALL
  SELECT 'b' AS side, doc_id AS id, text FROM documents WHERE doc_id % 7 = 3
  UNION ALL
  SELECT 'b' AS side, doc_id + 400000 AS id, text || ' q' AS text
  FROM documents WHERE doc_id % 21 = 0
),
h AS (
  SELECT side, id,
         list_transform(
           list_distinct(list_transform(
             range(1, greatest(length(text) - {shingle_n - 1}, 1) + 1),
             i -> substr(text, CAST(i AS INT), {shingle_n}))),
           s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)) AS hashes
  FROM u
),
sigs AS (
  SELECT side, id,
         {sig_exprs}
  FROM h
),
buckets AS (
{band_selects}
),
cand AS (
  SELECT DISTINCT b.id AS bid, c.id AS cid
  FROM buckets b JOIN buckets c
    ON b.band = c.band AND b.band_sig = c.band_sig
  WHERE b.side = 'b' AND c.side = 'c'
),
g AS (
  SELECT side, id,
         list_distinct(list_transform(
           range(1, greatest(length(text) - {n - 1}, 1) + 1),
           i -> substr(text, CAST(i AS INT), {n}))) AS grams
  FROM u
),
vp AS (
  SELECT cand.bid, cand.cid,
         round(CAST(len(list_intersect(gb.grams, gc.grams)) AS DOUBLE)
               / len(list_distinct(list_concat(gb.grams, gc.grams))), 6) AS j
  FROM cand
  JOIN g gb ON gb.side = 'b' AND gb.id = cand.bid
  JOIN g gc ON gc.side = 'c' AND gc.id = cand.cid
),
best AS (
  SELECT bid, cid, j,
         row_number() OVER (PARTITION BY bid ORDER BY j DESC, cid) AS rk
  FROM vp WHERE j >= {jt}
)
SELECT CAST(b.id AS BIGINT) AS doc_id,
       CASE WHEN best.bid IS NULL THEN 'kept' ELSE 'near_duplicate' END AS decision,
       CAST(best.cid AS BIGINT) AS match_id,
       best.j AS jaccard
FROM (SELECT id FROM u WHERE side = 'b') b
LEFT JOIN best ON best.bid = b.id AND best.rk = 1
"""


ORACLE_INCREMENTAL_NEARDUP = _incremental_neardup_oracle_sql()


def q_url_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier URL canonicalization: every doc cites its page URL;
    every 2nd doc also cites a www + trailing-slash + tracking-param +
    fragment variant, every 3rd doc a :443 + param-order pair -- all of
    which must COLLAPSE to one canonical fetch key (n_raw_forms > 1),
    the cheapest dedup in the pipeline (no bytes downloaded)."""
    d = _documents(spark, sf_dir)
    sid = F.col("doc_id").cast("string")
    base = F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/d/"), sid)
    text = F.concat(
        F.col("text"),
        F.lit(" p "),
        base,
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit(" v https://www."),
                F.col("source"),
                F.lit(".example.com/d/"),
                sid,
                F.lit("/?utm_source=mail&ref=x#top"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" q1 https://"),
                F.col("source"),
                F.lit(".example.com:443/d/"),
                sid,
                F.lit("?b=2&a=1 q2 "),
                base,
                F.lit("?a=1&b=2"),
            ),
        ).otherwise(F.lit("")),
    )
    planted = d.select("doc_id", text.alias("text"))
    return tx.url_variant_stats(planted).select(
        "canonical_url", "n_occurrences", "n_raw_forms", "n_docs"
    )


_SQL_CANON = """
         lower(regexp_extract(x, '^(https?)://', 1)) || '://' ||
         regexp_replace(lower(regexp_extract(x, '^https?://([^/:?#]+)', 1)),
                        '^www\\.', '') ||
         CASE WHEN regexp_extract(x, '^https?://[^/:?#]+:(\\d+)', 1) != ''
               AND NOT (lower(regexp_extract(x, '^(https?)://', 1)) = 'http'
                        AND regexp_extract(x, '^https?://[^/:?#]+:(\\d+)', 1) = '80')
               AND NOT (lower(regexp_extract(x, '^(https?)://', 1)) = 'https'
                        AND regexp_extract(x, '^https?://[^/:?#]+:(\\d+)', 1) = '443')
              THEN ':' || regexp_extract(x, '^https?://[^/:?#]+:(\\d+)', 1)
              ELSE '' END ||
         regexp_replace(regexp_extract(x, '^https?://[^/?#]+(/[^?#]*)', 1),
                        '/+$', '') ||
         CASE WHEN array_to_string(list_sort(list_filter(
                str_split(regexp_extract(x, '^https?://[^?#]*\\?([^#]*)', 1), '&'),
                p -> length(p) > 0 AND regexp_extract(p,
                  '^(utm_[a-z0-9]+|gclid|fbclid|msclkid|ref|mc_cid|mc_eid)=', 1) = '')),
                '&') != ''
              THEN '?' || array_to_string(list_sort(list_filter(
                str_split(regexp_extract(x, '^https?://[^?#]*\\?([^#]*)', 1), '&'),
                p -> length(p) > 0 AND regexp_extract(p,
                  '^(utm_[a-z0-9]+|gclid|fbclid|msclkid|ref|mc_cid|mc_eid)=', 1) = '')),
                '&')
              ELSE '' END
"""

ORACLE_URL_VARIANTS = f"""
WITH d AS (
  SELECT doc_id,
         text || ' p https://' || source || '.example.com/d/' || doc_id ||
         CASE WHEN doc_id % 2 = 0
              THEN ' v https://www.' || source || '.example.com/d/' || doc_id ||
                   '/?utm_source=mail&ref=x#top'
              ELSE '' END ||
         CASE WHEN doc_id % 3 = 0
              THEN ' q1 https://' || source || '.example.com:443/d/' || doc_id ||
                   '?b=2&a=1 q2 https://' || source || '.example.com/d/' ||
                   doc_id || '?a=1&b=2'
              ELSE '' END AS text
  FROM documents
),
occ AS (
  SELECT doc_id, unnest(regexp_extract_all(text,
    '(https?://[A-Za-z0-9](?:[A-Za-z0-9.\\-]*[A-Za-z0-9])?(?::\\d+)?(?:/[^\\s]*)?)',
    1)) AS x
  FROM d
),
c AS (
  SELECT doc_id, x AS raw,
         {_SQL_CANON} AS canonical_url
  FROM occ
)
SELECT canonical_url,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT md5(raw)) AS BIGINT) AS n_raw_forms,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM c
WHERE canonical_url != ''
GROUP BY canonical_url
"""


def q_image_ahash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup over REAL pixel decodes: every doc becomes
    a gradient PNG; every 5th is RE-ENCODED at a different zlib level
    (offset +699992 preserves id % 17, so seed and pixels are identical
    while the BYTES differ) -- md5-payload dedup is blind to the pair,
    the aHash groups them (n_images >= 2).  The oracle recomputes every
    hash from the closed-form pixel arithmetic in SQL, so the whole
    encode -> zlib decode -> 8x8 integer average-pool -> bit-pack chain
    must round-trip exactly."""
    from mariadb_to_graylog_spark.operators import multimodal as mm

    d = _documents(spark, sf_dir)
    base = d.select("doc_id", "text", F.lit(6).alias("level"))
    ren = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 699992).alias("doc_id"), "text", F.lit(1).alias("level")
    )
    media = mm.attach_gradient_images(
        base.unionByName(ren), level_col="level", seed_mod=17
    )
    return mm.image_ahash_groups(media).select(
        "ahash_hi", "ahash_lo", "n_images", F.col("min_id").cast("long").alias("min_id")
    )


ORACLE_IMAGE_AHASH_GROUPS = """
WITH imgs AS (
  SELECT doc_id AS media_id,
         octet_length(encode(text)) % 64 + 16 AS w,
         octet_length(encode(text)) % 48 + 12 AS h,
         doc_id % 17 AS seed
  FROM documents
  UNION ALL
  SELECT doc_id + 699992,
         octet_length(encode(text)) % 64 + 16,
         octet_length(encode(text)) % 48 + 12,
         doc_id % 17
  FROM documents WHERE doc_id % 5 = 0
),
xs AS (SELECT media_id, unnest(range(w)) AS x FROM imgs),
ys AS (SELECT media_id, unnest(range(h)) AS y FROM imgs),
pix AS (
  SELECT i.media_id,
         ((i.seed + 3 * x + 7 * y) % 256)
         + ((2 * i.seed + 5 * x + y) % 256)
         + ((3 * i.seed + x + 11 * y) % 256) AS gray,
         ((y * 8) // i.h) * 8 + (x * 8) // i.w AS k
  FROM imgs i JOIN xs USING (media_id) JOIN ys USING (media_id)
),
cells AS (
  SELECT media_id, k, SUM(gray) AS cs, COUNT(*) AS cc
  FROM pix GROUP BY 1, 2
),
tot AS (
  SELECT media_id, SUM(cs) AS ts, SUM(cc) AS tc FROM cells GROUP BY 1
),
hashes AS (
  SELECT c.media_id,
         SUM(CASE WHEN c.k >= 32 AND c.cs * t.tc >= t.ts * c.cc
                  THEN CAST(power(2, c.k - 32) AS BIGINT) ELSE 0 END) AS ahash_hi,
         SUM(CASE WHEN c.k < 32 AND c.cs * t.tc >= t.ts * c.cc
                  THEN CAST(power(2, c.k) AS BIGINT) ELSE 0 END) AS ahash_lo
  FROM cells c JOIN tot t USING (media_id)
  GROUP BY 1
)
SELECT CAST(ahash_hi AS BIGINT) AS ahash_hi,
       CAST(ahash_lo AS BIGINT) AS ahash_lo,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(min(media_id) AS BIGINT) AS min_id
FROM hashes GROUP BY 1, 2
"""


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-crawl text extraction: every doc wrapped in an HTML shell
    (title, style+script subtrees with decoy tags INSIDE them, nav
    links, entities; every 4th doc a 30-link farm) -- the stripped
    running text plus the link-density boilerplate signal.  The whole
    regexp chain (script/style subtree drop -> comment drop -> tag
    flatten -> entity decode -> whitespace collapse) must match the
    DuckDB twin byte-for-byte."""
    d = _documents(spark, sf_dir)
    html = F.concat(
        F.lit("<html><head><title>"),
        F.col("source"),
        F.lit('</title><style>p{color:red}</style><script>var x = 1 < 2 && "<p>";</script>'),
        F.lit('</head><body><!-- nav --><nav><a href="/a">Home</a> <a href="/b">About</a></nav><p>'),
        F.col("text"),
        F.lit(" &amp; more &lt;tags&gt; &nbsp;ok</p>"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.repeat(F.lit('<a href="/x">x</a> '), 30),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    planted = d.select("doc_id", html.alias("html"))
    return tx.html_extract_stats(planted).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "text",
        "n_tags",
        "n_links",
        "text_chars",
        "link_density_ppm",
    )


ORACLE_HTML_EXTRACT = r"""
WITH d AS (
  SELECT doc_id,
         '<html><head><title>' || source ||
         '</title><style>p{color:red}</style><script>var x = 1 < 2 && "<p>";</script>' ||
         '</head><body><!-- nav --><nav><a href="/a">Home</a> <a href="/b">About</a></nav><p>' ||
         text || ' &amp; more &lt;tags&gt; &nbsp;ok</p>' ||
         CASE WHEN doc_id % 4 = 0 THEN repeat('<a href="/x">x</a> ', 30)
              ELSE '' END ||
         '</body></html>' AS html
  FROM documents
),
s AS (
  SELECT doc_id, html,
         regexp_replace(regexp_replace(
           replace(replace(replace(replace(replace(replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(html, '(?is)<script\b.*?</script\s*>', ' ', 'g'),
                   '(?is)<style\b.*?</style\s*>', ' ', 'g'),
                 '(?s)<!--.*?-->', ' ', 'g'),
               '<[^>]+>', ' ', 'g'),
             '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             '&#39;', ''''), '&amp;', '&'),
           '\s+', ' ', 'g'), '^\s+|\s+$', '', 'g') AS text
  FROM d
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       text,
       CAST(len(regexp_extract_all(html, '(<)[A-Za-z/!]', 1)) AS BIGINT) AS n_tags,
       CAST(len(regexp_extract_all(html, '(?i)(<a)\b', 1)) AS BIGINT) AS n_links,
       CAST(length(text) AS BIGINT) AS text_chars,
       CAST(len(regexp_extract_all(html, '(?i)(<a)\b', 1)) * 1000000
            // greatest(length(text), 1) AS BIGINT) AS link_density_ppm
FROM s
"""


def q_audio_fp_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-robust audio dedup over REAL PCM decodes: every doc
    becomes a deterministic tone WAV; every 6th is re-uploaded with a
    LIST/INFO metadata chunk (offset +799986 preserves id % 23, so the
    PCM is identical while the BYTES differ) -- md5-payload dedup is
    blind, the band-energy fingerprint groups them.  The oracle
    recomputes every fingerprint from the closed-form sample arithmetic
    in SQL: the whole encode -> chunk-walk decode -> integer band-sum ->
    md5 chain must round-trip."""
    from mariadb_to_graylog_spark.operators import multimodal as mm

    d = _documents(spark, sf_dir)
    base = d.select("doc_id", "text", F.lit(False).alias("pad"))
    ren = d.filter(F.col("doc_id") % 6 == 0).select(
        (F.col("doc_id") + 799986).alias("doc_id"), "text", F.lit(True).alias("pad")
    )
    media = mm.attach_tone_clips(
        base.unionByName(ren), pad_col="pad", seed_mod=23
    )
    return mm.audio_fingerprint_groups(media).select(
        "fingerprint", "n_clips", F.col("min_id").cast("long").alias("min_id")
    )


ORACLE_AUDIO_FP_GROUPS = """
WITH clips AS (
  SELECT doc_id AS media_id,
         octet_length(encode(text)) % 256 + 64 AS n,
         doc_id % 23 AS seed
  FROM documents
  UNION ALL
  SELECT doc_id + 799986,
         octet_length(encode(text)) % 256 + 64,
         doc_id % 23
  FROM documents WHERE doc_id % 6 = 0
),
samp AS (
  SELECT media_id,
         unnest(range(n)) AS i,
         n, seed
  FROM clips
),
bands AS (
  SELECT media_id,
         (i * 8) // n AS b,
         SUM(abs(((seed + 1) * (i + 7) * (i + 13)) % 65536 - 32768)) AS es
  FROM samp GROUP BY 1, 2
),
fp AS (
  SELECT media_id,
         md5(string_agg(CAST(es AS VARCHAR), '-' ORDER BY b)) AS fingerprint
  FROM bands GROUP BY 1
)
SELECT fingerprint,
       CAST(count(*) AS BIGINT) AS n_clips,
       CAST(min(media_id) AS BIGINT) AS min_id
FROM fp GROUP BY 1
"""


def q_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eval-integrity rollup a benchmark owner reads: per eval SUITE
    (planted as eval_id % 3), how many of its items leaked into training
    docs at all, how many docs are affected, and the total/worst shared
    run -- the one-page summary over the per-span audit trail
    (`decontaminate_extents`).  Self-matches (a doc vs itself in the
    leaked slice) are excluded: the report is about cross-doc leakage."""
    from mariadb_to_graylog_spark.operators.decontam import contamination_extents

    d = _documents(spark, sf_dir)
    eval_df = d.filter(F.col("doc_id") % 13 == 0)
    ext = contamination_extents(d, eval_df, n=13).filter(
        F.col("doc_id") != F.col("eval_id")
    )
    ev = (
        eval_df.select((F.col("doc_id") % 3).cast("long").alias("suite"))
        .groupBy("suite")
        .agg(F.count(F.lit(1)).cast("long").alias("n_eval_items"))
    )
    lk = (
        ext.select(
            (F.col("eval_id") % 3).cast("long").alias("suite"),
            "eval_id",
            "doc_id",
            "run_tokens",
        )
        .groupBy("suite")
        .agg(
            F.count_distinct("eval_id").cast("long").alias("n_leaked_items"),
            F.count_distinct("doc_id").cast("long").alias("n_affected_docs"),
            F.sum("run_tokens").cast("long").alias("total_run_tokens"),
            F.max("run_tokens").cast("long").alias("max_run_tokens"),
        )
    )
    return ev.join(lk, "suite", "left").select(
        "suite",
        "n_eval_items",
        F.coalesce("n_leaked_items", F.lit(0)).cast("long").alias("n_leaked_items"),
        F.coalesce("n_affected_docs", F.lit(0)).cast("long").alias("n_affected_docs"),
        F.coalesce("total_run_tokens", F.lit(0)).cast("long").alias("total_run_tokens"),
        F.coalesce("max_run_tokens", F.lit(0)).cast("long").alias("max_run_tokens"),
    )


ORACLE_CONTAMINATION_REPORT = f"""
WITH ext AS ({ORACLE_DECONTAMINATE_EXTENTS}),
ev AS (
  SELECT CAST(doc_id % 3 AS BIGINT) AS suite, CAST(count(*) AS BIGINT) AS n_eval_items
  FROM documents WHERE doc_id % 13 = 0 GROUP BY 1
),
lk AS (
  SELECT CAST(eval_id % 3 AS BIGINT) AS suite,
         CAST(count(DISTINCT eval_id) AS BIGINT) AS n_leaked_items,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_affected_docs,
         CAST(SUM(run_tokens) AS BIGINT) AS total_run_tokens,
         CAST(MAX(run_tokens) AS BIGINT) AS max_run_tokens
  FROM ext WHERE doc_id != eval_id GROUP BY 1
)
SELECT ev.suite, ev.n_eval_items,
       CAST(coalesce(lk.n_leaked_items, 0) AS BIGINT) AS n_leaked_items,
       CAST(coalesce(lk.n_affected_docs, 0) AS BIGINT) AS n_affected_docs,
       CAST(coalesce(lk.total_run_tokens, 0) AS BIGINT) AS total_run_tokens,
       CAST(coalesce(lk.max_run_tokens, 0) AS BIGINT) AS max_run_tokens
FROM ev LEFT JOIN lk ON lk.suite = ev.suite
"""


def q_nfc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-form dedup: every doc gets a composed e-acute
    suffix; every 8th is re-added with the DECOMPOSED form (e + U+0301)
    -- raw md5 sees two documents, the screen shows one, NFC folds them
    (n_byte_forms = 2).  The copy-paste dupe class byte-level dedup is
    structurally blind to."""
    d = _documents(spark, sf_dir)
    base = d.select(
        "doc_id", F.concat(F.col("text"), F.lit(" caf\u00e9")).alias("text")
    )
    dec = d.filter(F.col("doc_id") % 8 == 0).select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" cafe\u0301")).alias("text"),
    )
    return tx.unicode_nfc_groups(base.unionByName(dec)).select(
        "nfc_md5",
        "n_docs",
        "n_byte_forms",
        F.col("min_id").cast("long").alias("min_id"),
    )


ORACLE_NFC_DEDUP = """
WITH d AS (
  SELECT doc_id, text || ' caf' || chr(233) AS text FROM documents
  UNION ALL
  SELECT doc_id + 900000, text || ' cafe' || chr(769)
  FROM documents WHERE doc_id % 8 = 0
),
k AS (
  SELECT doc_id, md5(text) AS raw_md5, md5(nfc_normalize(text)) AS nfc_md5
  FROM d
)
SELECT nfc_md5,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT raw_md5) AS BIGINT) AS n_byte_forms,
       CAST(min(doc_id) AS BIGINT) AS min_id
FROM k GROUP BY 1
"""


def q_pack_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attention-mask prep table: per packed sequence, its document
    segment structure (segments, boundary crossers in/out, fill) --
    every sequence but each shard's padded last one must be exactly
    full, and crossing counts are what a mask-isolated packing run
    budgets."""
    d = _documents(spark, sf_dir)
    return mx.pack_segment_stats(d, seq_len=256, shards=8, salt="pack1").select(
        "shard", "seq_idx", "n_segments", "n_crossing_in", "n_crossing_out",
        "filled_tokens",
    )


ORACLE_PACK_SEGMENTS = """
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(len(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS BIGINT) AS n_tokens,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'pack1'), 1, 8) AS BIGINT) AS h
  FROM documents
), s AS (
  SELECT doc_id, n_tokens, CAST(h % 8 AS BIGINT) AS shard,
         CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY h % 8 ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS stream_offset
  FROM t WHERE n_tokens > 0
), seg AS (
  SELECT shard, stream_offset, n_tokens,
         stream_offset + n_tokens - 1 AS last_tok,
         unnest(range(stream_offset // 256,
                      (stream_offset + n_tokens - 1) // 256 + 1)) AS seq_idx
  FROM s
)
SELECT shard, CAST(seq_idx AS BIGINT) AS seq_idx,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN stream_offset < seq_idx * 256 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_crossing_in,
       CAST(SUM(CASE WHEN last_tok > (seq_idx + 1) * 256 - 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_crossing_out,
       CAST(SUM(least(last_tok, (seq_idx + 1) * 256 - 1)
                - greatest(stream_offset, seq_idx * 256) + 1) AS BIGINT)
         AS filled_tokens
FROM seg GROUP BY 1, 2
"""


def q_web_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAW-CRAWL front half the curation pipelines assume already
    happened, composed end-to-end: HTML text extraction -> link-farm
    boilerplate gate (link_density_ppm > 20000) -> exact dedup on the
    EXTRACTED text (every 9th page re-ingested under a new id -- the
    same article behind two URLs) -> language ID + quality gate on the
    extracted text -> per-(lang, decision) accounting.  Decision
    priority: boilerplate > duplicate > low_quality > kept; lanes
    PARTITION the ingest exactly (the oracle checks the whole chain,
    the pytest checks conservation)."""
    d = _documents(spark, sf_dir)
    ingest = d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") % 9 == 0).select(
            (F.col("doc_id") + 950000).alias("doc_id"), "text"
        )
    )
    html = ingest.select(
        "doc_id",
        F.concat(
            F.lit('<html><body><nav><a href="/a">Home</a> <a href="/b">About</a></nav><p>'),
            F.col("text"),
            F.lit("</p>"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.repeat(F.lit('<a href="/x">x</a> '), 30),
            ).otherwise(F.lit("")),
            F.lit("</body></html>"),
        ).alias("html"),
    )
    ex = tx.html_extract_stats(html)
    scored = ex.select(
        "doc_id",
        "text",
        "link_density_ppm",
        F.md5("text").alias("_k"),
        tx.token_count(F.col("text")).cast("long").alias("n_tokens"),
        tx.quality_score(F.col("text")).alias("_q"),
    )
    lang = tx.lang_scores(scored).select(
        "doc_id", "link_density_ppm", "_k", "n_tokens", "_q", "pred_lang"
    )
    w = Window.partitionBy("_k")
    keepers = lang.filter(F.col("link_density_ppm") <= 20000).withColumn(
        "_min_id", F.min("doc_id").over(w)
    )
    lanes = lang.join(keepers.select("doc_id", "_min_id"), "doc_id", "left").select(
        "pred_lang",
        "n_tokens",
        F.when(F.col("link_density_ppm") > 20000, F.lit("boilerplate"))
        .when(F.col("doc_id") != F.col("_min_id"), F.lit("duplicate"))
        .when(F.col("_q") < 0.5, F.lit("low_quality"))
        .otherwise(F.lit("kept"))
        .alias("decision"),
    )
    return lanes.groupBy("pred_lang", "decision").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )


_SQL_INGEST_STRIP = r"""regexp_replace(regexp_replace(
           replace(replace(replace(replace(replace(replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(html, '(?is)<script\b.*?</script\s*>', ' ', 'g'),
                   '(?is)<style\b.*?</style\s*>', ' ', 'g'),
                 '(?s)<!--.*?-->', ' ', 'g'),
               '<[^>]+>', ' ', 'g'),
             '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             '&#39;', ''''), '&amp;', '&'),
           '\s+', ' ', 'g'), '^\s+|\s+$', '', 'g')"""

ORACLE_WEB_INGEST_PIPELINE = f"""
WITH ingest AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 950000, text FROM documents WHERE doc_id % 9 = 0
),
d AS (
  SELECT doc_id,
         '<html><body><nav><a href="/a">Home</a> <a href="/b">About</a></nav><p>' ||
         text || '</p>' ||
         CASE WHEN doc_id % 4 = 0 THEN repeat('<a href="/x">x</a> ', 30)
              ELSE '' END ||
         '</body></html>' AS html
  FROM ingest
),
ex AS (
  SELECT doc_id, html, {_SQL_INGEST_STRIP} AS text
  FROM d
),
m AS (
  SELECT doc_id, text,
         len(regexp_extract_all(html, '(?i)(<a)\\b', 1)) * 1000000
           // greatest(length(text), 1) AS ldp,
         md5(text) AS k,
         CAST(len(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS BIGINT)
           AS n_tok,
         CAST(len(regexp_extract_all(lower(text), '{_STOP_SQL["en"]}', 1)) AS BIGINT) AS en_score,
         CAST(len(regexp_extract_all(lower(text), '{_STOP_SQL["de"]}', 1)) AS BIGINT) AS de_score,
         CAST(len(regexp_extract_all(lower(text), '{_STOP_SQL["fr"]}', 1)) AS BIGINT) AS fr_score,
         CAST(len(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS DOUBLE) AS n_tok_d,
         CAST(len(regexp_extract_all(lower(text), '{_STOP_SQL["en"]}', 1)) AS DOUBLE) AS n_stop,
         CAST(len(regexp_extract_all(text, '([.,;:!?])', 1)) AS DOUBLE) AS n_punct
  FROM ex
),
q AS (
  SELECT *,
         CASE WHEN en_score >= de_score AND en_score >= fr_score THEN 'en'
              WHEN de_score >= fr_score THEN 'de' ELSE 'fr' END AS pred_lang,
         round(least(n_tok_d / 100.0, 1.0) * 0.5
           + (n_stop / greatest(n_tok_d, 1.0)) * 0.3
           + (1.0 - least(n_punct / greatest(n_tok_d, 1.0), 1.0)) * 0.2, 6) AS qual
  FROM m
),
mins AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY k) AS min_id
  FROM q WHERE ldp <= 20000
),
lanes AS (
  SELECT q.pred_lang, q.n_tok,
         CASE WHEN q.ldp > 20000 THEN 'boilerplate'
              WHEN q.doc_id != mins.min_id THEN 'duplicate'
              WHEN q.qual < 0.5 THEN 'low_quality'
              ELSE 'kept' END AS decision
  FROM q LEFT JOIN mins ON mins.doc_id = q.doc_id
)
SELECT pred_lang, decision,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM lanes GROUP BY 1, 2
"""


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-crawl ingestion gate: a NEW batch (every 7th base doc +
    the planted exact copies) is checked against the EXISTING corpus
    without re-deduping the corpus itself -- exact duplicate (md5
    membership) and >= 13-token verbatim overlap (distributed gram
    semi-probe, ``contamination`` with ``pin_broadcast=False`` because
    the reference side is corpus-sized).  Decisions: ``duplicate`` >
    ``overlap`` > ``kept``.  Only 32-byte hash keys and 8-byte gram
    hashes ever shuffle; document text never moves."""
    from mariadb_to_graylog_spark.operators.decontam import contamination

    d = docs_with_exact_dups(spark, sf_dir)
    is_new = (F.col("doc_id") % 7 == 3) | (F.col("doc_id") >= 100000)
    new = d.filter(is_new)
    corpus = d.filter(~is_new)
    corpus_hashes = (
        corpus.select(F.md5("text").alias("_h"))
        .distinct()
        .withColumn("_e", F.lit(1))
    )
    exact = (
        new.withColumn("_h", F.md5("text"))
        .join(corpus_hashes, "_h", "left")
        .select("doc_id", F.col("_e").isNotNull().alias("exact_dup"))
    )
    overlap = contamination(new, corpus, n=13, pin_broadcast=False).select(
        "doc_id", F.col("contaminated").alias("shares_gram")
    )
    return exact.join(overlap, "doc_id").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "exact_dup",
        "shares_gram",
        F.when(F.col("exact_dup"), F.lit("duplicate"))
        .when(F.col("shares_gram"), F.lit("overlap"))
        .otherwise(F.lit("kept"))
        .alias("decision"),
    )


ORACLE_INCREMENTAL_DEDUP = f"""
WITH d AS ({_SQL_EXACT_DUPS}),
new_ AS (SELECT * FROM d WHERE doc_id % 7 = 3 OR doc_id >= 100000),
corp AS (SELECT * FROM d WHERE NOT (doc_id % 7 = 3 OR doc_id >= 100000)),
ch AS (SELECT DISTINCT md5(text) AS h FROM corp),
s AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM new_
),
g AS (
  SELECT DISTINCT doc_id, h FROM (
    SELECT doc_id, unnest(list_distinct(list_transform(
      range(1, greatest(len(str_split(s, ' ')) - 12, 0) + 1),
      i -> CAST('0x' || substr(md5(array_to_string(
             list_slice(str_split(s, ' '), CAST(i AS INT), CAST(i AS INT) + 12),
             ' ')), 1, 8) AS BIGINT)))) AS h
    FROM s)
),
cs AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM corp
),
cg AS (
  SELECT DISTINCT h FROM (
    SELECT unnest(list_distinct(list_transform(
      range(1, greatest(len(str_split(s, ' ')) - 12, 0) + 1),
      i -> CAST('0x' || substr(md5(array_to_string(
             list_slice(str_split(s, ' '), CAST(i AS INT), CAST(i AS INT) + 12),
             ' ')), 1, 8) AS BIGINT)))) AS h
    FROM cs)
),
hit AS (SELECT DISTINCT g.doc_id FROM g JOIN cg USING (h))
SELECT CAST(n.doc_id AS BIGINT) AS doc_id,
       (ch.h IS NOT NULL) AS exact_dup,
       (hit.doc_id IS NOT NULL) AS shares_gram,
       CASE WHEN ch.h IS NOT NULL THEN 'duplicate'
            WHEN hit.doc_id IS NOT NULL THEN 'overlap'
            ELSE 'kept' END AS decision
FROM new_ n
LEFT JOIN ch ON ch.h = md5(n.text)
LEFT JOIN hit ON hit.doc_id = n.doc_id
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: every doc gets a deterministic position
    in one of 8 independent 256-token-sequence streams (hash order =
    epoch shuffle).  One hash exchange + shard-local sort; no global
    order anywhere."""
    d = _documents(spark, sf_dir)
    return mx.pack_sequences(d, seq_len=256, shards=8, salt="pack1")


ORACLE_PACK_SEQUENCES = """
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(len(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS BIGINT) AS n_tokens,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'pack1'), 1, 8) AS BIGINT) AS h
  FROM documents
), s AS (
  SELECT doc_id, n_tokens, CAST(h % 8 AS BIGINT) AS shard,
         CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY h % 8 ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS stream_offset
  FROM t
)
SELECT doc_id, shard, n_tokens, stream_offset,
       stream_offset // 256 AS seq_start,
       (stream_offset + greatest(n_tokens, 1) - 1) // 256 AS seq_end,
       (stream_offset + greatest(n_tokens, 1) - 1) // 256
         - stream_offset // 256 + 1 AS seqs_spanned
FROM s
"""


_MIX_BUDGET = 10_000


def q_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Square-root temperature mixing of a 10k-token training budget
    across sources: per-source weights, integer ppm keep rates, and the
    realized deterministic sample (n_kept / kept_tokens)."""
    d = _documents(spark, sf_dir)
    return mx.temperature_mixture(d, budget_tokens=_MIX_BUDGET, salt="temp1")


# the double chains (budget*s/S, then *1e6/n_tokens) are parenthesized
# identically to mixing.temperature_mixture_rates: sqrt is IEEE-exact,
# the micro-unit floor makes the normalizer an exact integer, and the
# remaining ops are correctly-rounded doubles in both engines.
ORACLE_SOURCE_MIXTURE = f"""
WITH docs AS (
  SELECT source, doc_id,
         CAST(len(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS BIGINT) AS t
  FROM documents
), per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(t) AS BIGINT) AS n_tokens
  FROM docs GROUP BY source
), sc AS (
  SELECT *, CAST(floor(sqrt(n_tokens) * 1000000.0) AS BIGINT) AS s FROM per
), tot AS (
  SELECT CAST(SUM(s) AS BIGINT) AS stot FROM sc
), r AS (
  SELECT sc.source, sc.n_docs, sc.n_tokens,
         round(CAST(sc.s AS DOUBLE) / tot.stot, 6) AS weight,
         CAST(floor(CAST({_MIX_BUDGET} AS DOUBLE) * sc.s / tot.stot) AS BIGINT)
           AS target_tokens,
         LEAST(1000000, CAST(floor(CAST({_MIX_BUDGET} AS DOUBLE) * sc.s / tot.stot
                                   * 1000000.0 / sc.n_tokens) AS BIGINT)) AS rate_ppm
  FROM sc, tot
), kept AS (
  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept,
         CAST(SUM(d.t) AS BIGINT) AS kept_tokens
  FROM docs d JOIN r ON d.source = r.source
  WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 'temp1'), 1, 8) AS BIGINT)
          % 1000000 < r.rate_ppm
  GROUP BY d.source
)
SELECT r.source, r.n_docs, r.n_tokens, r.weight, r.target_tokens, r.rate_ppm,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
FROM r LEFT JOIN kept k ON r.source = k.source
"""


def q_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The epoch manifest a training run reads, end-to-end: sqrt-
    temperature mixture rates -> deterministic ppm sample -> sequence
    packing of the kept docs (salt = epoch id).  Composition of existing
    operators, like curation_pipeline."""
    d = _documents(spark, sf_dir)
    rates = mx.temperature_mixture_rates(d, budget_tokens=_MIX_BUDGET)
    kept = d.join(
        F.broadcast(rates.select("source", "rate_ppm")), "source"
    ).filter(
        mx.temperature_sample_filter(F.col("doc_id"), F.col("rate_ppm"), "temp1")
    )
    return mx.pack_sequences(kept, seq_len=256, shards=4, salt="ep0")


ORACLE_TRAINING_MANIFEST = f"""
WITH docs AS (
  SELECT source, doc_id, text,
         CAST(len(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS BIGINT) AS t
  FROM documents
), per AS (
  SELECT source, CAST(SUM(t) AS BIGINT) AS n_tokens FROM docs GROUP BY source
), sc AS (
  SELECT *, CAST(floor(sqrt(n_tokens) * 1000000.0) AS BIGINT) AS s FROM per
), tot AS (
  SELECT CAST(SUM(s) AS BIGINT) AS stot FROM sc
), r AS (
  SELECT sc.source,
         LEAST(1000000, CAST(floor(CAST({_MIX_BUDGET} AS DOUBLE) * sc.s / tot.stot
                                   * 1000000.0 / sc.n_tokens) AS BIGINT)) AS rate_ppm
  FROM sc, tot
), kept AS (
  SELECT d.doc_id, d.t FROM docs d JOIN r ON d.source = r.source
  WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 'temp1'), 1, 8) AS BIGINT)
          % 1000000 < r.rate_ppm
), h AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, t AS n_tokens,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'ep0'), 1, 8) AS BIGINT) AS hk
  FROM kept
), s AS (
  SELECT doc_id, n_tokens, CAST(hk % 4 AS BIGINT) AS shard,
         CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY hk % 4 ORDER BY hk, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS stream_offset
  FROM h
)
SELECT doc_id, shard, n_tokens, stream_offset,
       stream_offset // 256 AS seq_start,
       (stream_offset + greatest(n_tokens, 1) - 1) // 256 AS seq_end,
       (stream_offset + greatest(n_tokens, 1) - 1) // 256
         - stream_offset // 256 + 1 AS seqs_spanned
FROM s
"""


def q_corpus_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-row effective-dataset-size report: total docs/tokens, the
    exact-dup excess a dedup pass deletes, the low-quality mass the
    quality gate cuts among survivors, and what is left -- the headline
    numbers a curation dashboard shows.  Non-overlapping accounting:
    dup excess first (non-min-id group members), then quality (< 0.5)
    among the keepers.  All exact integer sums; one md5-key exchange."""
    d = docs_with_exact_dups(spark, sf_dir)
    keyed = d.select(
        "doc_id",
        F.md5("text").alias("_h"),
        tx.token_count(F.col("text")).cast("long").alias("_t"),
        (tx.quality_score(F.col("text")) >= 0.5).alias("_ok"),
    )
    w = Window.partitionBy("_h")
    flags = keyed.select(
        "_t",
        "_ok",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("_keep"),
    )
    zero = F.lit(0).cast("long")

    def csum(cond, val):
        return F.coalesce(F.sum(F.when(cond, val)), zero).cast("long")

    return flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_t").cast("long").alias("n_tokens"),
        csum(~F.col("_keep"), F.lit(1)).alias("dup_excess_docs"),
        csum(~F.col("_keep"), F.col("_t")).alias("dup_excess_tokens"),
        csum(F.col("_keep") & ~F.col("_ok"), F.lit(1)).alias("low_quality_docs"),
        csum(F.col("_keep") & ~F.col("_ok"), F.col("_t")).alias(
            "low_quality_tokens"
        ),
        csum(F.col("_keep") & F.col("_ok"), F.lit(1)).alias("effective_docs"),
        csum(F.col("_keep") & F.col("_ok"), F.col("_t")).alias(
            "effective_tokens"
        ),
    )


ORACLE_CORPUS_ACCOUNTING = f"""
WITH d AS ({_SQL_EXACT_DUPS}),
qi AS (
  SELECT doc_id,
{_SQL_QUALITY_INPUTS}
  FROM d
),
k AS (
  SELECT d.doc_id, md5(d.text) AS h,
         CAST(len(regexp_extract_all(lower(d.text), '([a-z0-9]+)', 1)) AS BIGINT) AS t,
         ({_SQL_QUALITY_EXPR} >= 0.5) AS ok
  FROM d JOIN qi ON qi.doc_id = d.doc_id
),
m AS (
  SELECT t, ok, (doc_id = MIN(doc_id) OVER (PARTITION BY h)) AS keep FROM k
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(t) AS BIGINT) AS n_tokens,
       CAST(COALESCE(SUM(CASE WHEN NOT keep THEN 1 END), 0) AS BIGINT) AS dup_excess_docs,
       CAST(COALESCE(SUM(CASE WHEN NOT keep THEN t END), 0) AS BIGINT) AS dup_excess_tokens,
       CAST(COALESCE(SUM(CASE WHEN keep AND NOT ok THEN 1 END), 0) AS BIGINT) AS low_quality_docs,
       CAST(COALESCE(SUM(CASE WHEN keep AND NOT ok THEN t END), 0) AS BIGINT) AS low_quality_tokens,
       CAST(COALESCE(SUM(CASE WHEN keep AND ok THEN 1 END), 0) AS BIGINT) AS effective_docs,
       CAST(COALESCE(SUM(CASE WHEN keep AND ok THEN t END), 0) AS BIGINT) AS effective_tokens
FROM m
"""


def q_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency decision table: for each candidate sequence
    length, the padding cost of DOC-BOUNDARY packing (each document
    padded up to a whole number of sequences -- what an instruction-tuning
    run that refuses to split documents pays) next to the sequence count
    of boundary-free concat packing (``pack_sequences``).  waste_ppm is
    what the seq_len choice costs; the concat column is what giving up
    document boundaries buys back.

    Shape: one map-side token count, explode over the 3-element length
    literal, one tiny (3-group) aggregate.  Integer math end-to-end."""
    d = _documents(spark, sf_dir)
    per_doc = d.select(
        tx.token_count(F.col("text")).alias("n_tok")
    ).withColumn("seq_len", F.explode(F.array(*[F.lit(x) for x in (64, 128, 256)])))
    seqs_doc = F.ceil(F.col("n_tok") / F.col("seq_len")).cast("long")
    agg = per_doc.groupBy("seq_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.sum(seqs_doc).cast("long").alias("doc_bound_seqs"),
    )
    padded = F.col("doc_bound_seqs") * F.col("seq_len")
    return agg.select(
        F.col("seq_len").cast("long").alias("seq_len"),
        "n_docs",
        "total_tokens",
        "doc_bound_seqs",
        (padded - F.col("total_tokens")).cast("long").alias("pad_tokens"),
        F.floor((padded - F.col("total_tokens")) * 1000000 / padded)
        .cast("long")
        .alias("waste_ppm"),
        F.ceil(F.col("total_tokens") / F.col("seq_len"))
        .cast("long")
        .alias("concat_seqs"),
    )


ORACLE_PADDING_WASTE = """
WITH t AS (
  SELECT CAST(len(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS BIGINT)
           AS n_tok
  FROM documents
),
e AS (
  SELECT n_tok, CAST(unnest([64, 128, 256]) AS BIGINT) AS seq_len FROM t
),
a AS (
  SELECT seq_len, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         CAST(SUM(CAST(ceil(n_tok * 1.0 / seq_len) AS BIGINT)) AS BIGINT)
           AS doc_bound_seqs
  FROM e GROUP BY seq_len
)
SELECT seq_len, n_docs, total_tokens, doc_bound_seqs,
       doc_bound_seqs * seq_len - total_tokens AS pad_tokens,
       CAST(floor((doc_bound_seqs * seq_len - total_tokens) * 1000000.0
                  / (doc_bound_seqs * seq_len)) AS BIGINT) AS waste_ppm,
       CAST(ceil(total_tokens * 1.0 / seq_len) AS BIGINT) AS concat_seqs
FROM a
"""


def q_data_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split manifest: each doc's lane from
    an integer-ppm threshold on its salted id hash (98% / 1% / 1%), so
    membership is reproducible from (id, salt) alone -- no sampling
    state, no ordering dependence, stable under corpus growth (a doc
    never changes lanes when other docs arrive).  Per (source, split):
    docs + tokens, the table an eval-leakage audit starts from."""
    d = _documents(spark, sf_dir)
    ppm = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("split1"))), 1, 8), 16, 10)
        .cast("long")
        % 1000000
    )
    split = (
        F.when(ppm < 980000, F.lit("train"))
        .when(ppm < 990000, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select("source", split.alias("split"), tx.token_count(F.col("text")).alias("n_tok"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )


ORACLE_DATA_SPLIT = """
WITH t AS (
  SELECT source,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'split1'), 1, 8)
              AS BIGINT) % 1000000 AS ppm,
         CAST(len(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS BIGINT)
           AS n_tok
  FROM documents
)
SELECT source,
       CASE WHEN ppm < 980000 THEN 'train'
            WHEN ppm < 990000 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM t GROUP BY 1, 2
"""


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured field extraction -- the telemetry-pipeline stage
    the reference's fixed regexes never needed: pull the numeric ``k``
    out of each event's JSON ``props`` (every 11th event corrupted to
    non-JSON, which must surface as a counted NULL, not a crash), roll
    up per event type.  Map-side `get_json_object` (codegen JSON path,
    no UDF), one small aggregate."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    corrupted = ev.select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 11 == 0, F.lit("not json")).otherwise(
            F.col("props")
        ).alias("props"),
    )
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    per = corrupted.select("event_type", k.alias("k"))
    return per.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum((F.col("k").isNull()).cast("long")).cast("long").alias("n_bad_props"),
        F.sum("k").cast("long").alias("k_sum"),
        F.min("k").cast("long").alias("k_min"),
        F.max("k").cast("long").alias("k_max"),
    )


ORACLE_JSON_PROPS = """
WITH c AS (
  SELECT event_type,
         CASE WHEN event_id % 11 = 0 THEN 'not json' ELSE props END AS props
  FROM events
),
k AS (
  SELECT event_type,
         CASE WHEN json_valid(props)
              THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS k
  FROM c
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_props,
       CAST(SUM(k) AS BIGINT) AS k_sum,
       CAST(MIN(k) AS BIGINT) AS k_min,
       CAST(MAX(k) AS BIGINT) AS k_max
FROM k GROUP BY 1
"""


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document: integer micro-nat idf, exact
    tf x idf products, token tie-break -- the content-descriptor table
    (topic tags, index terms) every text corpus wants."""
    d = _documents(spark, sf_dir)
    return tx.tfidf_keywords(d, k=3).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "rank",
        "token",
        "tf",
        "score_micro",
    )


ORACLE_TFIDF_KEYWORDS = """
WITH occ AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS tok
  FROM documents
),
tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM occ GROUP BY 1, 2),
nd AS (SELECT greatest(count(DISTINCT doc_id), 1) AS n FROM documents),
idf AS (
  SELECT tok,
         CAST(round((ln((SELECT n FROM nd)) - ln(count(*))) * 1000000) AS BIGINT)
           AS idf_micro
  FROM tf GROUP BY tok
),
s AS (
  SELECT tf.doc_id, tf.tok, tf.tf,
         CAST(tf.tf * idf.idf_micro AS BIGINT) AS score_micro,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * idf.idf_micro DESC, tf.tok) AS rk
  FROM tf JOIN idf USING (tok)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(rk AS BIGINT) AS rank,
       tok AS token, tf, score_micro
FROM s WHERE rk <= 3
"""


def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly resampling with ZERO-FILLED gaps + trailing 3-hour
    integer sum -- the dashboard/alerting primitive (a silent hour is a
    row, not an absence); grid generated by sequence explode, windows
    ride the user partitioning."""
    from mariadb_to_graylog_spark.operators.sessions import (
        hourly_gapfilled_counts,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return hourly_gapfilled_counts(ev).select(
        F.col("user_id").cast("long").alias("user_id"),
        "hour_bucket",
        "n_events",
        "trailing_sum",
    )


ORACLE_TIMESERIES_GAPFILL = """
WITH ev AS (
  SELECT user_id,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS hb
  FROM events
),
counts AS (
  SELECT user_id, hb, CAST(count(*) AS BIGINT) AS n_events
  FROM ev GROUP BY 1, 2
),
span AS (SELECT user_id, min(hb) AS lo, max(hb) AS hi FROM ev GROUP BY 1),
grid AS (
  SELECT user_id, unnest(range(lo, hi + 1)) AS hour_bucket FROM span
),
filled AS (
  SELECT g.user_id, g.hour_bucket,
         CAST(coalesce(c.n_events, 0) AS BIGINT) AS n_events
  FROM grid g LEFT JOIN counts c
    ON c.user_id = g.user_id AND c.hb = g.hour_bucket
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(hour_bucket AS BIGINT) AS hour_bucket,
       n_events,
       CAST(SUM(n_events) OVER (
         PARTITION BY user_id ORDER BY hour_bucket
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing_sum
FROM filled
"""


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-model-free gibberish signal: per-doc character Shannon
    entropy in exact integer micro-nat arithmetic -- mojibake/base64
    noise runs hot, banner spam runs cold, no LM or frequency table
    needed."""
    d = _documents(spark, sf_dir)
    return tx.char_entropy(d).select(
        F.col("doc_id").cast("long").alias("doc_id"), "n_chars", "entropy"
    )


ORACLE_CHAR_ENTROPY = """
WITH occ AS (
  SELECT doc_id, unnest(list_filter(str_split(text, ''), c -> length(c) > 0)) AS ch
  FROM documents
),
c AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS cnt FROM occ GROUP BY 1, 2),
p AS (
  SELECT doc_id, cnt,
         cnt * CAST(round((ln(SUM(cnt) OVER (PARTITION BY doc_id))
                           - ln(cnt)) * 1000000) AS BIGINT) AS term,
         SUM(cnt) OVER (PARTITION BY doc_id) AS n
  FROM c
),
agg AS (
  SELECT doc_id, CAST(max(n) AS BIGINT) AS n_chars, SUM(term) AS sum_micro
  FROM p GROUP BY 1
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(agg.n_chars, 0) AS BIGINT) AS n_chars,
       CASE WHEN coalesce(agg.n_chars, 0) > 0
            THEN round(sum_micro::DOUBLE / (agg.n_chars * 1000000.0), 6)
       END AS entropy
FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
"""


def q_dup_cluster_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE duplication comes from: per verified near-dup cluster, the
    source spread (n_sources > 1 = cross-source syndication; 1 = a
    source re-publishing itself) and the id range -- the provenance
    table a source-weighting or takedown decision reads after
    ``dedup_groups`` labels the corpus.  Same verified-pair components
    as the groups query (shared oracle CTE block), joined back to the
    source dim, singleton groups excluded."""
    d = docs_with_near_dups(spark, sf_dir)
    pairs = dd.lsh_jaccard_verified(
        d, shingle_n=4, bands=4, rows_per_band=8, n=3, threshold=0.5
    )
    groups = dd.near_dedup_groups(d, pairs)
    j = groups.join(d.select("doc_id", "source"), "doc_id")
    agg = j.groupBy("group_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct("source").cast("long").alias("n_sources"),
        F.array_join(F.array_sort(F.collect_set("source")), ",").alias("sources"),
        F.min("doc_id").cast("long").alias("min_doc"),
        F.max("doc_id").cast("long").alias("max_doc"),
    )
    return agg.filter(F.col("n_docs") >= 2).select(
        F.col("group_id").cast("long").alias("group_id"),
        "n_docs",
        "n_sources",
        "sources",
        "min_doc",
        "max_doc",
    )


ORACLE_DUP_CLUSTER_PROVENANCE = (
    _DEDUP_GROUPS_CTES
    + f""",
dims AS ({_SQL_NEAR_DUPS}),
j AS (
  SELECT comp.doc_id, comp.group_id, dims.source
  FROM comp JOIN dims ON dims.doc_id = comp.doc_id
)
SELECT CAST(group_id AS BIGINT) AS group_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       array_to_string(list_sort(list_distinct(list(source))), ',') AS sources,
       CAST(min(doc_id) AS BIGINT) AS min_doc,
       CAST(max(doc_id) AS BIGINT) AS max_doc
FROM j GROUP BY 1 HAVING count(*) >= 2
"""
)


def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-vs-classifier confusion matrix: the corpus's METADATA lang
    column against the stopword classifier's prediction, with integer-ppm
    row shares -- the table that decides whether to trust upstream labels
    or re-classify (and where the classifier's en-bias lands zh docs,
    which have no Latin stopwords at all)."""
    d = _documents(spark, sf_dir)
    pred = tx.lang_scores(d).select("lang", "pred_lang")
    counts = pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w = Window.partitionBy("lang")
    return counts.select(
        "lang",
        "pred_lang",
        "n_docs",
        F.expr("n_docs * 1000000L div (sum(n_docs) OVER (PARTITION BY lang))")
        .cast("long")
        .alias("row_share_ppm"),
    )


ORACLE_LANG_CONFUSION = f"""
WITH s AS (
  SELECT lang,
         CAST(len(regexp_extract_all(lower(text), '{_STOP_SQL["en"]}', 1)) AS BIGINT) AS en_score,
         CAST(len(regexp_extract_all(lower(text), '{_STOP_SQL["de"]}', 1)) AS BIGINT) AS de_score,
         CAST(len(regexp_extract_all(lower(text), '{_STOP_SQL["fr"]}', 1)) AS BIGINT) AS fr_score
  FROM documents
),
p AS (
  SELECT lang,
         CASE WHEN en_score >= de_score AND en_score >= fr_score THEN 'en'
              WHEN de_score >= fr_score THEN 'de' ELSE 'fr' END AS pred_lang
  FROM s
),
c AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs FROM p GROUP BY 1, 2)
SELECT lang, pred_lang, n_docs,
       CAST(n_docs * 1000000 // (SUM(n_docs) OVER (PARTITION BY lang)) AS BIGINT)
         AS row_share_ppm
FROM c
"""


def q_fuzzy_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination: every 13th document plays a lightly-EDITED
    leaked eval item (' q' appended -- enough to defeat any exact 13-gram
    probe on the tail windows); MinHash-LSH candidates against the
    broadcast eval bucket table, verified with exact char-3-gram Jaccard
    AND eval-containment.  The paraphrase-robust lane of the
    decontamination family (exact lane: ``decontaminate`` /
    ``decontaminate_extents``)."""
    from mariadb_to_graylog_spark.operators.decontam import fuzzy_contamination

    d = _documents(spark, sf_dir)
    ev = d.filter(F.col("doc_id") % 13 == 0).select(
        F.col("doc_id").alias("eval_id"),
        F.concat(F.col("text"), F.lit(" q")).alias("text"),
    )
    out = fuzzy_contamination(d, ev)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("eval_id").cast("long").alias("eval_id"),
        "jaccard",
        "containment",
    )


def _fuzzy_decontam_oracle_sql(
    bands: int = 4,
    rows_per_band: int = 8,
    shingle_n: int = 4,
    n: int = 3,
    jt: float = 0.5,
    ct: float = 0.8,
) -> str:
    """Two-sided (doc x eval) twin of ``_minhash_cand_ctes``: signatures
    over the tagged union, buckets join doc-side x eval-side, verify with
    exact char-n-gram Jaccard + containment on candidates only."""
    params = dd._hash_params(bands * rows_per_band)
    sig_exprs = ",\n         ".join(
        f"list_min(list_transform(hashes, h -> (h * {a} + {b}) % {dd.MERSENNE31})) AS mh_{j}"
        for j, (a, b) in enumerate(params)
    )
    band_selects = "\n  UNION ALL\n".join(
        "  SELECT side, id, {b} AS band, ".format(b=b)
        + " || '-' || ".join(
            f"CAST(mh_{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
        )
        + " AS band_sig FROM sigs"
        for b in range(bands)
    )
    return f"""
WITH u AS (
  SELECT 'd' AS side, doc_id AS id, text FROM documents
  UNION ALL
  SELECT 'e' AS side, doc_id AS id, text || ' q' AS text
  FROM documents WHERE doc_id % 13 = 0
),
h AS (
  SELECT side, id,
         list_transform(
           list_distinct(list_transform(
             range(1, greatest(length(text) - {shingle_n - 1}, 1) + 1),
             i -> substr(text, CAST(i AS INT), {shingle_n}))),
           s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)) AS hashes
  FROM u
),
sigs AS (
  SELECT side, id,
         {sig_exprs}
  FROM h
),
buckets AS (
{band_selects}
),
cand AS (
  SELECT DISTINCT a.id AS did, b.id AS eid
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.band_sig = b.band_sig
  WHERE a.side = 'd' AND b.side = 'e'
),
g AS (
  SELECT side, id,
         list_distinct(list_transform(
           range(1, greatest(length(text) - {n - 1}, 1) + 1),
           i -> substr(text, CAST(i AS INT), {n}))) AS grams
  FROM u
),
vp AS (
  SELECT cand.did, cand.eid,
         CAST(len(list_intersect(gd.grams, ge.grams)) AS DOUBLE) AS inter,
         CAST(len(list_distinct(list_concat(gd.grams, ge.grams))) AS DOUBLE) AS uni,
         CAST(len(ge.grams) AS DOUBLE) AS ne
  FROM cand
  JOIN g gd ON gd.side = 'd' AND gd.id = cand.did
  JOIN g ge ON ge.side = 'e' AND ge.id = cand.eid
)
SELECT CAST(did AS BIGINT) AS doc_id, CAST(eid AS BIGINT) AS eval_id,
       round(inter / uni, 6) AS jaccard, round(inter / ne, 6) AS containment
FROM vp
WHERE round(inter / uni, 6) >= {jt} OR round(inter / ne, 6) >= {ct}
"""


ORACLE_FUZZY_DECONTAM = _fuzzy_decontam_oracle_sql()


def q_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination, the third lane of the family: every 17th
    embedding plays an eval item as a POSITIVE-SCALED copy (x2 -- zero
    shared surface n-grams with anything, identical SRP sign pattern, so
    the planted leak is caught deterministically); SRP-bucket candidates
    against the broadcast eval table, exact cosine verified in the same
    map task.  Exact lane: ``decontaminate``; edit-robust lane:
    ``fuzzy_decontam``; this one catches full paraphrases by embedding
    proximity."""
    from mariadb_to_graylog_spark.operators.decontam import semantic_contamination

    e = _embeddings(spark, sf_dir)
    ev = e.filter(F.col("vec_id") % 17 == 0).select(
        (F.col("vec_id") + 500000).alias("eval_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double") * 2).alias(
            "embedding"
        ),
    )
    out = semantic_contamination(e, ev, dim=64, bands=3, rows_per_band=8,
                                 threshold=0.97)
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("eval_id").cast("long").alias("eval_id"),
        "cos_sim",
    )


def _semantic_decontam_oracle_sql(
    dim: int = 64, bands: int = 3, rows_per_band: int = 8, threshold: float = 0.97
) -> str:
    """Two-sided (doc x eval) twin of ``_embed_lsh_oracle_sql``: SRP sign
    bits over the tagged union, buckets join doc-side x eval-side, exact
    cosine on candidates only."""
    planes = sim.srp_planes(bands * rows_per_band, dim)
    bit_exprs = ",\n         ".join(
        "CASE WHEN "
        + _DOT.format(a="embedding", b="[" + ",".join(str(x) for x in p) + "]")
        + f" >= 0 THEN 1 ELSE 0 END AS bit_{j}"
        for j, p in enumerate(planes)
    )
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT side, id, {b} AS band, "
        + " + ".join(
            f"bit_{b * rows_per_band + r} * {1 << r}" for r in range(rows_per_band)
        )
        + " AS bv FROM s"
        for b in range(bands)
    )
    return f"""
WITH u AS (
  SELECT 'd' AS side, vec_id AS id, embedding FROM embeddings
  UNION ALL
  SELECT 'e' AS side, vec_id + 500000 AS id,
         list_transform(embedding, x -> x::DOUBLE * 2) AS embedding
  FROM embeddings WHERE vec_id % 17 = 0
),
s AS (
  SELECT side, id,
         {bit_exprs}
  FROM u
),
b AS (
{band_selects}
),
cand AS (
  SELECT DISTINCT x.id AS did, y.id AS eid
  FROM b x JOIN b y ON x.band = y.band AND x.bv = y.bv
  WHERE x.side = 'd' AND y.side = 'e'
),
p AS (
  SELECT cand.did, cand.eid,
         {_cos_sql("ed.embedding", "ee.embedding")} AS cos_sim
  FROM cand
  JOIN u ed ON ed.side = 'd' AND ed.id = cand.did
  JOIN u ee ON ee.side = 'e' AND ee.id = cand.eid
)
SELECT CAST(did AS BIGINT) AS vec_id, CAST(eid AS BIGINT) AS eval_id, cos_sim
FROM p WHERE cos_sim >= {threshold}
"""


ORACLE_SEMANTIC_DECONTAM = _semantic_decontam_oracle_sql()


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup: every 7th doc is republished as a
    20-WORD quote (word-boundary prefix, so its 8-gram set is an exact
    subset of the source's -- containment 1.0 while whole-doc Jaccard is
    ~0.05, structurally invisible to the symmetric near-dup lanes);
    rare-gram candidates, exact set-containment verified on candidates
    only."""
    d = _documents(spark, sf_dir)
    quote = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.array_join(
            F.slice(F.split(tx.normalize_text(F.col("text")), " "), 1, 20), " "
        ).alias("text"),
    )
    both = d.select("doc_id", "text").unionByName(quote)
    out = dd.containment_pairs(both, n=8, rare_cap=20, threshold=0.9)
    return out.select(
        F.col("id_inner").cast("long").alias("id_inner"),
        F.col("id_outer").cast("long").alias("id_outer"),
        F.col("n_inner_grams").cast("long").alias("n_inner_grams"),
        F.col("n_inter").cast("long").alias("n_inter"),
        "containment",
    )


ORACLE_CONTAINMENT_PAIRS = """
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 300000,
         array_to_string(list_slice(
           str_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
           1, 20), ' ')
  FROM documents WHERE doc_id % 7 = 0
),
s AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM d
),
g0 AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(str_split(s, ' ')) - 7, 0) + 1),
    i -> CAST('0x' || substr(md5(array_to_string(
           list_slice(str_split(s, ' '), CAST(i AS INT), CAST(i AS INT) + 7),
           ' ')), 1, 8) AS BIGINT)
  )) AS grams
  FROM s
),
e AS (SELECT doc_id, unnest(grams) AS h FROM g0),
f AS (SELECT h FROM e GROUP BY h HAVING COUNT(*) <= 20),
r AS (SELECT e.doc_id, e.h FROM e JOIN f USING (h)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM r a JOIN r b ON a.h = b.h AND a.doc_id < b.doc_id
),
iv AS (
  SELECT cand.id_a, cand.id_b,
         CAST(len(list_intersect(ga.grams, gb.grams)) AS BIGINT) AS n_inter,
         CAST(len(ga.grams) AS BIGINT) AS n_a,
         CAST(len(gb.grams) AS BIGINT) AS n_b
  FROM cand
  JOIN g0 ga ON ga.doc_id = cand.id_a
  JOIN g0 gb ON gb.doc_id = cand.id_b
),
o AS (
  SELECT CASE WHEN n_a < n_b OR (n_a = n_b AND id_a < id_b)
              THEN id_a ELSE id_b END AS id_inner,
         CASE WHEN n_a < n_b OR (n_a = n_b AND id_a < id_b)
              THEN id_b ELSE id_a END AS id_outer,
         CASE WHEN n_a < n_b OR (n_a = n_b AND id_a < id_b)
              THEN n_a ELSE n_b END AS n_inner_grams,
         n_inter
  FROM iv
)
SELECT CAST(id_inner AS BIGINT) AS id_inner,
       CAST(id_outer AS BIGINT) AS id_outer,
       n_inner_grams, n_inter,
       round(CAST(n_inter AS DOUBLE) / n_inner_grams, 6) AS containment
FROM o
WHERE round(CAST(n_inter AS DOUBLE) / n_inner_grams, 6) >= 0.9
"""


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scores with the German documents as the in-domain
    target sample: per-doc mean log(p_target/p_raw) under hashed unigram
    models -- 'de' docs must rank above the corpus (tested as a
    property), giving quality-by-example selection without hand-tuned
    feature weights."""
    d = _documents(spark, sf_dir)
    target = d.filter(F.col("lang") == "de").select("text")
    out = tx.dsir_weights(d, target, n_buckets=8192)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_tokens",
        "log_ratio",
    )


ORACLE_DSIR_WEIGHTS = """
WITH occ AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS tok
  FROM documents
),
ro AS (
  SELECT CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 8192 AS b FROM occ
),
tocc AS (
  SELECT unnest(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS tok
  FROM documents WHERE lang = 'de'
),
tb AS (
  SELECT CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 8192 AS b FROM tocc
),
nr AS (SELECT greatest(count(*), 1) AS n FROM ro),
nt AS (SELECT greatest(count(*), 1) AS n FROM tb),
rc AS (SELECT b, count(*) AS cr FROM ro GROUP BY b),
tc AS (SELECT b, count(*) AS ct FROM tb GROUP BY b),
tbl AS (
  SELECT coalesce(rc.b, tc.b) AS b,
         CAST(round((ln(coalesce(ct, 0) + 1.0) - ln(coalesce(cr, 0) + 1.0)
               + ln((SELECT n FROM nr) + 8192.0)
               - ln((SELECT n FROM nt) + 8192.0)) * 1000000) AS BIGINT)
           AS micro
  FROM rc FULL JOIN tc ON rc.b = tc.b
),
agg AS (
  SELECT occ.doc_id,
         count(*) AS n_tokens,
         sum(micro) AS sum_micro
  FROM occ
  LEFT JOIN tbl
    ON tbl.b = CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 8192
  GROUP BY occ.doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
       CASE WHEN coalesce(n_tokens, 0) > 0
            THEN round(sum_micro::DOUBLE / (n_tokens * 1000000.0), 6)
       END AS log_ratio
FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
"""


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training statistic: the top-20 within-word adjacent
    character pairs by occurrence-weighted corpus frequency -- the merge
    candidates of BPE iteration one (Sennrich et al. 2016).  Pair
    explosion runs over the DISTINCT-word frequency table, never the
    corpus."""
    return tx.bpe_merge_candidates(_documents(spark, sf_dir), top_k=20)


ORACLE_BPE_MERGES = """
WITH w AS (
  SELECT unnest(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS word
  FROM documents
),
wc AS (
  SELECT word, COUNT(*) AS cnt FROM w GROUP BY word
),
p AS (
  SELECT word, cnt,
         unnest(list_transform(range(1, length(word)),
                               i -> substr(word, CAST(i AS INT), 2))) AS pair
  FROM wc WHERE length(word) >= 2
),
a AS (
  SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n_occurrences,
         CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words
  FROM p GROUP BY pair
),
r AS (
  SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, pair) AS BIGINT)
           AS rank,
         pair, n_occurrences, n_words
  FROM a
)
SELECT rank, pair, n_occurrences, n_words FROM r WHERE rank <= 20
"""


def q_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency transition QC per document: rare-bigram counts as
    the distributed stand-in for an n-gram LM perplexity gate.  Integer
    end-to-end (no float-sum-order hazard)."""
    out = tx.bigram_novelty(_documents(spark, sf_dir), rare_max=2)
    return out.withColumn("doc_id", F.col("doc_id").cast("long"))


ORACLE_BIGRAM_NOVELTY = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '([a-z0-9]+)', 1) AS toks
  FROM documents
),
o AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= 2
                     THEN list_transform(range(1, len(toks)),
                            i -> toks[CAST(i AS INT)] || ' '
                                 || toks[CAST(i AS INT) + 1])
                     ELSE [CAST(NULL AS VARCHAR)] END) AS bg
  FROM t
),
f AS (
  SELECT bg, COUNT(*) AS corpus_n FROM o WHERE bg IS NOT NULL GROUP BY bg
),
s AS (
  SELECT o.doc_id,
         COUNT(o.bg) AS n_bigrams,
         SUM(CASE WHEN f.corpus_n <= 2 THEN 1 ELSE 0 END) AS n_rare,
         MIN(f.corpus_n) AS min_count
  FROM o LEFT JOIN f USING (bg) GROUP BY o.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(n_rare AS BIGINT) AS n_rare,
       CAST(min_count AS BIGINT) AS min_count,
       CASE WHEN n_bigrams > 0
            THEN CAST(floor(n_rare * 1000000 / n_bigrams) AS BIGINT)
            ELSE NULL END AS novelty_ppm
FROM s
"""


def q_lsh_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding decision table over the near-dup corpus: expected detection
    probability of each (bands, rows) configuration, split hi/lo around
    the 0.5 similarity threshold, from the measured candidate-pair
    similarity profile.  What you consult before re-banding a 100 TB
    dedup run."""
    d = docs_with_near_dups(spark, sf_dir)
    return dd.lsh_banding_planner(d, shingle_n=4, bands=4, rows_per_band=8)


def _lsh_planner_oracle_sql(
    bands: int = 4,
    rows_per_band: int = 8,
    shingle_n: int = 4,
    grid: tuple = ((2, 16), (4, 8), (8, 4), (16, 2)),
    threshold: float = 0.5,
) -> str:
    k = bands * rows_per_band
    matches = " + ".join(
        f"CASE WHEN a.mh_{j} = b.mh_{j} THEN 1 ELSE 0 END" for j in range(k)
    )
    arms = []
    for b, r in grid:
        s_pow_r = "(" + " * ".join(["s"] * r) + ")"
        q = f"(1.0 - {s_pow_r})"
        miss = "(" + " * ".join([q] * b) + ")"
        ppm = f"CAST(floor((1.0 - {miss}) * 1000000) AS BIGINT)"
        s50 = int((1.0 / b) ** (1.0 / r) * 1_000_000)
        arms.append(
            f"  SELECT s, CAST({b} AS BIGINT) AS bands,"
            f" CAST({r} AS BIGINT) AS rows_per_band,"
            f" CAST({s50} AS BIGINT) AS s50_ppm, {ppm} AS ppm FROM est"
        )
    arms_sql = "\n  UNION ALL\n".join(arms)
    return (
        _minhash_cand_ctes(bands, rows_per_band, shingle_n)
        + f""",
est AS (
  SELECT round(({matches}) / {k}.0, 6) AS s
  FROM cand c JOIN sigs a ON a.id = c.id_a JOIN sigs b ON b.id = c.id_b
),
pp AS (
{arms_sql}
),
sums AS (
  SELECT bands, rows_per_band, s50_ppm,
         CAST(SUM(CASE WHEN s >= {threshold} THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
         CAST(SUM(CASE WHEN s >= {threshold} THEN 0 ELSE 1 END) AS BIGINT) AS n_lo,
         CAST(SUM(CASE WHEN s >= {threshold} THEN ppm ELSE 0 END) AS BIGINT) AS hi_sum,
         CAST(SUM(CASE WHEN s >= {threshold} THEN 0 ELSE ppm END) AS BIGINT) AS lo_sum
  FROM pp GROUP BY bands, rows_per_band, s50_ppm
)
SELECT bands, rows_per_band, s50_ppm, n_hi, n_lo,
       CASE WHEN n_hi > 0 THEN CAST(floor(hi_sum / n_hi) AS BIGINT)
            ELSE NULL END AS exp_detect_hi_ppm,
       CASE WHEN n_lo > 0 THEN CAST(floor(lo_sum / n_lo) AS BIGINT)
            ELSE NULL END AS exp_detect_lo_ppm
FROM sums
"""
    )


ORACLE_LSH_PLANNER = _lsh_planner_oracle_sql()


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-count vocabulary decision table: surviving words and token
    coverage at each frequency floor.  Sort-free (count thresholds, not
    top-V ranks) so no global window at 100 TB vocab."""
    return tx.vocab_coverage(_documents(spark, sf_dir))


ORACLE_VOCAB_COVERAGE = """
WITH w AS (
  SELECT unnest(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS word
  FROM documents
),
wc AS (
  SELECT word, COUNT(*) AS cnt FROM w GROUP BY word
),
tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS vocab
  FROM wc
),
a AS (
  SELECT t.min_count,
         CAST(SUM(CASE WHEN cnt >= t.min_count THEN 1 ELSE 0 END) AS BIGINT)
           AS n_words,
         CAST(SUM(CASE WHEN cnt >= t.min_count THEN cnt ELSE 0 END) AS BIGINT)
           AS n_occurrences
  FROM wc, (SELECT CAST(unnest([1, 2, 4, 8, 16]) AS BIGINT) AS min_count) t
  GROUP BY t.min_count
)
SELECT min_count, n_words, n_occurrences,
       CAST(floor(n_occurrences * 1000000 / total) AS BIGINT) AS coverage_ppm,
       CAST(floor(n_words * 1000000 / vocab) AS BIGINT) AS vocab_share_ppm
FROM a, tot
"""



def q_prefix_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation-family detection: documents + planted truncated
    re-crawls (first 12 normalized tokens of every 6th doc, new id);
    families keyed by the md5 of the normalized 10-token prefix."""
    d = _documents(spark, sf_dir)
    toks = F.split(tx.normalize_text(F.col("text")), " ")
    trunc = d.filter(F.col("doc_id") % 6 == 1).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.array_join(F.slice(toks, 1, 12), " ").alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    both = d.unionByName(trunc)
    return dd.prefix_dup_stats(both, k_tokens=10, min_docs=2).select(
        "prefix_h",
        "n_docs",
        "n_variants",
        F.col("min_doc_id").cast("long").alias("min_doc_id"),
    )


ORACLE_PREFIX_DUP_STATS = """
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000,
         array_to_string(list_slice(
           str_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
           1, 12), ' ')
  FROM documents WHERE doc_id % 6 = 1
),
s AS (
  SELECT doc_id,
         lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM d
),
k AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(str_split(s, ' '), 1, 10), ' '))
           AS prefix_h,
         md5(s) AS full_h
  FROM s
  WHERE len(str_split(s, ' ')) >= 10
)
SELECT prefix_h, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT full_h) AS BIGINT) AS n_variants,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM k GROUP BY prefix_h HAVING COUNT(*) >= 2
"""


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ingest-batch semantic drift: batch mean embedding vs corpus
    mean (cosine + norm), batches = vec_id % 4.  The embedding-space
    twin of ``novelty_by_batch``."""
    e = _embeddings(spark, sf_dir).select("vec_id", "embedding")
    return sim.embedding_drift(e, n_batches=4, dim=64)


def _embedding_drift_oracle_sql(n_batches: int = 4, dim: int = 64) -> str:
    avg_list = ", ".join(
        f"round(avg(embedding[{j + 1}]), 6)" for j in range(dim)
    )
    cos = _raw_cos_sql("bv", "cv")
    return f"""
WITH bm AS (
  SELECT CAST(vec_id % {n_batches} AS BIGINT) AS batch,
         CAST(COUNT(*) AS BIGINT) AS n_vecs,
         list_value({avg_list}) AS bv
  FROM embeddings GROUP BY 1
),
cm AS (SELECT list_value({avg_list}) AS cv FROM embeddings)
SELECT batch, n_vecs,
       round({cos}, 6) AS cos_to_corpus,
       round(sqrt({_DOT.format(a="bv", b="bv")}), 6) AS mean_norm
FROM bm, cm
"""


ORACLE_EMBEDDING_DRIFT = _embedding_drift_oracle_sql()


def q_cluster_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic corpus composition: deterministic k-means clusters over
    the embedding corpus joined to the document dim on id, rolled up to
    (cluster, source) with exact counts and integer-ppm shares within
    cluster and corpus -- the topic-balance table a mixing run reads
    next to ``source_mixture`` (which weighs sources by TOKENS; this
    weighs them by semantic CLUSTER).

    Scale shape: training shuffles k x dim partial sums only
    (``train_kmeans``), assignment is the zero-shuffle flat-literal
    argmax, the id join co-partitions two huge tables on their key
    (bucketable upstream), and after it only (bucket, source) pairs
    move.  Shares are derived from the <= k x |sources| count table."""
    e = _embeddings(spark, sf_dir).select("vec_id", "embedding")
    cents = sim.train_kmeans(e, 8, 2, "vec_id", "embedding", 64)
    assigned = sim.assign_buckets_local(e, cents, "embedding").select(
        "vec_id", "bucket"
    )
    d = _documents(spark, sf_dir).select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    counts = (
        assigned.join(d, "vec_id")
        .groupBy("bucket", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w_cluster = Window.partitionBy("bucket")
    w_all = Window.partitionBy()
    return counts.select(
        F.col("bucket").cast("long").alias("bucket"),
        "source",
        "n",
        F.floor(F.col("n") * 1000000 / F.sum("n").over(w_cluster))
        .cast("long")
        .alias("cluster_share_ppm"),
        F.floor(F.col("n") * 1000000 / F.sum("n").over(w_all))
        .cast("long")
        .alias("corpus_share_ppm"),
    )


ORACLE_CLUSTER_SOURCE_MIX = (
    _kmeans_train_ctes(n_centroids=8, iters=2, dim=64)
    + """,
m AS (
  SELECT f.bucket, d.source
  FROM fin f JOIN documents d ON d.doc_id = f.vec_id
),
c AS (
  SELECT CAST(bucket AS BIGINT) AS bucket, source,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM m GROUP BY 1, 2
)
SELECT bucket, source, n,
       CAST(floor(n * 1000000.0 / SUM(n) OVER (PARTITION BY bucket))
            AS BIGINT) AS cluster_share_ppm,
       CAST(floor(n * 1000000.0 / SUM(n) OVER ()) AS BIGINT)
         AS corpus_share_ppm
FROM c
"""
)


def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-membership ingest prefilter (the scale path in front of
    ``incremental_dedup``'s exact lane): the corpus's md5 keys collapse
    to a DISTINCT set-bit table (<= m rows no matter the corpus size;
    broadcast at m = 2^20, ~8 MB), each batch row probes it with k=3
    broadcast joins -- no batch shuffle, no corpus join -- and ONLY
    bloom-positive rows reach the exact md5 verify.  One-row report:
    batch size, positives, true dups, false positives, fill ratio.

    No-false-negative invariant (every exact dup IS bloom-positive) is
    guaranteed by construction and asserted in tests; the fill/FP
    columns are what an operator watches to resize m."""
    m_bits, k = 1 << 20, 3
    d = docs_with_exact_dups(spark, sf_dir)
    is_new = (F.col("doc_id") % 7 == 3) | (F.col("doc_id") >= 100000)
    new = d.filter(is_new)
    corpus = d.filter(~is_new)
    bloom = dd.bloom_build(corpus, F.col("text"), m_bits, k)
    probed = dd.bloom_probe(new, bloom, F.col("text"), m_bits, k)
    ch = corpus.select(F.md5("text").alias("_h")).distinct().withColumn(
        "_e", F.lit(1)
    )
    verified = (
        probed.filter(F.col("bloom_positive"))
        .withColumn("_h", F.md5("text"))
        .join(ch, "_h", "left")
        .select("doc_id", F.col("_e").isNotNull().alias("_dup"))
    )
    # join-free one-row report: each lane emits (name, value) rows, one
    # conditional aggregate pivots them (a constant-key join of one-row
    # frames constant-folds into a BNLJ; a union never joins at all)
    def _narrow(agg_df, names):
        pairs = []
        for n in names:
            pairs += [F.lit(n), F.col(n).cast("long")]
        return agg_df.select(F.explode(F.create_map(*pairs)).alias("m", "v"))

    lanes = (
        _narrow(
            probed.agg(
                F.count(F.lit(1)).cast("long").alias("n_batch"),
                F.sum(F.col("bloom_positive").cast("long")).alias(
                    "n_positive"
                ),
            ),
            ["n_batch", "n_positive"],
        )
        .unionByName(
            _narrow(
                verified.agg(
                    F.sum(F.col("_dup").cast("long")).alias("n_exact_dup"),
                    F.sum((~F.col("_dup")).cast("long")).alias("n_false_pos"),
                ),
                ["n_exact_dup", "n_false_pos"],
            )
        )
        .unionByName(
            _narrow(
                bloom.agg(F.count(F.lit(1)).cast("long").alias("bits_set")),
                ["bits_set"],
            )
        )
    )

    def _pick(n: str):
        return F.max(F.when(F.col("m") == n, F.col("v"))).alias(n)

    return lanes.groupBy().agg(
        _pick("n_batch"),
        _pick("n_positive"),
        _pick("n_exact_dup"),
        _pick("n_false_pos"),
        _pick("bits_set"),
    ).withColumn(
        "fill_ppm",
        F.floor(F.col("bits_set") * 1000000 / F.lit(m_bits)).cast("long"),
    )


ORACLE_BLOOM_PREFILTER = f"""
WITH d AS ({_SQL_EXACT_DUPS}),
new_ AS (SELECT * FROM d WHERE doc_id % 7 = 3 OR doc_id >= 100000),
corp AS (SELECT * FROM d WHERE NOT (doc_id % 7 = 3 OR doc_id >= 100000)),
cpos AS (
  SELECT DISTINCT unnest([
    CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 1048576,
    CAST('0x' || substr(md5(text), 9, 8) AS BIGINT) % 1048576,
    CAST('0x' || substr(md5(text), 17, 8) AS BIGINT) % 1048576]) AS pos
  FROM corp
),
probe AS (
  SELECT doc_id, md5(text) AS h,
         CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 1048576 AS p0,
         CAST('0x' || substr(md5(text), 9, 8) AS BIGINT) % 1048576 AS p1,
         CAST('0x' || substr(md5(text), 17, 8) AS BIGINT) % 1048576 AS p2
  FROM new_
),
flags AS (
  SELECT doc_id, h,
         p0 IN (SELECT pos FROM cpos)
         AND p1 IN (SELECT pos FROM cpos)
         AND p2 IN (SELECT pos FROM cpos) AS positive
  FROM probe
),
ch AS (SELECT DISTINCT md5(text) AS h FROM corp),
v AS (
  SELECT f.doc_id, (ch.h IS NOT NULL) AS dup
  FROM flags f LEFT JOIN ch ON ch.h = f.h
  WHERE f.positive
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM flags) AS n_batch,
       (SELECT CAST(SUM(CASE WHEN positive THEN 1 ELSE 0 END) AS BIGINT)
        FROM flags) AS n_positive,
       (SELECT CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) FROM v)
         AS n_exact_dup,
       (SELECT CAST(SUM(CASE WHEN dup THEN 0 ELSE 1 END) AS BIGINT) FROM v)
         AS n_false_pos,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cpos) AS bits_set,
       (SELECT CAST(floor(COUNT(*) * 1000000.0 / 1048576) AS BIGINT)
        FROM cpos) AS fill_ppm
"""


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dedup: same verified-pair connected components
    as ``dedup_groups``, but the survivor is the highest-quality cluster
    member (ties -> lowest id), not the lowest id."""
    d = docs_with_near_dups(spark, sf_dir)
    pairs = dd.lsh_jaccard_verified(
        d, shingle_n=4, bands=4, rows_per_band=8, n=3, threshold=0.5
    )
    out = dd.near_dedup_keep_best(d, pairs, tx.quality_score(F.col("text")))
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("group_id").cast("long").alias("group_id"),
        "score",
        "keep",
    )


# identical component labels as ORACLE_DEDUP_GROUPS (shared CTE block),
# then the same rounded quality expression ranks the members: both
# engines order by a 6-digit-rounded double, so ranks cannot diverge.
ORACLE_DEDUP_KEEP_BEST = (
    _DEDUP_GROUPS_CTES
    + f""",
qs AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
{_SQL_QUALITY_INPUTS}
  FROM d
),
sc AS (
  SELECT doc_id, {_SQL_QUALITY_EXPR} AS score FROM qs
),
rk AS (
  SELECT c.doc_id, c.group_id, s.score,
         ROW_NUMBER() OVER (PARTITION BY c.group_id
                            ORDER BY s.score DESC, c.doc_id) AS rn
  FROM comp c JOIN sc s USING (doc_id)
)
SELECT doc_id, group_id, score, (rn = 1) AS keep FROM rk
"""
)


def q_dup_cluster_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size distribution of the exact-dup corpus: the dedup
    report's first chart (singleton share, heavy tail, excess docs)."""
    d = docs_with_exact_dups(spark, sf_dir)
    _, groups = dd.exact_dedup(d)
    return dd.dup_cluster_histogram(groups)


ORACLE_DUP_CLUSTER_HIST = f"""
WITH d AS ({_SQL_EXACT_DUPS}),
g AS (
  SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS n
  FROM d GROUP BY md5(text)
)
SELECT n AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(n - 1) AS BIGINT) AS excess_docs
FROM g GROUP BY n
"""


def q_token_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-count distribution (exact interpolated
    percentiles -- the oracle path; approx_percentile is the 100 TB
    default, tested against this within its rank-error bound)."""
    d = _documents(spark, sf_dir)
    return tx.token_length_percentiles(d, by="lang", ps=(0.5, 0.9, 0.99))


ORACLE_TOKEN_PERCENTILES = """
WITH s AS (
  SELECT lang,
         CAST(len(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS BIGINT) AS n
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       round(AVG(n), 6) AS mean_tokens,
       round(quantile_cont(n, 0.5), 6) AS p50,
       round(quantile_cont(n, 0.9), 6) AS p90,
       round(quantile_cont(n, 0.99), 6) AS p99
FROM s GROUP BY lang
"""


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed product flow a training-data team actually runs:
    exact dedup (keep min-id per identical text) -> quality gate
    (score >= 0.5) -> benchmark decontamination (drop docs sharing a
    13-word window with the eval set) -> stratified per-language sampling
    -> per-language accounting.  Every stage is an existing operator;
    the oracle re-derives the whole chain in SQL, so the COMPOSITION is
    checked, not just the parts."""
    from mariadb_to_graylog_spark.operators.decontam import contamination

    d = docs_with_exact_dups(spark, sf_dir)
    deduped, _ = dd.exact_dedup(d)
    q = deduped.withColumn("quality", tx.quality_score(F.col("text"))).filter(
        F.col("quality") >= 0.5
    )
    eval_df = _documents(spark, sf_dir).filter(F.col("doc_id") % 13 == 0)
    bad = contamination(q, eval_df, n=13).filter("contaminated").select("doc_id")
    # no forced broadcast: the flagged set is usually tiny (AQE converts
    # to broadcast at runtime) but is corpus-dependent -- an adversarial
    # corpus could flag everything, and a forced broadcast would OOM
    clean = q.join(bad, "doc_id", "left_anti")
    kept = clean.filter(
        tx.stratified_sample_filter(
            F.col("doc_id"), F.col("lang"), _STRATA_RATES, salt="cur"
        )
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


def q_curation_trim_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salvage-not-drop curation flow: exact dedup -> SURGICAL
    eval-span trim (``trim_contaminated_runs``; the sibling
    ``curation_pipeline`` drops contaminated docs whole) -> quality
    RE-SCORED on the trimmed text -> keep non-husk docs passing the gate
    -> per-language accounting including the tokens the trim recovered.
    Checks the COMPOSITION: trim feeding a downstream scorer is where
    token-stream mismatches would surface."""
    from mariadb_to_graylog_spark.operators.decontam import trim_contaminated_runs

    d = docs_with_exact_dups(spark, sf_dir)
    deduped, _ = dd.exact_dedup(d)
    eval_df = _documents(spark, sf_dir).filter(F.col("doc_id") % 13 == 0)
    t = trim_contaminated_runs(deduped, eval_df, n=13).join(
        deduped.select("doc_id", "lang"), "doc_id"
    )
    scored = t.withColumn("quality", tx.quality_score(F.col("trimmed_text")))
    kept = scored.filter(
        (F.col("quality") >= 0.5) & (F.col("n_tokens_removed") < F.col("n_tokens"))
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("n_tokens_removed").cast("long").alias("tokens_trimmed"),
        F.sum(F.col("n_tokens") - F.col("n_tokens_removed"))
        .cast("long")
        .alias("kept_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


ORACLE_CURATION_TRIM_PIPELINE = f"""
WITH d AS ({_SQL_EXACT_DUPS}),
dd AS (
  SELECT d.* FROM d
  JOIN (SELECT md5(text) AS h, MIN(doc_id) AS keep_id FROM d GROUP BY md5(text)) k
    ON md5(d.text) = k.h AND d.doc_id = k.keep_id
),
t AS (
  SELECT doc_id, lang,
         str_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')
           AS toks
  FROM dd
),
g AS (
  SELECT doc_id, u.pos AS pos, u.h AS h FROM (
    SELECT doc_id, unnest(list_transform(
      range(1, greatest(len(toks) - 12, 0) + 1),
      i -> {{'pos': i - 1,
            'h': md5(array_to_string(
                   list_slice(toks, CAST(i AS INT), CAST(i AS INT) + 12),
                   ' '))}})) AS u
    FROM t
  )
),
evn AS (
  SELECT str_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')
           AS toks
  FROM documents WHERE doc_id % 13 = 0
),
ev AS (
  SELECT DISTINCT unnest(list_transform(
    range(1, greatest(len(toks) - 12, 0) + 1),
    i -> md5(array_to_string(
           list_slice(toks, CAST(i AS INT), CAST(i AS INT) + 12), ' '))
  )) AS h
  FROM evn
),
r AS (SELECT g.doc_id AS id, pos AS s_, pos + 12 AS e_ FROM g JOIN ev USING (h)),
iv AS (
  SELECT id, list({{'ms': s_, 'me': e_}} ORDER BY s_, e_) AS ivs FROM r GROUP BY id
),
k2 AS (
  SELECT t.doc_id, t.lang, t.toks,
         list_filter(t.toks, (x, i) ->
           len(list_filter(
             coalesce(iv.ivs, []::STRUCT(ms BIGINT, me BIGINT)[]),
             v -> (i - 1) >= v.ms AND (i - 1) <= v.me)) = 0
         ) AS kept
  FROM t LEFT JOIN iv ON iv.id = t.doc_id
),
tr AS (
  SELECT doc_id, lang,
         coalesce(array_to_string(kept, ' '), '') AS text,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(toks) - len(kept) AS BIGINT) AS removed
  FROM k2
),
qs AS (
  SELECT doc_id, lang, n_tokens, removed,
{_SQL_QUALITY_INPUTS}
  FROM tr
),
kept AS (
  SELECT lang, n_tokens, removed, {_SQL_QUALITY_EXPR} AS quality
  FROM qs
  WHERE {_SQL_QUALITY_EXPR} >= 0.5 AND removed < n_tokens
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(sum(removed) AS BIGINT) AS tokens_trimmed,
       CAST(sum(n_tokens - removed) AS BIGINT) AS kept_tokens,
       round(AVG(quality), 6) AS avg_quality
FROM kept GROUP BY lang
"""


ORACLE_CURATION_PIPELINE = """
WITH d AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 100000, text, lang, source, n_chars
  FROM documents WHERE doc_id % 5 = 0
),
dd AS (
  SELECT d.* FROM d
  JOIN (SELECT md5(text) AS h, MIN(doc_id) AS keep_id FROM d GROUP BY md5(text)) k
    ON md5(d.text) = k.h AND d.doc_id = k.keep_id
),
qs AS (
  SELECT *, round(least(n_tok / 100.0, 1.0) * 0.5
               + (n_stop / greatest(n_tok, 1.0)) * 0.3
               + (1.0 - least(n_punct / greatest(n_tok, 1.0), 1.0)) * 0.2, 6)
            AS quality
  FROM (
    SELECT dd.*,
           CAST(len(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS DOUBLE) AS n_tok,
           CAST(len(regexp_extract_all(lower(text), '\\b(the|a|of|to|and|in)\\b', 1)) AS DOUBLE) AS n_stop,
           CAST(len(regexp_extract_all(text, '([.,;:!?])', 1)) AS DOUBLE) AS n_punct
    FROM dd
  )
),
q AS (SELECT * FROM qs WHERE quality >= 0.5),
norm AS (
  SELECT doc_id, lang, quality,
         lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM q
),
qg AS (
  SELECT doc_id, lang, quality, list_distinct(list_transform(
    range(1, greatest(len(str_split(s, ' ')) - 12, 0) + 1),
    i -> CAST('0x' || substr(md5(array_to_string(
           list_slice(str_split(s, ' '), CAST(i AS INT), CAST(i AS INT) + 12),
           ' ')), 1, 8) AS BIGINT)
  )) AS grams
  FROM norm
),
evn AS (
  SELECT lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM documents WHERE doc_id % 13 = 0
),
ev AS (
  SELECT DISTINCT unnest(list_transform(
    range(1, greatest(len(str_split(s, ' ')) - 12, 0) + 1),
    i -> CAST('0x' || substr(md5(array_to_string(
           list_slice(str_split(s, ' '), CAST(i AS INT), CAST(i AS INT) + 12),
           ' ')), 1, 8) AS BIGINT)
  )) AS h
  FROM evn
),
bad AS (
  SELECT DISTINCT g.doc_id
  FROM (SELECT doc_id, unnest(grams) AS h FROM qg) g JOIN ev USING (h)
),
kept AS (
  SELECT qg.doc_id, qg.lang, qg.quality
  FROM qg
  WHERE qg.doc_id NOT IN (SELECT doc_id FROM bad)
    AND CAST('0x' || substr(md5(CAST(qg.doc_id AS VARCHAR) || 'cur'), 1, 8) AS BIGINT) % 100
        < CASE qg.lang WHEN 'en' THEN 50 WHEN 'de' THEN 20 WHEN 'fr' THEN 10 ELSE 0 END
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       round(AVG(quality), 6) AS avg_quality
FROM kept GROUP BY lang
"""


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip proof of the REAL stdlib media codecs: attach_payload
    writes fully valid PNG/WAV byte streams whose header parameters are
    closed-form in (text byte length, doc_id); decode_media_meta parses
    the BYTES back with struct.unpack; the oracle recomputes the closed
    forms in SQL.  A malformed container or a wrong decoder offset breaks
    the equality -- this is not a fake-dims stub check."""
    from mariadb_to_graylog_spark.operators.multimodal import (
        attach_payload,
        decode_media_meta,
    )

    d = _documents(spark, sf_dir)
    media = attach_payload(d)
    decoded = decode_media_meta(media)
    return decoded.select(
        "media_id", "kind", "width", "height", "channels",
        "sample_rate", "bits_per_sample", "n_frames",
    )


ORACLE_MULTIMODAL_META = """
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       CASE WHEN doc_id % 3 = 0
            THEN CAST(octet_length(encode(text)) % 64 + 16 AS BIGINT)
            WHEN doc_id % 3 = 2
            THEN CAST(octet_length(encode(text)) % 32 + 8 AS BIGINT) END AS width,
       CASE WHEN doc_id % 3 = 0
            THEN CAST(octet_length(encode(text)) % 48 + 12 AS BIGINT)
            WHEN doc_id % 3 = 2
            THEN CAST(octet_length(encode(text)) % 24 + 6 AS BIGINT) END AS height,
       CASE WHEN doc_id % 3 = 0 THEN CAST(3 AS BIGINT)
            WHEN doc_id % 3 = 1 THEN CAST(1 + doc_id % 2 AS BIGINT) END AS channels,
       CASE WHEN doc_id % 3 = 1
            THEN CAST(8000 + (octet_length(encode(text)) % 8) * 1000 AS BIGINT)
            END AS sample_rate,
       CASE WHEN doc_id % 3 = 1 THEN CAST(16 AS BIGINT) END AS bits_per_sample,
       CASE WHEN doc_id % 3 = 2
            THEN CAST(octet_length(encode(text)) % 12 + 2 AS BIGINT) END AS n_frames
FROM documents
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 2nd frame of each video, exploded from the frame count the
    GIF block-walker DECODES out of the payload bytes -- the oracle
    recomputes the closed-form count, so a wrong walk breaks parity."""
    from mariadb_to_graylog_spark.operators.multimodal import (
        attach_payload,
        frame_sample,
    )

    media = attach_payload(_documents(spark, sf_dir))
    return frame_sample(media, every_n=2).select(
        "media_id", F.col("frame_idx").cast("long").alias("frame_idx")
    )


ORACLE_FRAME_SAMPLE = """
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(unnest(range(0, octet_length(encode(text)) % 12 + 2, 2)) AS BIGINT)
         AS frame_idx
FROM documents WHERE doc_id % 3 = 2
"""


TRAINING_QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_lsh_verified": q_dedup_lsh_verified,
    "dedup_lsh_estimate": q_dedup_lsh_estimate,
    "crosslingual_near_dup": q_crosslingual_near_dup,
    "dedup_groups": q_dedup_groups,
    "dedup_simhash": q_dedup_simhash,
    "simhash_pairs": q_simhash_pairs,
    "simhash_banded": q_simhash_banded,
    "embed_neardup_lsh": q_embed_neardup_lsh,
    "knn_bruteforce": q_knn_bruteforce,
    "knn_ivf": q_knn_ivf,
    "knn_ivf_trained": q_knn_ivf_trained,
    "embed_neardup": q_embed_neardup,
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "quality_dup_calibration": q_quality_dup_calibration,
    "quality_threshold_sweep": q_quality_threshold_sweep,
    "source_overlap": q_source_overlap,
    "cdc_chunk_stats": q_cdc_chunk_stats,
    "token_stats": q_token_stats,
    "token_stats_bpe": q_token_stats_bpe,
    "doc_fingerprint": q_doc_fingerprint,
    "repetition": q_repetition,
    "pii_redact": q_pii_redact,
    "sample_det": q_sample_det,
    "sample_quota": q_sample_quota,
    "token_rarity": q_token_rarity,
    "sample_stratified": q_sample_stratified,
    "winnow_overlap": q_winnow_overlap,
    "url_extract": q_url_extract,
    "source_reputation": q_source_reputation,
    "domain_reputation": q_domain_reputation,
    "domain_lang_mix": q_domain_lang_mix,
    "substring_pairs": q_substring_pairs,
    "substring_run_extents": q_substring_run_extents,
    "verbatim_coverage": q_verbatim_coverage,
    "trim_verbatim": q_trim_verbatim,
    "paragraph_stats": q_paragraph_stats,
    "paragraph_dedup": q_paragraph_dedup,
    "paragraph_near_stats": q_paragraph_near_stats,
    "decontaminate": q_decontaminate,
    "decontaminate_bucketed": q_decontaminate_bucketed,
    "decontaminate_extents": q_decontaminate_extents,
    "decontaminate_coverage": q_decontaminate_coverage,
    "decontaminate_coverage_bucketed": q_decontaminate_coverage_bucketed,
    "trim_contaminated": q_trim_contaminated,
    "trim_loss_by_source": q_trim_loss_by_source,
    "novelty_by_batch": q_novelty_by_batch,
    "dedup_rate_sampled": q_dedup_rate_sampled,
    "unigram_surprisal": q_unigram_surprisal,
    "incremental_dedup": q_incremental_dedup,
    "pack_sequences": q_pack_sequences,
    "source_mixture": q_source_mixture,
    "dedup_keep_best": q_dedup_keep_best,
    "dup_cluster_hist": q_dup_cluster_hist,
    "semantic_dedup": q_semantic_dedup,
    "training_manifest": q_training_manifest,
    "knn_pq": q_knn_pq,
    "knn_ivfpq": q_knn_ivfpq,
    "token_fertility": q_token_fertility,
    "key_skew": q_key_skew,
    "corpus_accounting": q_corpus_accounting,
    "bloom_prefilter": q_bloom_prefilter,
    "cluster_source_mix": q_cluster_source_mix,
    "embedding_drift": q_embedding_drift,
    "prefix_dup_stats": q_prefix_dup_stats,
    "padding_waste": q_padding_waste,
    "data_split": q_data_split,
    "fuzzy_decontam": q_fuzzy_decontam,
    "semantic_decontam": q_semantic_decontam,
    "containment_pairs": q_containment_pairs,
    "dsir_weights": q_dsir_weights,
    "paragraph_lang_mix": q_paragraph_lang_mix,
    "incremental_neardup": q_incremental_neardup,
    "url_variants": q_url_variants,
    "image_ahash_groups": q_image_ahash_groups,
    "html_extract": q_html_extract,
    "audio_fp_groups": q_audio_fp_groups,
    "contamination_report": q_contamination_report,
    "nfc_dedup": q_nfc_dedup,
    "pack_segments": q_pack_segments,
    "web_ingest_pipeline": q_web_ingest_pipeline,
    "json_props": q_json_props,
    "tfidf_keywords": q_tfidf_keywords,
    "timeseries_gapfill": q_timeseries_gapfill,
    "char_entropy": q_char_entropy,
    "lang_confusion": q_lang_confusion,
    "dup_cluster_provenance": q_dup_cluster_provenance,
    "bpe_merges": q_bpe_merges,
    "bigram_novelty": q_bigram_novelty,
    "lsh_planner": q_lsh_planner,
    "vocab_coverage": q_vocab_coverage,
    "curation_pipeline": q_curation_pipeline,
    "curation_trim_pipeline": q_curation_trim_pipeline,
    "token_percentiles": q_token_percentiles,
    "multimodal_meta": q_multimodal_meta,
    "frame_sample": q_frame_sample,
}

TRAINING_ORACLES = {
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_ngram_jaccard": ORACLE_DEDUP_NGRAM_JACCARD,
    "dedup_minhash_lsh": ORACLE_DEDUP_MINHASH_LSH,
    "dedup_lsh_verified": ORACLE_DEDUP_LSH_VERIFIED,
    "dedup_lsh_estimate": ORACLE_DEDUP_LSH_ESTIMATE,
    "crosslingual_near_dup": ORACLE_CROSSLINGUAL_NEAR_DUP,
    "dedup_groups": ORACLE_DEDUP_GROUPS,
    "dedup_simhash": ORACLE_DEDUP_SIMHASH,
    "simhash_pairs": ORACLE_SIMHASH_PAIRS,
    "simhash_banded": ORACLE_SIMHASH_BANDED,
    "embed_neardup_lsh": ORACLE_EMBED_NEARDUP_LSH,
    "knn_bruteforce": ORACLE_KNN_BRUTEFORCE,
    "knn_ivf": ORACLE_KNN_IVF,
    "knn_ivf_trained": ORACLE_KNN_IVF_TRAINED,
    "embed_neardup": ORACLE_EMBED_NEARDUP,
    "lang_id": ORACLE_LANG_ID,
    "quality_score": ORACLE_QUALITY_SCORE,
    "quality_dup_calibration": ORACLE_QUALITY_DUP_CALIBRATION,
    "quality_threshold_sweep": ORACLE_QUALITY_THRESHOLD_SWEEP,
    "source_overlap": ORACLE_SOURCE_OVERLAP,
    "cdc_chunk_stats": ORACLE_CDC_CHUNK_STATS,
    "token_stats": ORACLE_TOKEN_STATS,
    "token_stats_bpe": ORACLE_TOKEN_STATS_BPE,
    "doc_fingerprint": ORACLE_DOC_FINGERPRINT,
    "repetition": ORACLE_REPETITION,
    "pii_redact": ORACLE_PII_REDACT,
    "sample_det": ORACLE_SAMPLE_DET,
    "sample_quota": ORACLE_SAMPLE_QUOTA,
    "token_rarity": ORACLE_TOKEN_RARITY,
    "sample_stratified": ORACLE_SAMPLE_STRATIFIED,
    "winnow_overlap": ORACLE_WINNOW_OVERLAP,
    "url_extract": ORACLE_URL_EXTRACT,
    "source_reputation": ORACLE_SOURCE_REPUTATION,
    "domain_reputation": ORACLE_DOMAIN_REPUTATION,
    "domain_lang_mix": ORACLE_DOMAIN_LANG_MIX,
    "substring_pairs": ORACLE_SUBSTRING_PAIRS,
    "substring_run_extents": ORACLE_SUBSTRING_RUN_EXTENTS,
    "verbatim_coverage": ORACLE_VERBATIM_COVERAGE,
    "trim_verbatim": ORACLE_TRIM_VERBATIM,
    "paragraph_stats": ORACLE_PARAGRAPH_STATS,
    "paragraph_dedup": ORACLE_PARAGRAPH_DEDUP,
    "paragraph_near_stats": ORACLE_PARAGRAPH_NEAR_STATS,
    "decontaminate": ORACLE_DECONTAMINATE,
    "decontaminate_bucketed": ORACLE_DECONTAMINATE,
    "decontaminate_extents": ORACLE_DECONTAMINATE_EXTENTS,
    "decontaminate_coverage": ORACLE_DECONTAMINATE_COVERAGE,
    "decontaminate_coverage_bucketed": ORACLE_DECONTAMINATE_COVERAGE,
    "trim_contaminated": ORACLE_TRIM_CONTAMINATED,
    "trim_loss_by_source": ORACLE_TRIM_LOSS_BY_SOURCE,
    "novelty_by_batch": ORACLE_NOVELTY_BY_BATCH,
    "dedup_rate_sampled": ORACLE_DEDUP_RATE_SAMPLED,
    "unigram_surprisal": ORACLE_UNIGRAM_SURPRISAL,
    "incremental_dedup": ORACLE_INCREMENTAL_DEDUP,
    "pack_sequences": ORACLE_PACK_SEQUENCES,
    "source_mixture": ORACLE_SOURCE_MIXTURE,
    "dedup_keep_best": ORACLE_DEDUP_KEEP_BEST,
    "dup_cluster_hist": ORACLE_DUP_CLUSTER_HIST,
    "semantic_dedup": ORACLE_SEMANTIC_DEDUP,
    "training_manifest": ORACLE_TRAINING_MANIFEST,
    "knn_pq": ORACLE_KNN_PQ,
    "knn_ivfpq": ORACLE_KNN_IVFPQ,
    "token_fertility": ORACLE_TOKEN_FERTILITY,
    "key_skew": ORACLE_KEY_SKEW,
    "corpus_accounting": ORACLE_CORPUS_ACCOUNTING,
    "bloom_prefilter": ORACLE_BLOOM_PREFILTER,
    "cluster_source_mix": ORACLE_CLUSTER_SOURCE_MIX,
    "embedding_drift": ORACLE_EMBEDDING_DRIFT,
    "prefix_dup_stats": ORACLE_PREFIX_DUP_STATS,
    "padding_waste": ORACLE_PADDING_WASTE,
    "data_split": ORACLE_DATA_SPLIT,
    "fuzzy_decontam": ORACLE_FUZZY_DECONTAM,
    "semantic_decontam": ORACLE_SEMANTIC_DECONTAM,
    "containment_pairs": ORACLE_CONTAINMENT_PAIRS,
    "dsir_weights": ORACLE_DSIR_WEIGHTS,
    "paragraph_lang_mix": ORACLE_PARAGRAPH_LANG_MIX,
    "incremental_neardup": ORACLE_INCREMENTAL_NEARDUP,
    "url_variants": ORACLE_URL_VARIANTS,
    "image_ahash_groups": ORACLE_IMAGE_AHASH_GROUPS,
    "html_extract": ORACLE_HTML_EXTRACT,
    "audio_fp_groups": ORACLE_AUDIO_FP_GROUPS,
    "contamination_report": ORACLE_CONTAMINATION_REPORT,
    "nfc_dedup": ORACLE_NFC_DEDUP,
    "pack_segments": ORACLE_PACK_SEGMENTS,
    "web_ingest_pipeline": ORACLE_WEB_INGEST_PIPELINE,
    "json_props": ORACLE_JSON_PROPS,
    "tfidf_keywords": ORACLE_TFIDF_KEYWORDS,
    "timeseries_gapfill": ORACLE_TIMESERIES_GAPFILL,
    "char_entropy": ORACLE_CHAR_ENTROPY,
    "lang_confusion": ORACLE_LANG_CONFUSION,
    "dup_cluster_provenance": ORACLE_DUP_CLUSTER_PROVENANCE,
    "bpe_merges": ORACLE_BPE_MERGES,
    "bigram_novelty": ORACLE_BIGRAM_NOVELTY,
    "lsh_planner": ORACLE_LSH_PLANNER,
    "vocab_coverage": ORACLE_VOCAB_COVERAGE,
    "curation_pipeline": ORACLE_CURATION_PIPELINE,
    "curation_trim_pipeline": ORACLE_CURATION_TRIM_PIPELINE,
    "token_percentiles": ORACLE_TOKEN_PERCENTILES,
    "multimodal_meta": ORACLE_MULTIMODAL_META,
    "frame_sample": ORACLE_FRAME_SAMPLE,
}

# --------------------------------------------------------------------------
# Driver-correctness window rotation.
#
# The round driver records oracle rows for only the FIRST 50 entries of
# ``queries()`` (CORRECTNESS_r05 capped at 50/60), so insertion order decides
# which queries get an independent driver-oracle row each round.  Per the
# round-5 verdict, order the least-driver-validated queries first:
#   tier 1 - brand-new this round (never seen by any driver),
#   tier 2 - never had a driver row in any round,
#   tier 3 - exactly one driver row so far (r4 or r5 additions),
#   remainder - multi-round-green veterans, rotated to the tail.
# Every name listed here must exist in the merged dict; the assertion below
# guards against typos when queries are added or renamed.
_DRIVER_PRIORITY = [
    # tier 1 (r7, per the round-6 verdict's top ask): the SIX queries that
    # have never had a driver-oracle row in any round -- positions 0-5 so
    # CORRECTNESS_r07 finally covers them and every registry query has
    # >= 1 driver row
    "decontaminate_extents",
    "paragraph_near_stats",
    "token_fertility",
    "key_skew",
    "corpus_accounting",
    "curation_trim_pipeline",
    # tier 2: exactly one driver row so far (r4- or r5-only)
    "paragraph_stats",
    "paragraph_dedup",
    "decontaminate",
    "decontaminate_bucketed",
    "curation_pipeline",
    "token_percentiles",
    "multimodal_meta",
    "frame_sample",
    "quality_dup_calibration",
    "cdc_chunk_stats",
    "token_rarity",
    "verbatim_coverage",
    "trim_verbatim",
    "source_overlap",
    "substring_run_extents",
    "sample_stratified",
    "domain_lang_mix",
    "domain_reputation",
    # tier 3: exactly one driver row (r6) -- fills the rest of the window,
    # heaviest-optimized-this-round names first so r7's driver rows also
    # re-confirm the queries whose implementations changed most
    "containment_pairs",
    "crosslingual_near_dup",
    "dedup_keep_best",
    "semantic_dedup",
    "cluster_source_mix",
    "knn_pq",
    "knn_ivfpq",
    "semantic_decontam",
    "fuzzy_decontam",
    "embedding_drift",
    "dsir_weights",
    "paragraph_lang_mix",
    "incremental_neardup",
    "url_variants",
    "image_ahash_groups",
    "html_extract",
    "audio_fp_groups",
    "contamination_report",
    "nfc_dedup",
    "pack_segments",
    "web_ingest_pipeline",
    "json_props",
    "tfidf_keywords",
    "timeseries_gapfill",
    "char_entropy",
    "lang_confusion",
    "dup_cluster_provenance",
    "bpe_merges",
    "vocab_coverage",
    "bigram_novelty",
    "lsh_planner",
    "padding_waste",
    "data_split",
    "prefix_dup_stats",
    "bloom_prefilter",
    "session_stats",
    "event_transitions",
    "quality_threshold_sweep",
    "decontaminate_coverage",
    "decontaminate_coverage_bucketed",
    "trim_contaminated",
    "trim_loss_by_source",
    "novelty_by_batch",
    "dedup_rate_sampled",
    "unigram_surprisal",
    "incremental_dedup",
    "pack_sequences",
    "source_mixture",
    "dup_cluster_hist",
    "training_manifest",
]


def _rotate_for_driver(queries: dict, priority: list) -> dict:
    missing = [n for n in priority if n not in queries]
    assert not missing, f"_DRIVER_PRIORITY names not in ALL_QUERIES: {missing}"
    head = {n: queries[n] for n in priority}
    tail = {n: fn for n, fn in queries.items() if n not in head}
    return {**head, **tail}


_MERGED_QUERIES = {**LOG_QUERIES, **TRAINING_QUERIES}
ALL_QUERIES = _rotate_for_driver(_MERGED_QUERIES, _DRIVER_PRIORITY)
ALL_ORACLES = {**LOG_ORACLES, **TRAINING_ORACLES}
