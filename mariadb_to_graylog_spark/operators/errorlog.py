"""Error-log parsing operators (SURVEY.md section 2: P1-P5, P11-P14).

Re-expresses the reference's per-line cursor parser
(``mariadb-log-consumer.py:622-733``) as pure Catalyst column expressions --
whole-stage-codegen'd regexp extraction, no Python in the hot path.

Reference semantics reproduced exactly:

* Tokenization (P1): words are maximal runs of non-whitespace; the
  "to_end" remainder is stripped of surrounding whitespace
  (``_get_next_word``, mariadb-log-consumer.py:493-526).
* Format 1 (P2): ``date time thread level message...`` where the time
  components are zero-padded (zfill) before ``strptime '%Y-%m-%d
  %H:%M:%S'`` (mariadb-log-consumer.py:652-667).
* Format 2 (P3): ``date time level message...`` with ``strptime '%y%m%d
  %H:%M:%S'`` (two-digit-year pivot 69: 00-68 -> 20xx, 69-99 -> 19xx,
  matching CPython's strptime) (mariadb-log-consumer.py:669-682).
* Well-formedness (P4): a line is well-formed iff either timestamp parses;
  malformed lines are continuations of the previous entry
  (mariadb-log-consumer.py:644-650,683-687).
* Severity normalization (P11): strip ``[`` ``]``, uppercase
  (mariadb-log-consumer.py:704-707).
* short_message (P13): built from the *bracketed* pre-normalization level +
  first 20 chars of the message (mariadb-log-consumer.py:699-701,
  registry.py:31) -- the quirk is preserved for byte equality.

Timestamps: the reference uses local-time ``mktime``
(mariadb-log-consumer.py:659,676); this engine pins the session timezone to
UTC (see session.py) so epochs are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHORT_MESSAGE_LENGTH = 20  # registry.py:31

_WORD1 = r"^\s*(\S+)"
_WORD2 = r"^\s*\S+\s+(\S+)"
_WORD3 = r"^\s*\S+\s+\S+\s+(\S+)"
_WORD4 = r"^\s*\S+\s+\S+\s+\S+\s+(\S+)"
_REST3 = r"^\s*\S+\s+\S+\s+\S+\s+(\S.*)$"
_REST4 = r"^\s*\S+\s+\S+\s+\S+\s+\S+\s+(\S.*)$"

# time must split into >=3 ':'-separated numeric parts (parts beyond the
# third are ignored, matching time_list[0..2] indexing at :655-656)
_TIME_RE = r"^(\d{1,2}):(\d{1,2}):(\d{1,2})(?::.*)?$"
_F1_DATE_RE = r"^\d{4}-\d{1,2}-\d{1,2}$"
_F2_DATE_RE = r"^(\d{2})(\d{2})(\d{2})$"


def _zfill2(c: Column) -> Column:
    # str.zfill(2) pads but never truncates (Spark's lpad truncates).
    return F.when(F.length(c) >= 2, c).otherwise(F.concat(F.lit("0"), c))


def _strip(c: Column) -> Column:
    # Python str.strip(): all leading/trailing whitespace.
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def parse_error_log_lines(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-line parse: adds ``is_entry_start, ts_epoch, level_raw, severity,
    thread_raw, message, short_message, line`` columns.

    Built as *staged projections* so each regexp runs once per row and its
    result is reused by every downstream column -- inlining the whole tree
    per output column blows the janino 64KB codegen method limit and drops
    the stage to interpreted mode (observed; this shape keeps
    WholeStageCodegen).  The parquet scan still prunes to the referenced
    columns only.
    """
    # stage 1: rstrip + word extraction (each regexp evaluated once)
    s1 = df.withColumn("line", F.regexp_replace(F.col(text_col), r"\s+$", ""))
    s1 = s1.select(
        "*",
        F.regexp_extract("line", _WORD1, 1).alias("_w1"),
        F.regexp_extract("line", _WORD2, 1).alias("_w2"),
        F.regexp_extract("line", _WORD3, 1).alias("_w3"),
        F.regexp_extract("line", _WORD4, 1).alias("_w4"),
    )

    # stage 2: time components + padded time string
    s2 = s1.select(
        "*",
        F.regexp_extract("_w2", _TIME_RE, 1).alias("_th"),
        F.regexp_extract("_w2", _TIME_RE, 2).alias("_tm"),
        F.regexp_extract("_w2", _TIME_RE, 3).alias("_ts"),
    )
    s2 = s2.withColumn(
        "_time_padded",
        F.concat_ws(
            ":", _zfill2(F.col("_th")), _zfill2(F.col("_tm")), _zfill2(F.col("_ts"))
        ),
    ).withColumn("_time_ok", F.col("_th") != F.lit(""))

    # stage 3: the two timestamp candidates
    yy = F.regexp_extract("_w1", _F2_DATE_RE, 1).cast("int")
    f2_year = F.when(yy <= 68, yy + 2000).otherwise(yy + 1900)
    s3 = s2.select(
        "*",
        F.when(
            F.col("_w1").rlike(_F1_DATE_RE) & F.col("_time_ok"),
            F.unix_timestamp(
                F.concat(F.col("_w1"), F.lit(" "), F.col("_time_padded")),
                "yyyy-M-d H:mm:ss",
            ),
        ).alias("_ts_f1"),
        F.when(
            F.col("_w1").rlike(_F2_DATE_RE) & F.col("_time_ok"),
            F.unix_timestamp(
                F.concat(
                    f2_year.cast("string"),
                    F.lit("-"),
                    F.regexp_extract("_w1", _F2_DATE_RE, 2),
                    F.lit("-"),
                    F.regexp_extract("_w1", _F2_DATE_RE, 3),
                    F.lit(" "),
                    F.col("_time_padded"),
                ),
                "yyyy-MM-dd H:mm:ss",
            ),
        ).alias("_ts_f2"),
    )

    # stage 4: well-formedness + field selection
    is_f1 = F.col("_ts_f1").isNotNull()
    ts_epoch = F.coalesce("_ts_f1", "_ts_f2")
    well_formed = ts_epoch.isNotNull()
    s4 = s3.select(
        "*",
        well_formed.alias("is_entry_start"),
        ts_epoch.alias("ts_epoch"),
        F.when(is_f1, F.col("_w3")).alias("thread_raw"),
        F.when(
            well_formed, F.when(is_f1, F.col("_w4")).otherwise(F.col("_w3"))
        ).alias("level_raw"),
        F.when(
            well_formed,
            F.when(is_f1, F.regexp_extract("line", _REST4, 1)).otherwise(
                F.regexp_extract("line", _REST3, 1)
            ),
        )
        .otherwise(_strip(F.col("line")))
        .alias("message"),
    )

    # stage 5: derived presentation columns
    out = s4.select(
        "*",
        F.when(
            F.col("is_entry_start"),
            F.upper(F.translate(F.col("level_raw"), "[]", "")),
        ).alias("severity"),
        F.when(
            F.col("is_entry_start"),
            F.concat(
                F.col("level_raw"),
                F.lit(" "),
                F.substring(F.col("message"), 1, SHORT_MESSAGE_LENGTH),
            ),
        ).alias("short_message"),
    )
    return out.drop(
        "_w1", "_w2", "_w3", "_w4", "_th", "_tm", "_ts",
        "_time_padded", "_time_ok", "_ts_f1", "_ts_f2",
    )
