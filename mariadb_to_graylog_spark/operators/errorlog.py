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

Accepted divergences on degenerate inputs (implausible in real MariaDB
error logs, documented rather than chased):

* Unicode whitespace: Java regex ``\\s`` is ASCII-only, while the
  reference's ``str.rstrip``/``str.isspace`` are Unicode-aware -- a line
  containing NBSP / U+2028 etc. tokenizes differently here (the Unicode
  space survives as part of a token instead of splitting it).
* ``_F2_DATE_RE`` requires exactly 6 digits; CPython's
  ``strptime('%y%m%d')`` also accepts degenerate 4-5 digit dates (e.g.
  ``'20130 12:00:00'`` parses as year 20, month 1, day 30 in the
  reference but is a continuation line here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHORT_MESSAGE_LENGTH = 20  # registry.py:31

_F1_DATE_RE = r"^\d{4}-\d{1,2}-\d{1,2}$"
_F2_DATE_RE = r"^(\d{2})(\d{2})(\d{2})$"


def _zfill2(c: Column) -> Column:
    # str.zfill(2) pads but never truncates (Spark's lpad truncates);
    # note ''.zfill(2) == '00', so empty time components become midnight
    # parts exactly like the reference (:655-656).
    return F.when(F.length(c) >= 2, c).otherwise(F.lpad(c, 2, "0"))


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
    # stage 1: rstrip + tokenization.  One split pass replaces per-word
    # regexp_extracts (measured: the parse stage is CPU-bound, ~91% of
    # executor time; each regexp_extract is a separate regex execution).
    # split(_, '\s+', limit) consumes separator runs exactly like the
    # reference's cursor (P1): tokens 1..4 = words, token 5 = the stripped
    # remainder with interior whitespace preserved.
    s1 = df.withColumn("line", F.regexp_replace(F.col(text_col), r"\s+$", ""))
    s1 = s1.withColumn("_lstripped", F.regexp_replace(F.col("line"), r"^\s+", ""))
    s1 = s1.select(
        "*",
        F.split("_lstripped", r"\s+", 5).alias("_tok5"),
    )
    # try_element_at: NULL (not an ANSI error) when the line has fewer tokens
    tok = lambda i: F.coalesce(F.try_element_at("_tok5", F.lit(i)), F.lit(""))  # noqa: E731
    s1 = s1.select(
        "*",
        tok(1).alias("_w1"),
        tok(2).alias("_w2"),
        tok(3).alias("_w3"),
        tok(4).alias("_w4"),
    )

    # stage 2: time components + padded time string (one split on ':')
    s2 = s1.select("*", F.split("_w2", ":").alias("_tparts"))
    part = lambda i: F.try_element_at("_tparts", F.lit(i))  # noqa: E731
    # a component zfills cleanly iff empty or 1-2 digits ('' -> '00');
    # anything else fails strptime in the reference
    digits = lambda c: c.rlike(r"^\d{0,2}$")  # noqa: E731
    s2 = s2.withColumn(
        "_time_ok",
        (F.size("_tparts") >= 3)
        & digits(part(1))
        & digits(part(2))
        & digits(part(3)),
    )
    s2 = s2.withColumn(
        "_time_padded",
        F.when(
            F.col("_time_ok"),
            F.concat_ws(":", _zfill2(part(1)), _zfill2(part(2)), _zfill2(part(3))),
        ),
    )

    # stage 3: the two timestamp candidates.  try_to_timestamp +
    # unix_seconds: NULL on out-of-range dates under ANY session ANSI mode
    # (plain unix_timestamp RAISES under ANSI, but an unparseable date is
    # this parser's well-formedness *signal*, not an error)
    yy = F.regexp_extract("_w1", _F2_DATE_RE, 1).try_cast("int")
    f2_year = F.when(yy <= 68, yy + 2000).otherwise(yy + 1900)
    s3 = s2.select(
        "*",
        F.when(
            F.col("_w1").rlike(_F1_DATE_RE) & F.col("_time_ok"),
            F.unix_seconds(
                F.try_to_timestamp(
                    F.concat(F.col("_w1"), F.lit(" "), F.col("_time_padded")),
                    F.lit("yyyy-M-d H:mm:ss"),
                )
            ),
        ).alias("_ts_f1"),
        F.when(
            F.col("_w1").rlike(_F2_DATE_RE) & F.col("_time_ok"),
            F.unix_seconds(
                F.try_to_timestamp(
                    F.concat(
                        f2_year.cast("string"),
                        F.lit("-"),
                        F.regexp_extract("_w1", _F2_DATE_RE, 2),
                        F.lit("-"),
                        F.regexp_extract("_w1", _F2_DATE_RE, 3),
                        F.lit(" "),
                        F.col("_time_padded"),
                    ),
                    F.lit("yyyy-MM-dd H:mm:ss"),
                )
            ),
        ).alias("_ts_f2"),
    )

    # stage 4: well-formedness + field selection.  F1's message is the
    # remainder after word 4 (token 5 of the limit-5 split); F2's is the
    # remainder after word 3, which needs its own limit-4 split so interior
    # whitespace survives (the reference's to_end strip, :517-523).
    is_f1 = F.col("_ts_f1").isNotNull()
    ts_epoch = F.coalesce("_ts_f1", "_ts_f2")
    well_formed = ts_epoch.isNotNull()
    rest4 = F.coalesce(F.try_element_at("_tok5", F.lit(5)), F.lit(""))
    rest3 = F.coalesce(
        F.try_element_at(F.split("_lstripped", r"\s+", 4), F.lit(4)), F.lit("")
    )
    s4 = s3.select(
        "*",
        well_formed.alias("is_entry_start"),
        ts_epoch.alias("ts_epoch"),
        F.when(is_f1, F.col("_w3")).alias("thread_raw"),
        F.when(
            well_formed, F.when(is_f1, F.col("_w4")).otherwise(F.col("_w3"))
        ).alias("level_raw"),
        F.when(well_formed, F.when(is_f1, rest4).otherwise(rest3))
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
        "_lstripped", "_tok5", "_tparts", "_w1", "_w2", "_w3", "_w4",
        "_time_padded", "_time_ok", "_ts_f1", "_ts_f2",
    )
