"""Cross-batch streaming entry assembly (SURVEY.md P5 under SRC1-stream).

``foreachBatch`` assembly (stream_pipeline.py) is correct only when every
conversation's lines land in one micro-batch; a conversation whose
continuation lines arrive in a LATER batch needs per-conversation state --
exactly the reference's tail loop, which keeps one in-flight message across
reads (mariadb-log-consumer.py:774-780,692-733).  This module implements it
with ``applyInPandasWithState``:

* group by ``conv_id``; state = the open (not-yet-terminated) entry;
* an entry is emitted when the NEXT entry-start line arrives (possibly
  batches later) -- the same one-entry-lag the reference uses;
* the trailing open entry is flushed by a processing-time timeout after
  ``flush_after_ms`` of key silence (the reference flushes at EOF,
  :771-772; an unbounded stream has no EOF, a quiet period is its moral
  equivalent).

``_parse_error_line`` is the pure-Python twin of
``operators/errorlog.parse_error_log_lines`` (same tokenization, zfill
quirks, %y pivot, ASCII whitespace classes) -- tested equal against the
Spark parse in tests/test_streaming_stateful.py, and the assembled output
is tested byte-identical to batch ``assemble_error_entries`` with one
conversation split across three micro-batches.

BOTH dialects are covered: ``assemble_entries_stateful`` (error log) and
``assemble_slow_entries_stateful`` (the slow-log FSM with its registers in
state, column-equal to batch ``parse_slow_log`` including metrics and
fingerprints).  Exhaustive split-point + random-corpus property tests
drive the callbacks against a fake GroupState without Spark
(tests/test_stateful_exhaustive.py); the CLI reaches this via
``--stateful-assembly`` (jobs/run_pipeline.py).
"""

from __future__ import annotations

import calendar
import re
from collections.abc import Iterator
from typing import Any

import pandas as pd

SHORT_MESSAGE_LENGTH = 20

# ASCII classes mirror the Spark/Java \s semantics (errorlog.py divergence
# notes: NBSP etc. intentionally NOT whitespace here either)
_RSTRIP = re.compile(r"\s+$", re.ASCII)
_LSTRIP = re.compile(r"^\s+", re.ASCII)
_WS = re.compile(r"\s+", re.ASCII)
_F1_DATE = re.compile(r"^\d{4}-\d{1,2}-\d{1,2}$", re.ASCII)
_F2_DATE = re.compile(r"^(\d{2})(\d{2})(\d{2})$", re.ASCII)
_TIME_PART = re.compile(r"^\d{0,2}$", re.ASCII)


def _zfill2(s: str) -> str:
    return s if len(s) >= 2 else s.zfill(2)


def _epoch_utc(y: int, mo: int, d: int, h: int, mi: int, s: int) -> int | None:
    try:
        import datetime as _dt

        return calendar.timegm(_dt.datetime(y, mo, d, h, mi, s).timetuple())
    except ValueError:
        return None


def _parse_error_line(text: str) -> dict[str, Any]:
    """Python twin of parse_error_log_lines for ONE line."""
    line = _RSTRIP.sub("", text or "")
    lstripped = _LSTRIP.sub("", line)
    tok5 = _WS.split(lstripped, maxsplit=4) if lstripped else [""]
    w = [tok5[i] if i < len(tok5) else "" for i in range(4)]

    tparts = w[1].split(":")
    time_ok = len(tparts) >= 3 and all(_TIME_PART.match(p) for p in tparts[:3])
    hh = mm = ss = None
    if time_ok:
        hh, mm, ss = (int(_zfill2(p)) for p in tparts[:3])
        if not (0 <= hh <= 23 and 0 <= mm <= 59 and 0 <= ss <= 59):
            time_ok = False

    ts_f1 = ts_f2 = None
    if time_ok and _F1_DATE.match(w[0]):
        y, mo, d = (int(x) for x in w[0].split("-"))
        ts_f1 = _epoch_utc(y, mo, d, hh, mm, ss)
    m2 = _F2_DATE.match(w[0]) if time_ok else None
    if m2:
        yy = int(m2.group(1))
        year = yy + 2000 if yy <= 68 else yy + 1900
        ts_f2 = _epoch_utc(year, int(m2.group(2)), int(m2.group(3)), hh, mm, ss)

    is_f1 = ts_f1 is not None
    ts_epoch = ts_f1 if is_f1 else ts_f2
    well_formed = ts_epoch is not None
    if well_formed:
        if is_f1:
            message = tok5[4] if len(tok5) > 4 else ""
            thread_raw, level_raw = w[2], w[3]
        else:
            tok4 = _WS.split(lstripped, maxsplit=3)
            message = tok4[3] if len(tok4) > 3 else ""
            thread_raw, level_raw = None, w[2]
        severity = level_raw.translate(str.maketrans("", "", "[]")).upper()
        short_message = f"{level_raw} {message[:SHORT_MESSAGE_LENGTH]}"
    else:
        message = _LSTRIP.sub("", _RSTRIP.sub("", line))
        thread_raw = level_raw = severity = short_message = None
    return {
        "is_entry_start": well_formed,
        "ts_epoch": ts_epoch,
        "thread_raw": thread_raw,
        "level_raw": level_raw,
        "severity": severity,
        "short_message": short_message,
        "message": message,
    }


OUTPUT_SCHEMA = (
    "conv_id string, entry_id long, start_turn_idx int, ts timestamp, "
    "role string, tool string, ts_epoch long, thread_raw string, "
    "level_raw string, severity string, short_message string, message string"
)

# open-entry state: head fields + accumulated message lines + emit counter
STATE_SCHEMA = (
    "n_emitted long, start_turn_idx int, ts_us long, role string, "
    "tool string, ts_epoch long, thread_raw string, level_raw string, "
    "severity string, short_message string, lines array<string>"
)

_OUT_COLS = [
    "conv_id", "entry_id", "start_turn_idx", "ts", "role", "tool",
    "ts_epoch", "thread_raw", "level_raw", "severity", "short_message",
    "message",
]


def _entry_row(conv_id: str, entry_id: int, st: tuple, mode: str) -> dict:
    message = st[10][0] if mode == "strict" else "\n".join(st[10])
    return {
        "conv_id": conv_id,
        "entry_id": entry_id,
        "start_turn_idx": st[1],
        # naive round-trip: Arrow delivers session-tz-naive timestamps and
        # interprets naive ones back the same way
        "ts": pd.Timestamp(st[2], unit="us") if st[2] is not None else None,
        "role": st[3],
        "tool": st[4],
        "ts_epoch": st[5],
        "thread_raw": st[6],
        "level_raw": st[7],
        "severity": st[8],
        "short_message": st[9],
        "message": message,
    }


def make_assembler(mode: str = "intended", flush_after_ms: int = 1000):
    """applyInPandasWithState callback; ``mode`` as in
    assemble_error_entries (strict = head line only, intended = multiline
    append)."""
    if mode not in ("strict", "intended"):
        raise ValueError(f"unknown mode {mode!r}")

    def assemble(
        key: tuple, pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        out: list[dict] = []
        if state.hasTimedOut:
            st = state.get
            if st[10]:  # open entry exists -> EOF-equivalent flush
                out.append(_entry_row(conv_id, st[0] + 1, st, mode))
                # keep a counter-only row (no timeout re-arm) so a
                # conversation that resumes after the flush CONTINUES its
                # entry_id sequence -- state.remove() would restart ids at
                # 1 and mint duplicate (conv_id, entry_id) keys.  Cost: one
                # ~100-byte state row per flushed conversation, the price
                # of key uniqueness.
                state.update(
                    (st[0] + 1, None, None, None, None, None, None, None,
                     None, None, [])
                )
            else:
                # already counter-only: nothing new since the last flush
                state.update(st)
            if out:
                yield pd.DataFrame(out, columns=_OUT_COLS)
            return

        st = state.get if state.exists else None
        rows: list[tuple] = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                rows.append(r)
        rows.sort(key=lambda r: r.turn_idx)

        for r in rows:
            p = _parse_error_line(r.text)
            if p["is_entry_start"]:
                # counter-only state (post-timeout-flush) has st[10] == []:
                # its st[0] already counts the flushed entry, so no +1
                flushed_here = st is not None and bool(st[10])
                if flushed_here:
                    out.append(_entry_row(conv_id, st[0] + 1, st, mode))
                n_emitted = (
                    st[0] + (1 if flushed_here else 0) if st is not None else 0
                )
                ts_us = (
                    int(r.ts.value // 1000) if isinstance(r.ts, pd.Timestamp) else None
                )
                st = (
                    n_emitted, int(r.turn_idx), ts_us, r.role, r.tool,
                    p["ts_epoch"], p["thread_raw"], p["level_raw"],
                    p["severity"], p["short_message"], [p["message"]],
                )
            elif st is not None and st[10]:
                if mode == "intended":
                    st = st[:10] + (st[10] + [p["message"]],)
                # strict: continuation text dropped (reference :733)

        if st is not None:
            state.update(st)
            state.setTimeoutDuration(flush_after_ms)
        if out:
            yield pd.DataFrame(out, columns=_OUT_COLS)

    return assemble


# ---------------------------------------------------------------------------
# slow-log dialect: the reference FSM with cross-batch state
# ---------------------------------------------------------------------------

_F2_TIME = re.compile(r"^# Time:\s+(.*\S)\s*$", re.ASCII)
_F2_HEAD = re.compile(r"^(\d{2})(\d{2})(\d{2})\s", re.ASCII)
_F2_CLOCK = re.compile(r"^\d{6}\s+(\d{1,2}):(\d{2}):(\d{2})$", re.ASCII)
_ISO = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})\.(\d{6})$", re.ASCII
)
_I64_MAX = (1 << 63) - 1


def _parse_time_line(line: str) -> int | None:
    """'# Time:' payload -> epoch: 'yymmdd H:mm:ss' (pivot 69) or ISO with
    micros (truncated), mirroring assemble_slow_entries' expressions."""
    m = _F2_TIME.match(line)
    if not m:
        return None
    raw = m.group(1)
    h = _F2_HEAD.match(raw)
    c = _F2_CLOCK.match(raw)
    if h and c:
        yy = int(h.group(1))
        year = yy + 2000 if yy <= 68 else yy + 1900
        return _epoch_utc(
            year, int(h.group(2)), int(h.group(3)),
            int(c.group(1)), int(c.group(2)), int(c.group(3)),
        )
    i = _ISO.match(raw)
    if i:
        return _epoch_utc(*(int(i.group(j)) for j in range(1, 7)))
    return None


def _slow_metrics(meta_lines: list[str]) -> dict:
    """max() per field over the entry's META lines, typed like the batch
    aggregate (try_cast overflow -> NULL)."""
    out: dict = {}
    for name, (pat, typ) in META_FIELD_PATTERNS.items():
        vals = []
        for ln in meta_lines:
            m = re.search(pat, ln)
            if m and m.group(1) != "":
                v = m.group(1)
                if typ == "long":
                    iv = int(v)
                    if iv > _I64_MAX:
                        continue  # try_cast overflow -> NULL
                    vals.append(iv)
                elif typ == "double":
                    vals.append(float(v))
                else:
                    vals.append(v)
        out[name] = max(vals) if vals else None
    return out


from mariadb_to_graylog_spark.operators.slowlog import (  # noqa: E402
    META_FIELD_PATTERNS,
)

SLOW_OUTPUT_SCHEMA = (
    "conv_id string, entry_id long, start_turn_idx int, ts timestamp, "
    "role string, tool string, set_timestamp long, time_line_ts long, "
    "query_text string, "
    + ", ".join(
        f"{n} {'bigint' if t == 'long' else t}"
        for n, (_, t) in META_FIELD_PATTERNS.items()
    )
    + ", query_text_raw string, ts_epoch long, query_fingerprint string"
)

_SLOW_COLS = (
    ["conv_id", "entry_id", "start_turn_idx", "ts", "role", "tool",
     "set_timestamp", "time_line_ts", "query_text"]
    + list(META_FIELD_PATTERNS)
    + ["query_text_raw", "ts_epoch", "query_fingerprint"]
)

SLOW_STATE_SCHEMA = (
    "prev_type string, entry_count long, open boolean, start_turn int, "
    "ts_us long, role string, tool string, sql_count long, "
    "kept_lines array<string>, set_ts long, time_ts long, "
    "meta_lines array<string>"
)


def _slow_entry_row(conv_id: str, st: dict) -> dict:
    from mariadb_to_graylog_spark.operators.fingerprint import fingerprint_py

    query_text = "\n".join(st["kept_lines"])
    row = {
        "conv_id": conv_id,
        "entry_id": st["entry_count"],
        "start_turn_idx": st["start_turn"],
        "ts": pd.Timestamp(st["ts_us"], unit="us") if st["ts_us"] is not None else None,
        "role": st["role"],
        "tool": st["tool"],
        "set_timestamp": st["set_ts"],
        "time_line_ts": st["time_ts"],
        "query_text": query_text,
        **_slow_metrics(st["meta_lines"]),
        "query_text_raw": ("\n" + query_text) if st["kept_lines"] else "",
        "ts_epoch": st["set_ts"] if st["set_ts"] is not None else st["time_ts"],
        "query_fingerprint": fingerprint_py(query_text),
    }
    return row


def make_slow_assembler(emit_trailing: bool = False, flush_after_ms: int = 1000):
    """applyInPandasWithState callback running the reference slow-log FSM
    (mariadb-log-consumer.py:897-954) with cross-batch registers.  Entry
    ids count every entry START (zero-SQL entries occupy an id but are
    never emitted), matching the batch classifier's numbering.  With
    ``emit_trailing=False`` (the reference default) the timeout only
    DISCARDS stale state -- the trailing entry is dropped exactly like the
    reference at EOF; ``True`` flushes it instead."""

    def _open_state() -> dict:
        return {
            "prev_type": None, "entry_count": 0, "open": False,
            "start_turn": None, "ts_us": None, "role": None, "tool": None,
            "sql_count": 0, "kept_lines": [], "set_ts": None,
            "time_ts": None, "meta_lines": [],
        }

    def _to_tuple(d: dict) -> tuple:
        return (
            d["prev_type"], d["entry_count"], d["open"], d["start_turn"],
            d["ts_us"], d["role"], d["tool"], d["sql_count"],
            d["kept_lines"], d["set_ts"], d["time_ts"], d["meta_lines"],
        )

    def _from_tuple(t: tuple) -> dict:
        keys = [
            "prev_type", "entry_count", "open", "start_turn", "ts_us",
            "role", "tool", "sql_count", "kept_lines", "set_ts", "time_ts",
            "meta_lines",
        ]
        d = dict(zip(keys, t))
        d["kept_lines"] = list(d["kept_lines"] or [])
        d["meta_lines"] = list(d["meta_lines"] or [])
        return d

    def assemble(key, pdfs, state):
        conv_id = key[0]
        out: list[dict] = []
        if state.hasTimedOut:
            st = _from_tuple(state.get)
            if emit_trailing and st["open"] and st["sql_count"] >= 1:
                out.append(_slow_entry_row(conv_id, st))
            # keep the FSM registers (prev_type, entry_count) in a
            # buffers-cleared row instead of state.remove(): a conversation
            # that resumes after the flush continues its entry_id sequence
            # (no duplicate (conv_id, entry_id) keys) and the classifier
            # position survives the quiet period.  No timeout re-arm --
            # the row is ~100 bytes, the price of key uniqueness.
            st.update(
                open=False, start_turn=None, ts_us=None, role=None,
                tool=None, sql_count=0, kept_lines=[], set_ts=None,
                time_ts=None, meta_lines=[],
            )
            state.update(_to_tuple(st))
            if out:
                yield pd.DataFrame(out, columns=_SLOW_COLS)
            return

        st = _from_tuple(state.get) if state.exists else _open_state()
        rows: list = []
        for pdf in pdfs:
            rows.extend(pdf.itertuples(index=False))
        rows.sort(key=lambda r: r.turn_idx)

        for r in rows:
            line = _RSTRIP.sub("", r.text or "")
            if not line:
                continue
            is_new_entry = False
            if line[0:2] == "# ":
                if st["prev_type"] is None or st["prev_type"] == "SQL":
                    if line[1:7] == " Time:":
                        is_new_entry = True
                        line_type = "META"
                    else:
                        line_type = "SQL"
                else:
                    line_type = "META"
            else:
                line_type = None if st["prev_type"] is None else "SQL"

            if is_new_entry:
                if st["open"] and st["sql_count"] >= 1:
                    out.append(_slow_entry_row(conv_id, st))
                ts_us = (
                    int(r.ts.value // 1000)
                    if isinstance(r.ts, pd.Timestamp) else None
                )
                st.update(
                    open=True, entry_count=st["entry_count"] + 1,
                    start_turn=int(r.turn_idx), ts_us=ts_us, role=r.role,
                    tool=r.tool, sql_count=0, kept_lines=[], set_ts=None,
                    time_ts=_parse_time_line(line),
                    meta_lines=[line],
                )
            elif st["open"]:
                if line_type == "META":
                    st["meta_lines"] = st["meta_lines"] + [line]
                elif line_type == "SQL":
                    pos = st["sql_count"]
                    if pos == 0 and line[0:4] == "use ":
                        pass  # skipped (position-0 only)
                    elif pos == 1 and line[0:14] == "SET timestamp=":
                        try:
                            st["set_ts"] = int(line[14 : len(line) - 1])
                        except ValueError:
                            st["set_ts"] = None
                        else:
                            if st["set_ts"] > _I64_MAX:
                                st["set_ts"] = None
                    else:
                        st["kept_lines"] = st["kept_lines"] + [line]
                    st["sql_count"] += 1
            st["prev_type"] = line_type

        state.update(_to_tuple(st))
        state.setTimeoutDuration(flush_after_ms)
        if out:
            yield pd.DataFrame(out, columns=_SLOW_COLS)

    return assemble


def assemble_slow_entries_stateful(
    transcripts,
    emit_trailing: bool = False,
    flush_after_ms: int = 1000,
):
    """Cross-batch slow-log assembly: the FSM's registers persist across
    micro-batches per conversation; entries emit one-entry-late exactly
    like batch parse_slow_log / the reference tail loop."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    fn = make_slow_assembler(emit_trailing, flush_after_ms)
    return transcripts.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=SLOW_OUTPUT_SCHEMA,
        stateStructType=SLOW_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def assemble_entries_stateful(
    transcripts,  # streaming DataFrame with transcript schema
    mode: str = "intended",
    flush_after_ms: int = 1000,
):
    """Streaming entry assembly with cross-batch state.  Emits each entry
    when its successor's first line arrives; flushes the trailing open
    entry after ``flush_after_ms`` of silence on the conversation."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    fn = make_assembler(mode, flush_after_ms)
    return transcripts.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
