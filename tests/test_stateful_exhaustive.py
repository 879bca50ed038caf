"""Exhaustive split-point tests for the cross-batch assemblers: the FSM
state round-trip must be correct no matter WHERE the micro-batch boundary
falls.  Runs the applyInPandasWithState callbacks directly against a fake
GroupState (no Spark session), comparing to the pure-Python
reference-semantics simulator for every single split position and a set of
random multi-way splits."""

from __future__ import annotations

import math
import random

import pandas as pd


def _norm(v):
    """pandas numeric columns render None as NaN and ints as floats in
    to_dict; Spark's Arrow path keeps proper nulls -- normalize for the
    no-Spark harness comparison."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float) and v.is_integer():
        return int(v)
    return v

from reference_sim import simulate_error_log, simulate_slow_log
from test_slowlog import CORPUS as SLOW_CORPUS
from mariadb_to_graylog_spark.streaming.stateful import (
    make_assembler,
    make_slow_assembler,
)

ERROR_CORPUS = [
    "2019-11-01 16:10:48 0 [Note] InnoDB: Using Linux native AIO",
    "continuation one",
    "201030 12:40:21 [ERROR] WSREP: read nil XID",
    "second entry continuation",
    "2019-11-01 :: 7 [ERROR] empty-time-components entry",
    "garbage between",
    "2019-11-01 16:10:55 5 [Warning] last entry",
    "trailing continuation",
]


class FakeState:
    """Just enough of pyspark GroupState for the callbacks."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        pass


def _pdf(lines, turn_offset):
    return pd.DataFrame(
        {
            "conv_id": ["c"] * len(lines),
            "turn_idx": [turn_offset + i for i in range(len(lines))],
            "role": ["user"] * len(lines),
            "text": lines,
            "tool": [None] * len(lines),
            "ts": [pd.Timestamp("2024-01-01")] * len(lines),
        }
    )


def _run_chunks(fn, chunks):
    state = FakeState()
    rows: list[dict] = []
    off = 0
    for chunk in chunks:
        for frame in fn(("c",), iter([_pdf(chunk, off)]), state):
            rows.extend(frame.to_dict("records"))
        off += len(chunk)
    # stream-end: the processing-time timeout fires with no new data
    if state.exists:
        state.hasTimedOut = True
        for frame in fn(("c",), iter([]), state):
            rows.extend(frame.to_dict("records"))
    return rows


def _all_splits(corpus):
    yield [corpus]  # single batch
    for i in range(1, len(corpus)):  # every 2-way split point
        yield [corpus[:i], corpus[i:]]
    rng = random.Random(7)
    for _ in range(20):  # random 3-4 way splits
        cuts = sorted(rng.sample(range(1, len(corpus)), rng.choice([2, 3])))
        parts, prev = [], 0
        for c in cuts + [len(corpus)]:
            parts.append(corpus[prev:c])
            prev = c
        yield parts


def test_slow_fsm_every_split_point_matches_simulator():
    expected = simulate_slow_log(SLOW_CORPUS, emit_trailing=True)
    for chunks in _all_splits(SLOW_CORPUS):
        fn = make_slow_assembler(emit_trailing=True)
        got = _run_chunks(fn, chunks)
        assert [r["query_text_raw"] for r in got] == [
            e["query_text"] for e in expected
        ], chunks
        assert [_norm(r["set_timestamp"]) for r in got] == [
            e["set_timestamp"] for e in expected
        ], chunks


def test_slow_fsm_trailing_drop_every_split_point():
    expected = simulate_slow_log(SLOW_CORPUS, emit_trailing=False)
    for chunks in _all_splits(SLOW_CORPUS):
        got = _run_chunks(make_slow_assembler(emit_trailing=False), chunks)
        assert [r["query_text_raw"] for r in got] == [
            e["query_text"] for e in expected
        ], chunks


def test_error_strict_every_split_point_matches_simulator():
    expected = simulate_error_log(ERROR_CORPUS)
    for chunks in _all_splits(ERROR_CORPUS):
        got = _run_chunks(make_assembler(mode="strict"), chunks)
        assert [r["short_message"] for r in got] == [
            e["short_message"] for e in expected
        ], chunks
        assert [str(_norm(r["ts_epoch"])) for r in got] == [
            e["timestamp"] for e in expected
        ], chunks


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_LINE_KINDS = st.one_of(
    st.just("# Time: 231030 12:40:21"),
    st.just("# Time: 2023-10-30T12:40:21.000001"),
    st.builds("# Thread_id: {}  Schema: s  QC_hit: No".format, st.integers(0, 99)),
    st.just("# Query_time: 1.5  Lock_time: 0.01  Rows_sent: 3  Rows_examined: 9"),
    st.just("# not a time header"),
    st.just("use shop;"),
    st.builds("SET timestamp={};".format, st.integers(0, 2_000_000_000)),
    st.builds("SELECT {};".format, st.integers(0, 9)),
    st.just(""),
    st.just("   "),
    st.just("bare continuation words"),
)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(_LINE_KINDS, min_size=0, max_size=24),
    st.integers(0, 1 << 30),
    st.booleans(),
)
def test_slow_fsm_random_corpora_random_splits(lines, seed, emit_trailing):
    """Property: for ANY line sequence and ANY batch segmentation, the
    stateful FSM emits exactly the simulator's entries."""
    expected = simulate_slow_log(lines, emit_trailing=emit_trailing)
    rng = random.Random(seed)
    chunks, i = [], 0
    while i < len(lines):
        j = rng.randint(i + 1, len(lines))
        chunks.append(lines[i:j])
        i = j
    got = _run_chunks(make_slow_assembler(emit_trailing=emit_trailing), chunks)
    assert [r["query_text_raw"] for r in got] == [e["query_text"] for e in expected]
    assert [_norm(r["set_timestamp"]) for r in got] == [
        e["set_timestamp"] for e in expected
    ]
