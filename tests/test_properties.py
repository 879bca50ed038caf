"""Property-based tests (SURVEY.md section 5.4) -- pure-Python components,
no Spark session: the reference-semantics simulator and the fingerprint
normalizer hold their invariants on arbitrary input."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from reference_sim import parse_error_line, simulate_error_log, simulate_slow_log
from mariadb_to_graylog_spark.operators.fingerprint import fingerprint_py

line_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\r"),
    max_size=120,
)


@settings(max_examples=300, deadline=None)
@given(st.lists(line_st, max_size=30))
def test_error_sim_entry_count_invariant(lines):
    """entries emitted == count of well-formed lines (strict mode flushes
    one entry per well-formed line, incl. the EOF flush)."""
    lines = [l.replace("\n", " ") for l in lines]
    n_wf = sum(1 for l in lines if parse_error_line(l.rstrip())["well_formed"])
    out = simulate_error_log(lines)
    assert len(out) == n_wf
    for m in out:
        assert set(m) == {"version", "host", "short_message", "timestamp", "level", "_text"}
        assert m["level"] in {"3", "4", "6", "UNKNOWN"}
        int(m["timestamp"])


@settings(max_examples=300, deadline=None)
@given(st.lists(line_st, max_size=40), st.booleans())
def test_slow_sim_never_crashes_and_lag_invariant(lines, emit_trailing):
    lines = [l.replace("\n", " ") for l in lines]
    out = simulate_slow_log(lines, emit_trailing=emit_trailing)
    # every emitted entry's raw text is '' or starts with the reference's
    # leading newline artifact
    for e in out:
        assert e["query_text"] == "" or e["query_text"].startswith("\n")
    # emitting the trailing entry can only add entries
    assert len(simulate_slow_log(lines, emit_trailing=True)) >= len(
        simulate_slow_log(lines, emit_trailing=False)
    )


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_fingerprint_idempotent_and_digit_free(q):
    fp = fingerprint_py(q)
    assert fingerprint_py(fp) == fingerprint_py(fingerprint_py(fp))
    # whitespace collapsed
    assert "\n" not in fp and "  " not in fp


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 10**9), st.lists(st.integers(0, 9999), min_size=2, max_size=8))
def test_fingerprint_parametrizes_literals(n, in_list):
    q = f"SELECT * FROM t WHERE a = {n} AND b IN ({', '.join(map(str, in_list))})"
    fp = fingerprint_py(q)
    assert fp == "SELECT * from t where a = ? and b in (?+)"


def test_fingerprint_duckdb_twin_parity():
    """The generated DuckDB regexp_replace chain (_fingerprint_sql) must
    equal fingerprint_py on representative inputs for every rule -- the
    rule table is shared, this guards the RE2-vs-Python regex semantics."""
    import duckdb

    from mariadb_to_graylog_spark.entry_queries import _fingerprint_sql
    from mariadb_to_graylog_spark.operators.fingerprint import (
        capitalize_first_word_py,
    )

    samples = [
        "SELECT * FROM orders WHERE customer_id = 123 AND status IN ('a','b','c')",
        "SELECT /* pick one */ a FROM t -- trailing note",
        "SELECT a FROM t # mysql comment\nWHERE x = 1",
        "SELECT * FROM t WHERE k = 0xDEADbeef AND v IS NULL",
        "SELECT a FROM t LIMIT 10, 20",
        "SELECT a FROM t LIMIT 10 OFFSET 5",
        "UPDATE t SET v = 1.5 WHERE id IN (1, 2, 3)",
        "SELECT a /* x\n y */ FROM t WHERE s = 'it''s'",
        "  select\n  col   FROM t  WHERE x = 7  ",
    ]
    con = duckdb.connect()
    expr = _fingerprint_sql("q")
    for q in samples:
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS q)", [q]
        ).fetchone()[0]
        assert capitalize_first_word_py(got) == fingerprint_py(q), q


def _winnow_naive(text, window=8, select_every=4, base=31, mod=1_000_003):
    """Straight-from-the-definition reference: per-position char fold,
    stride mins, first-occurrence distinct."""
    import re

    s = re.sub(r"\s+", " ", (text or "").lower(), flags=re.ASCII).strip()
    if not s:
        hashes = [0]
    else:
        npos = max(len(s) - window + 1, 1)
        hashes = []
        for i in range(npos):
            h = 0
            for ch in s[i : i + window]:
                h = (h * base + ord(ch)) % mod
            hashes.append(h)
    mins = [
        min(hashes[k * select_every : (k + 1) * select_every])
        for k in range((len(hashes) + select_every - 1) // select_every)
    ]
    return list(dict.fromkeys(mins))


@settings(max_examples=500, deadline=None)
@given(
    st.text(max_size=300),
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=1, max_value=6),
)
def test_winnow_numpy_kernel_matches_naive_definition(text, window, sel):
    """The vectorized sketch (the pandas-UDF kernel) equals the loop-
    from-the-definition on arbitrary unicode text and parameters."""
    from mariadb_to_graylog_spark.operators.textstats import winnow_sketch_py

    assert winnow_sketch_py(text, window, sel) == _winnow_naive(text, window, sel)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200), st.text(max_size=200))
def test_word_ngram_gram_strings_are_window_joins(a, b):
    """Decontamination gram property: two texts share a gram hash IFF they
    share a normalized n-word window (no hash-construction asymmetry).
    Checked via the pure construction rule on tiny n."""
    import hashlib
    import re

    def grams(t, n=3):
        s = re.sub(r"\s+", " ", (t or "").lower(), flags=re.ASCII).strip()
        toks = s.split(" ")
        return {
            " ".join(toks[i : i + n])
            for i in range(max(len(toks) - n + 1, 0))
        }

    def h32(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16)

    ga, gb = grams(a), grams(b)
    shared_windows = ga & gb
    shared_hashes = {h32(g) for g in ga} & {h32(g) for g in gb}
    if shared_windows:
        assert shared_hashes
    # the reverse (hash collision without shared window) is possible but
    # astronomically unlikely at 2^32 over <=400 grams; assert no FP here
    if not shared_windows:
        assert not shared_hashes
