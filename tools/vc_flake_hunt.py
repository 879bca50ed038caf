#!/usr/bin/env python3
"""Forensics for the intermittent verbatim_coverage oracle-gate FAIL
(r5 judge saw it once; r6 reproduced it twice in one process, then 60/60
on rerun -- cross-process flaky, in-process deterministic).

One invocation = one fresh process mimicking the gate: run the rotated
prefix queries (Spark + DuckDB sides, same order as check_oracle), then
verbatim_coverage on BOTH engines, and compare each against a pure-Python
ground truth (normalize -> 15-token md5 grams -> cross-doc position
matches -> diagonal islands -> interval union -> integer coverage).  On
mismatch, prints WHICH ENGINE diverged, per-doc, and exits 2.

Loop it: for i in $(seq 50); do python tools/vc_flake_hunt.py || break; done
"""

from __future__ import annotations

import hashlib
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"
N = 15


def py_truth() -> dict[int, tuple[int, int]]:
    """doc_id -> (n_tokens, covered_tokens) over the excerpts corpus."""
    import duckdb

    rows = duckdb.connect().execute(
        f"""SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'
            UNION ALL
            SELECT doc_id + 200000, substr(text, 1, 120)
            FROM '{SF_DIR}/documents.parquet' WHERE doc_id % 7 = 0"""
    ).fetchall()
    toks = {}
    grams = defaultdict(list)  # h -> [(doc, pos)]
    for doc, text in rows:
        t = re.sub(r"^\s+|\s+$", "", re.sub(r"\s+", " ", text.lower())).split(" ")
        toks[doc] = t
        for p in range(len(t) - N + 1):
            h = hashlib.md5(" ".join(t[p : p + N]).encode()).hexdigest()
            grams[h].append((doc, p))
    # matches (a != b) grouped per (a, b, diag) -> distinct pos_a islands
    runs = defaultdict(set)  # (a, b, diag) -> {pos_a}
    for occ in grams.values():
        for a, pa in occ:
            for b, pb in occ:
                if a != b:
                    runs[(a, b, pa - pb)].add(pa)
    intervals = defaultdict(list)  # doc -> [(s, e)]
    for (a, _b, _d), poss in runs.items():
        ps = sorted(poss)
        start = prev = ps[0]
        for p in ps[1:] + [None]:
            if p is None or p != prev + 1:
                intervals[a].append((start, prev + N - 1))
                if p is not None:
                    start = p
            if p is not None:
                prev = p
    out = {}
    for doc, t in toks.items():
        ivs = sorted(intervals.get(doc, []))
        covered = 0
        cur_s = cur_e = None
        for s, e in ivs + [(None, None)]:
            if s is None or (cur_e is not None and s > cur_e):
                if cur_s is not None:
                    covered += cur_e - cur_s + 1
                cur_s, cur_e = s, e
            else:
                if cur_s is None:
                    cur_s, cur_e = s, e
                else:
                    cur_e = max(cur_e, e)
        out[doc] = (len(t), covered)
    return out


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from mariadb_to_graylog_spark.session import get_spark

    truth = py_truth()

    spark = get_spark(app_name="vc_hunt", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = list(queries)
    prefix = names[: names.index("verbatim_coverage")]
    for nm in prefix:
        queries[nm](spark, SF_DIR).collect()
        if nm in oracles:
            con.execute(oracles[nm]).fetchall()

    bad = 0
    sdf = queries["verbatim_coverage"](spark, SF_DIR)
    sp = {r.doc_id: (r.n_tokens, r.covered_tokens) for r in sdf.collect()}
    rel = con.execute(oracles["verbatim_coverage"])
    cols = [d[0] for d in rel.description]
    du = {
        d["doc_id"]: (d["n_tokens"], d["covered_tokens"])
        for d in (dict(zip(cols, r)) for r in rel.fetchall())
    }
    for label, got in (("SPARK", sp), ("DUCKDB", du)):
        diff = {
            k: (got.get(k), truth.get(k))
            for k in set(got) | set(truth)
            if got.get(k) != truth.get(k)
        }
        if diff:
            bad = 1
            print(f"ENGINE {label} DIVERGES from python truth "
                  f"({len(diff)} docs): {dict(list(diff.items())[:10])}")
    if not bad:
        print(f"clean: both engines match python truth on {len(truth)} docs")
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
