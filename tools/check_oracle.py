#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on DuckDB
over the same parquet tables, compare row count / column names / values
(order-insensitive, column-name-sorted), and report per-query PASS/FAIL.

Usage: python tools/check_oracle.py [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(round(v, 9))
            elif isinstance(v, (list, tuple)):
                v = str(list(v))
            else:
                v = repr(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return out


def check_one(name, queries, oracles, spark, con, sf_dir, quiet_pass=False):
    """Run one query against its oracle; return None on pass/skip, else a
    one-line failure reason (kind + detail) suitable for the forensic log."""
    q = queries[name]
    try:
        sdf = q(spark, sf_dir)
        spark_rows = sdf.collect()
        spark_cols = sorted(sdf.columns)
        spark_vals = normalize([r.asDict() for r in spark_rows], spark_cols)
    except Exception as e:
        return f"spark error: {type(e).__name__}: {e}"
    if name not in oracles:
        print(f"SKIP {name}: no oracle ({len(spark_rows)} rows)")
        return None
    try:
        rel = con.execute(oracles[name])
        duck_cols_raw = [d[0] for d in rel.description]
        duck_rows = rel.fetchall()
        duck_cols = sorted(duck_cols_raw)
        duck_vals = normalize(
            [dict(zip(duck_cols_raw, r)) for r in duck_rows], duck_cols
        )
    except Exception as e:
        return f"duckdb error: {type(e).__name__}: {e}"

    if spark_cols != duck_cols:
        return f"columns {spark_cols} != {duck_cols}"
    if len(spark_vals) != len(duck_vals):
        return f"rows {len(spark_vals)} != {len(duck_vals)}"
    if spark_vals != duck_vals:
        bad = [(a, b) for a, b in zip(spark_vals, duck_vals) if a != b][:3]
        return f"value mismatch, first diffs: {bad}"
    if not quiet_pass:
        print(f"PASS {name} ({len(spark_vals)} rows)")
    return None


def _failure_log_path() -> Path:
    # Repo-local by default (env-overridable) -- NOT a predictable
    # world-writable /tmp path that another user could pre-create or
    # symlink on a shared host (round-5 advice).
    import os

    override = os.environ.get("CHECK_ORACLE_FAILLOG")
    if override:
        return Path(override)
    return Path(__file__).resolve().parent.parent / "check_oracle_failures.log"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--retry-failed",
        action="store_true",
        help="re-run each failed query once and label it "
        "'transient (passed on retry)' vs 'reproducible'",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from mariadb_to_graylog_spark.session import get_spark

    spark = get_spark(app_name="check_oracle", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or list(queries)
    failures: list[tuple[str, str, str]] = []  # (name, reason, retry_status)
    for name in names:
        reason = check_one(name, queries, oracles, spark, con, args.sf_dir)
        if reason is None:
            continue
        print(f"FAIL {name}: {reason}")
        retry_status = "not retried"
        if args.retry_failed:
            # quiet_pass: a retry that recovers must NOT print "PASS name"
            # after the FAIL line -- automation grepping PASS/FAIL would
            # count the query as both; the RETRY line is the verdict
            retry_reason = check_one(
                name, queries, oracles, spark, con, args.sf_dir, quiet_pass=True
            )
            if retry_reason is None:
                retry_status = "transient (passed on retry)"
            else:
                retry_status = f"reproducible: {retry_reason}"
            print(f"RETRY {name}: {retry_status}")
        failures.append((name, reason, retry_status))

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if failures:
        # stdout is routinely tail'ed in automation; persist name + full
        # reason + retry verdict so a transient failure is never lost to a
        # pipe filter and never ambiguous (round-5 verdict ask #2)
        log = _failure_log_path()
        import datetime as _dt
        import os

        run_id = f"{_dt.datetime.now().isoformat()} pid={os.getpid()}"
        try:
            if log.exists() and log.stat().st_size > 262144:
                # rotate, don't unlink: the log IS the cross-run forensic
                # record of transient failures -- deleting it would erase
                # the very history a flake hunt depends on; one .1
                # generation bounds total growth at ~512 KB
                log.replace(log.parent / (log.name + ".1"))
            with log.open("a") as fh:
                fh.write(f"=== run {run_id} sf_dir={args.sf_dir} ===\n")
                for name, reason, retry_status in failures:
                    fh.write(f"{name}\t{retry_status}\t{reason}\n")
            print(f"failures recorded in {log}", file=sys.stderr)
        except OSError as e:
            print(f"could not write failure log {log}: {e}", file=sys.stderr)
    # a FAIL that passed on retry still exits non-zero: the caller decides
    # whether "transient" is acceptable, the gate just reports honestly
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
