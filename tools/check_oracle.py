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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
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
    failures = []
    for name in names:
        q = queries[name]
        try:
            sdf = q(spark, args.sf_dir)
            spark_rows = sdf.collect()
            spark_cols = sorted(sdf.columns)
            spark_vals = normalize(
                [r.asDict() for r in spark_rows], spark_cols
            )
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(spark_rows)} rows)")
            continue
        try:
            rel = con.execute(oracles[name])
            duck_cols_raw = [d[0] for d in rel.description]
            duck_rows = rel.fetchall()
            duck_cols = sorted(duck_cols_raw)
            duck_vals = normalize(
                [dict(zip(duck_cols_raw, r)) for r in duck_rows], duck_cols
            )
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue

        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns {spark_cols} != {duck_cols}")
            failures.append(name)
            continue
        if len(spark_vals) != len(duck_vals):
            print(f"FAIL {name}: rows {len(spark_vals)} != {len(duck_vals)}")
            failures.append(name)
            continue
        if spark_vals != duck_vals:
            bad = [
                (a, b) for a, b in zip(spark_vals, duck_vals) if a != b
            ][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            failures.append(name)
            continue
        print(f"PASS {name} ({len(spark_vals)} rows)")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if failures:
        # stdout is routinely tail'ed in automation; persist the FAIL
        # names so a transient failure is never lost to a pipe filter
        log = Path("/tmp/check_oracle_failures.log")
        import datetime as _dt

        with log.open("a") as fh:
            fh.write(f"{_dt.datetime.now().isoformat()} {failures}\n")
        print(f"failures recorded in {log}", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
