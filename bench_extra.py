#!/usr/bin/env python3
"""Per-query isolation harness for optimization rounds (bench.py is frozen
for measurement; this file exists so individual queries can be timed and
explained without editing it -- guide 1.1/1.4).

Mirrors bench.py methodology exactly where it matters: same session factory
and confs, full-plan warmup run first, then best-of-N timed .count() runs.
Additionally supports a noop-sink timing mode (guide 1.4: computes every
column, no collect) and .explain("formatted") capture for plans/r07/.

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 -q winnow_overlap -q dedup_groups
  python bench_extra.py --sf-dir /root/testdata/sf0.1 --explain-dir plans/r07 --suffix before -q winnow_overlap
  python bench_extra.py --sf-dir /root/testdata/sf1.0 --noop -q winnow_overlap
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("-q", "--query", action="append", default=[], help="query name (repeatable); default: all")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--noop", action="store_true", help="time via noop sink instead of .count()")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--explain-dir", default=None, help="write <query>_<suffix>.txt explain output here")
    ap.add_argument("--explain-only", action="store_true", help="capture plans, skip timing")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from bench import bench_spark

    spark = bench_spark(args.cpus, app="bench_extra")
    import mariadb_to_graylog_spark.entry_queries as eq

    names = args.query or list(eq.ALL_QUERIES)
    out: dict[str, dict] = {}
    for name in names:
        fn = eq.ALL_QUERIES[name]
        spark.sparkContext.setJobDescription(f"{name} [{args.suffix}]")
        if args.explain_dir:
            Path(args.explain_dir).mkdir(parents=True, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, args.sf_dir).explain("formatted")
            p = Path(args.explain_dir) / f"{name}_{args.suffix}.txt"
            p.write_text(buf.getvalue())
            print(f"# wrote {p}", file=sys.stderr)
        if args.explain_only:
            continue

        def run() -> int:
            df = fn(spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                return -1
            return df.count()

        if not args.no_warmup:
            run()
        best, rows = None, -1
        samples = []
        for _ in range(max(1, args.trials)):
            t0 = time.perf_counter()
            rows = run()
            sec = time.perf_counter() - t0
            samples.append(round(sec, 3))
            best = sec if best is None else min(best, sec)
        out[name] = {"sec": round(best, 3), "rows": rows, "samples": samples}
        print(f"# {name}: {out[name]}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": args.sf_dir, "mode": "noop" if args.noop else "count", "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
