#!/usr/bin/env python3
"""Same-session bench A/B against an arbitrary commit -- the ONLY valid
way to compare performance across rounds on this host (cross-session
wall-times drift up to 1.75x with co-tenant load; see BENCH/AB_R2_R4.md
for the method's first application and receipts).

Protocol: run HEAD's bench, then the base commit's bench (in a throwaway
git worktree, using THAT commit's own bench.py) the requested number of
times, then HEAD again as a drift sentinel -- the HEAD runs BRACKET the
base runs so ordering/warm-cache effects cannot masquerade as a code
delta.  Per-query best-of times are compared; a query only counts as a
regression if HEAD is slower than base in BOTH bracketing runs by more
than ``--margin`` (default 5% -- epsilon deltas are co-tenant jitter).

Usage: python tools/bench_ab.py --base <commit> [--trials 3] [--out DIR]
Prints one JSON line: {"base": sha, "queries": {name: {"base": s,
"head1": s, "head2": s, "regressed": bool}}, "regressions": [...]}.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run_bench(cwd: Path, trials: int) -> dict:
    """Run a tree's own bench.py; best-of per query across trials
    (handles bench.py versions with and without --trials)."""
    probe = subprocess.run(
        [sys.executable, "bench.py", "--help"],
        capture_output=True, text=True, cwd=str(cwd), timeout=120,
    )
    best: dict | None = None
    runs = 1 if "--trials" in probe.stdout else trials
    args = ["--trials", str(trials)] if "--trials" in probe.stdout else []
    for _ in range(runs):
        out = subprocess.run(
            [sys.executable, "bench.py", *args],
            capture_output=True, text=True, cwd=str(cwd), timeout=1800,
        )
        if out.returncode != 0:
            raise RuntimeError(
                f"bench.py in {cwd} exited {out.returncode}; stderr tail:\n"
                + "\n".join(out.stderr.strip().splitlines()[-15:])
            )
        r = json.loads(out.stdout.strip().splitlines()[-1])
        if best is None:
            best = r
        else:
            for k, v in r["queries"].items():
                best["queries"][k] = min(best["queries"].get(k, v), v)
    assert best is not None
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True, help="commit to compare against")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default=None, help="dir for raw per-run JSON")
    ap.add_argument(
        "--margin", type=float, default=0.05,
        help="relative noise margin: a query regresses only if BOTH "
        "bracketing HEAD runs are slower than base by more than this "
        "fraction (co-tenant jitter on this host makes epsilon "
        "comparisons meaningless)",
    )
    args = ap.parse_args()

    sha = subprocess.run(
        ["git", "rev-parse", args.base], capture_output=True, text=True,
        cwd=str(REPO), check=True,
    ).stdout.strip()

    wt = Path(tempfile.mkdtemp(prefix="bench_ab_")) / "base"
    subprocess.run(
        ["git", "worktree", "add", "--detach", str(wt), sha],
        cwd=str(REPO), check=True, capture_output=True,
    )
    try:
        print(f"HEAD run 1/2 ...", file=sys.stderr)
        head1 = _run_bench(REPO, args.trials)
        print(f"base {sha[:9]} ...", file=sys.stderr)
        base = _run_bench(wt, args.trials)
        print(f"HEAD run 2/2 (drift sentinel) ...", file=sys.stderr)
        head2 = _run_bench(REPO, args.trials)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", str(wt)],
            cwd=str(REPO), capture_output=True,
        )

    if args.out:
        od = Path(args.out)
        od.mkdir(parents=True, exist_ok=True)
        for name, r in (("head1", head1), ("base", base), ("head2", head2)):
            (od / f"ab_{name}.json").write_text(json.dumps(r))

    shared = sorted(set(base["queries"]) & set(head1["queries"]))
    table, regressions = {}, []
    for q in shared:
        b, h1, h2 = base["queries"][q], head1["queries"][q], head2["queries"][q]
        # slower in BOTH bracketing runs, and by more than the noise margin
        cut = b * (1.0 + args.margin)
        regressed = h1 > cut and h2 > cut
        table[q] = {"base": b, "head1": h1, "head2": h2, "regressed": regressed}
        if regressed:
            regressions.append(q)
    print(json.dumps({"base": sha, "queries": table, "regressions": regressions}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
