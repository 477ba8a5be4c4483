#!/usr/bin/env python3
"""Round-over-round bench drift adjudicator (r15, verdict item 5).

Joins two bench artifacts' per-query seconds and annotates every delta
above a threshold with whether the query's code plausibly changed in
the intervening commits — separating "the engine moved" from "the host
was busy" without hand-joining, the analysis the r14 judge did manually.

Usage:
  tools/bench_diff.py OLD.json NEW.json [--git-range A..B] [--thresh 0.3]

Accepts either the driver's BENCH_r{N}.json wrapper (reads .parsed and
.tail env fingerprints) or a raw Bench stdout line / bench_detail.json.
A query is marked code-changed when any file changed in --git-range
mentions the query name, or is one of the operator/core files the
query's defining file imports is too deep to trace — so the annotation
is "its defining file or a file naming it changed", a deliberate
overapproximation (core/ changes mark EVERY query, which is correct:
a Tables/Materialize change can move every row).
"""
import argparse
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def load(path):
    with open(path) as f:
        d = json.load(f)
    parsed = d.get("parsed", d)
    queries = parsed.get("queries", {})
    env = parsed.get("env", {})
    return {
        "total": parsed.get("value"),
        "queries": queries,
        "load_pre": env.get("load_pre", ""),
        "calib": (env.get("calib_pre_sec"), env.get("calib_post_sec")),
        "floor": env.get("floor_probe_sec"),
    }


def changed_files(git_range):
    out = subprocess.run(
        ["git", "diff", "--name-only", git_range],
        cwd=REPO, capture_output=True, text=True, check=True).stdout
    return [l for l in out.splitlines() if l.strip()]


def query_to_files(names):
    """Map each query name to the repo files that mention it (grep -l)."""
    mapping = {}
    src = REPO / "src" / "main" / "scala"
    files = list(src.rglob("*.scala"))
    texts = {f: f.read_text(errors="replace") for f in files}
    for name in names:
        mapping[name] = [str(f.relative_to(REPO))
                         for f, t in texts.items() if name in t]
    return mapping


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--git-range", default=None,
                    help="commit range whose diff defines 'code changed' "
                         "(default: merge-base of the two artifacts is "
                         "unknowable — pass it explicitly, e.g. r14tag..HEAD)")
    ap.add_argument("--thresh", type=float, default=0.3)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    changed = set(changed_files(args.git_range)) if args.git_range else None
    # core/ harness files move every row
    core_changed = changed and any(
        c.startswith("src/main/scala/graft/core/") or
        c == "src/main/scala/graft/Bench.scala" for c in changed)

    names = sorted(set(old["queries"]) | set(new["queries"]))
    deltas, onesided = [], []
    for n in names:
        a, b = old["queries"].get(n), new["queries"].get(n)
        if a is None or b is None:
            # the driver's BENCH_r{N}.json keeps only the stdout tail's
            # slowest rows — a one-sided row usually just ran under the
            # other board's tail cutoff, it was not added or removed
            onesided.append((n, a, b))
        elif abs(b - a) > args.thresh:
            deltas.append((n, a, b, b - a))
    qfiles = query_to_files([n for n, *_ in deltas]) if changed else {}

    print(f"# bench diff: {args.old} -> {args.new}")
    print(f"totals: {old['total']} -> {new['total']} s  "
          f"(sum over shared stdout-tail rows; full boards may list more)")
    print(f"env: load_pre {old['load_pre']!r} -> {new['load_pre']!r}, "
          f"calib {old['calib']} -> {new['calib']}, "
          f"floor {old['floor']} -> {new['floor']}")
    if core_changed:
        print("NOTE: core/harness files changed in range — every row may move")
    print()
    print("| query | old s | new s | delta | code changed in range |")
    print("|---|---|---|---|---|")
    for n, a, b, d in sorted(deltas, key=lambda x: -abs(x[3])):
        if changed is None:
            ann = "(pass --git-range)"
        else:
            hits = [f for f in qfiles.get(n, []) if f in changed]
            if core_changed:
                hits.append("core/*")
            ann = ", ".join(sorted(set(hits))) or "NO — host/JIT noise candidate"
        print(f"| {n} | {a:.2f} | {b:.2f} | {d:+.2f} | {ann} |")
    if not deltas:
        print(f"| (no per-query delta over {args.thresh}s) | | | | |")
    if onesided:
        worst = sorted(onesided, key=lambda x: -(x[1] or x[2] or 0))[:6]
        print(f"\n{len(onesided)} rows appear in only one stdout tail "
              f"(the other board ran them under its tail cutoff) — worst: "
              + ", ".join(f"{n}={a or b}s({'old' if a else 'new'})"
                          for n, a, b in worst))


if __name__ == "__main__":
    sys.exit(main())
