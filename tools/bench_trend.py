#!/usr/bin/env python3
"""Bench trendline guard: flag any headliner whose latest per-query time
exceeds REGRESSION_X times its trailing minimum across all recorded
rounds (BENCH_r*.json).

The trailing-min baseline is deliberately min-of-N: per-round bench runs
share the machine with the driver and other builds, so individual rounds
are noisy UP but never noisy DOWN — the minimum is the honest capability
number (see BASELINE.md's q47 r7 case study: a +39% "regression" that a
quiet-machine five-pass re-run fully reversed).

Usage:
    python3 tools/bench_trend.py [--latest BENCH_rX.json] [--threshold 1.3]

Exit 1 if any query regresses, 0 otherwise. Run as part of the round-end
checklist with the newest bench file (or a freshly captured metric line
saved to a file).
"""
import argparse
import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def metric_of(path):
    """Extract the {"metric":...} JSON from a driver bench capture: either
    the pre-parsed field, the raw tail text, or the file itself being the
    bare metric line."""
    with open(path) as f:
        doc = json.load(f)
    if isinstance(doc, dict) and doc.get("metric"):
        return doc
    if isinstance(doc, dict):
        if isinstance(doc.get("parsed"), dict):
            return doc["parsed"]
        m = re.search(r'\{"metric".*\}', doc.get("tail", ""))
        if m:
            return json.loads(m.group(0))
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--latest", help="bench file to grade "
                    "(default: highest-numbered BENCH_r*.json)")
    ap.add_argument("--threshold", type=float, default=1.3,
                    help="regression factor over trailing min (default 1.3)")
    ap.add_argument("--allow", default="",
                    help="comma-separated queries with a DOCUMENTED "
                    "deliberate regression (recorded in BASELINE.md); "
                    "reported but not gating")
    args = ap.parse_args()
    allowed = {q for q in args.allow.split(",") if q}

    paths = sorted(glob.glob(os.path.join(HERE, "BENCH_r*.json")))
    if args.latest:
        latest_path = args.latest
        history = [p for p in paths
                   if os.path.abspath(p) != os.path.abspath(latest_path)]
    else:
        if not paths:
            print("no BENCH_r*.json found", file=sys.stderr)
            return 2
        latest_path, history = paths[-1], paths[:-1]

    latest = metric_of(latest_path)
    if not latest or not latest.get("queries"):
        print(f"could not parse metric line from {latest_path}",
              file=sys.stderr)
        return 2

    # trailing min per query over every PRIOR round that ran it
    tmin = {}
    for p in history:
        m = metric_of(p)
        if not m:
            continue
        for q, sec in (m.get("queries") or {}).items():
            if isinstance(sec, (int, float)) and sec > 0:
                tmin[q] = min(tmin.get(q, float("inf")), sec)

    regressions, new = [], []
    for q, sec in latest["queries"].items():
        base = tmin.get(q)
        if base is None:
            new.append(q)
        elif sec > args.threshold * base:
            regressions.append((q, sec, base, sec / base))

    name = os.path.basename(latest_path)
    print(f"{name}: {len(latest['queries'])} queries, "
          f"{len(new)} new (no history), threshold {args.threshold}x "
          f"over trailing min of {len(history)} rounds")
    gating = []
    for q, sec, base, x in sorted(regressions, key=lambda r: -r[3]):
        tag = "allowed" if q in allowed else "REGRESSION"
        if q not in allowed:
            gating.append(q)
        print(f"  {tag} {q}: {sec:.3f}s vs trailing-min {base:.3f}s "
              f"= {x:.2f}x")
    if not regressions:
        print("  no regressions")
    return 1 if gating else 0


if __name__ == "__main__":
    sys.exit(main())
