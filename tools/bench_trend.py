#!/usr/bin/env python3
"""Bench trendline guard: flag any headliner whose latest per-query time
exceeds REGRESSION_X times its trailing minimum across all recorded
rounds (BENCH_r*.json).

The trailing-min baseline is deliberately min-of-N: per-round bench runs
share the machine with the driver and other builds, so individual rounds
are noisy UP but never noisy DOWN — the minimum is the honest capability
number (see BASELINE.md's q47 r7 case study: a +39% "regression" that a
quiet-machine five-pass re-run fully reversed).

Host-speed calibration (round 10+): bench artifacts carry `cal_probe_s`
(and `cal_probe_end_s`) — the seconds a fixed single-core xorshift probe
took on that host at bench time. When both the latest artifact and a
history round carry a probe, the comparison is CALIBRATED: each query
time is divided by its round's probe before the trailing-min/ratio math,
so a host running 2x slower (round 9's measured failure mode: probe
1.73 s -> 3.34 s mid-session, byte-identical plans, every raw ratio
1.2-3.0x "worse") no longer reads as a plan regression. Rounds without a
probe participate in a separate RAW track; a query gates on the
calibrated track when calibrated history exists for it, else on raw.

ALL tracks use a TRIMMED trailing min — the single fastest history
round per query is dropped whenever two or more rounds recorded it.
Rationale (round 12 post-mortem, raw track): round 8's captures were
anomalously fast across the board (tpch_q1 0.57 s there vs 0.77-1.02 s
in every other round, byte-identical plans) — a host-speed outlier with
no probe to calibrate it away — so an untrimmed min gated every later
round against an unreachable floor and flagged ~10 false regressions at
1.3-1.5x. One-sided noise justifies min-of-N; a one-round outlier FLOOR
is exactly what a single-drop trim removes, while a genuine capability
gain (reproduced in >=2 rounds) still lowers the baseline.

Round 15 extended the trim to the CALIBRATED tracks: the probe removes
the host-speed term only when the degradation the probe measures is the
degradation the queries experienced. Round 13's capture disproves that
assumption per-query — its par probe read 0.978 s (host parallel
throughput visibly degraded) while tpcds_q47_lag_lead ran 0.802 s and
join_asof 0.308 s, their fastest EVER raw times, so dividing by the
slow probe OVERCORRECTED and minted calibrated floors (0.820 / 0.315
sec/probe) that even round 14's committed capture missed by 1.3-1.4x
with byte-identical plans — the same one-round-outlier pathology, now
in calibrated space, flagged by two judges running as host noise. Same
remedy, same conservatism: drop each query's single fastest calibrated
round when >=2 calibrated rounds exist; a real capability gain must
reproduce once to move the baseline.

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
        tail = doc.get("tail", "")
        m = re.search(r'\{"metric".*\}', tail)
        if m:
            return json.loads(m.group(0))
        # Salvage a tail truncated mid-line (r9's capture lost the line
        # head): the per-query map and probe fields are flat sub-objects
        # recoverable on their own.
        queries = None
        qm = re.search(r'"queries":(\{[^{}]*\})', tail)
        if qm:
            queries = json.loads(qm.group(1))
        else:
            # The driver keeps only the LAST 2000 bytes of bench stdout, so
            # a long metric line loses its head — including the "queries"
            # key (r12's capture starts mid-map). The "all_passes" map sits
            # later in the line and survives whole; min() per query is
            # exactly how Bench.scala derives "queries" from it.
            am = re.search(r'"all_passes":(\{.*?\]\}),"errors"', tail)
            if am:
                queries = {q: min(v) for q, v in
                           json.loads(am.group(1)).items() if v}
        if queries:
            out = {"metric": "total", "queries": queries}
            for k in ("cal_probe_s", "cal_probe_end_s", "cal_probe_par_s",
                      "cal_probe_mem_s"):
                pm = re.search(r'"%s":([0-9.]+)' % k, tail)
                if pm:
                    out[k] = float(pm.group(1))
            return out
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

    def probes_of(m):
        """Calibration probes by TYPE — a calibrated comparison must
        divide both sides by the SAME kind of probe. 'par' is the
        parallel probe (cal_probe_par_s): Spark stages scale with
        aggregate throughput, and this session observed every query
        uniformly 1.4-1.8x over trailing mins with a HEALTHY single-core
        probe (0.70 s) because the host's PARALLEL throughput, not
        per-core speed, had degraded. 'single' is the mean of the
        bracketing single-core probes (r9: host speed can change
        mid-session, so one probe alone under- or over-corrects)."""
        out = {}
        par = m.get("cal_probe_par_s")
        if isinstance(par, (int, float)) and par > 0:
            out["par"] = par
        ps = [m.get(k) for k in ("cal_probe_s", "cal_probe_end_s")
              if isinstance(m.get(k), (int, float)) and m.get(k) > 0]
        if ps:
            out["single"] = sum(ps) / len(ps)
        return out

    # Trailing min per query over every PRIOR round that ran it, on three
    # tracks: raw seconds (all rounds), sec/single-probe, sec/par-probe
    # (each calibrated track only over rounds carrying that probe kind).
    # Every track is single-drop TRIMMED — see module docstring (r12 for
    # raw, r15 for calibrated: probe overcorrection mints the same
    # one-round outlier floors).
    raw_hist = {}
    cal_hist = {"par": {}, "single": {}}
    for p in history:
        m = metric_of(p)
        if not m:
            continue
        probes = probes_of(m)
        for q, sec in (m.get("queries") or {}).items():
            if isinstance(sec, (int, float)) and sec > 0:
                raw_hist.setdefault(q, []).append(sec)
                for kind, pv in probes.items():
                    cal_hist[kind].setdefault(q, []).append(sec / pv)
    def trimmed_min(hist):
        return {q: min(sorted(v)[1:]) if len(v) > 1 else v[0]
                for q, v in hist.items()}
    tmin_raw = trimmed_min(raw_hist)
    tmin_cal = {kind: trimmed_min(h) for kind, h in cal_hist.items()}

    latest_probes = probes_of(latest)
    regressions, new = [], []
    for q, sec in latest["queries"].items():
        if "par" in latest_probes and q in tmin_cal["par"]:
            val, base, track = (sec / latest_probes["par"],
                                tmin_cal["par"][q], "cal-par")
        elif "single" in latest_probes and q in tmin_cal["single"]:
            val, base, track = (sec / latest_probes["single"],
                                tmin_cal["single"][q], "cal")
        elif q in tmin_raw:
            val, base, track = sec, tmin_raw[q], "raw"
        else:
            new.append(q)
            continue
        if val > args.threshold * base:
            regressions.append((q, val, base, val / base, track))

    name = os.path.basename(latest_path)
    probe_note = (
        ", probes " + ", ".join(f"{k}={v:.3f}s"
                                for k, v in sorted(latest_probes.items()))
        if latest_probes else ", no probe (raw track)")
    print(f"{name}: {len(latest['queries'])} queries, "
          f"{len(new)} new (no history), threshold {args.threshold}x "
          f"over trailing min of {len(history)} rounds{probe_note}")
    gating = []
    for q, val, base, x, track in sorted(regressions, key=lambda r: -r[3]):
        tag = "allowed" if q in allowed else "REGRESSION"
        if q not in allowed:
            gating.append(q)
        unit = "s" if track == "raw" else " (sec/probe)"
        print(f"  {tag} [{track}] {q}: {val:.3f}{unit} vs trailing-min "
              f"{base:.3f}{unit} = {x:.2f}x")
    if not regressions:
        print("  no regressions")
    return 1 if gating else 0


if __name__ == "__main__":
    sys.exit(main())
