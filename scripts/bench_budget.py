#!/usr/bin/env python3
"""Bench-budget gate: fail if any registry query exceeds its time budget.

The r11 lesson: q269 landed in the final hour without a full-registry
re-bench, its CC loop cost ~11-14 min/run at sf0.1, and the driver's
bench gate died on timeout for the round — a class of regression this
script turns into a red check instead of a driver timeout.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench"
  python3 scripts/bench_budget.py [bench_queries.json]

Reads the per-query min-of-runs map Bench writes (qNN bare-number keys),
applies DEFAULT_BUDGET_S to every query, and the explicit allowlist below
to deliberately heavy queries (each with its recorded expected band, so a
regression WITHIN the allowlist is still visible). Exits non-zero listing
offenders and any query whose every run failed (-1).

Process rule this script enforces (PLANS.md r12): any NEW registry query
must be benched at sf0.1 and pass this gate BEFORE the end-of-round
snapshot; the final commit of a round touches no queries/*.scala.
"""
import json
import os
import sys

DEFAULT_BUDGET_S = 30.0

# Fleet-vs-isolated self-report (r16 verdict #2): the r16 driver total
# swung +11% on zero owned per-query cause, and classifying it as
# in-fleet contamination took manual archaeology. ISOLATED_BENCH.json
# (committed at round close; written by the round recipe) records the
# same-code isolated HEAD min-of-3 total, and this gate prints the
# ratio every run. A gap past the threshold fails LOUDLY with the
# classification attached — the number on the scoreboard then explains
# itself instead of reading as a silent regression.
ISOLATED_FILE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "ISOLATED_BENCH.json")
FLEET_VS_ISOLATED_MAX = 1.15

# Total-wall ceiling (r12 verdict item 5): the driver's bench timeout is
# real but unknown — r10/r11 both blacked out past it. The r13 driver run
# recorded 167.5 s for 331 queries; the r14 local full run measured
# 169.6 s for 332 on a host a same-session identical-code A/B showed
# running ~24% slower than the r13 session (host-adjusted ≈ 137 s).
# The driver environment has run up to ~3x slower than local on bad
# days. A projected total past this line means the NEXT driver bench is
# at risk even if every individual query is inside its own budget —
# creeping totals fail loudly here instead of as a silent rc:124.
TOTAL_BUDGET_S = 240.0

# Deliberately heavy queries: iteration count or verify-join IS the
# algorithm. Budgets are ~3x their measured sf0.1 min-of-3 band so host
# noise doesn't flap the gate, but a q269-class blowup still trips it.
# Bands refreshed r15 from the full in-fleet local[32] run (181.5 s
# total; same-session spot runs read 143-181 s, so in-fleet totals on
# this box swing ~±20% run-to-run — the BANDS are min-of-3 and far
# steadier than the total). NOTE: sf0.1 walls are overhead-dominated
# and nearly parallelism-insensitive (r15 measured local[4] vs
# local[32] median ratio 1.009 across the registry), but record bands
# ONLY from SPARK_GRAFT_CPUS=32 runs — at sf1+ the thread count is
# worth 2-5x on the heavy kernels.
ALLOWLIST = {
    "167": (15.0, "PageRank: 10 fixed iterations, 4.5 s band (r15 in-fleet)"),
    "228": (15.0, "PPJoin: verify join is the algorithm, 5.4 s band (r15 "
                  "in-fleet). r16 receipt for the r15 driver 8.2 s wall: "
                  "isolated driver-format min-of-3 is 5.23 s at HEAD — "
                  "bit-unchanged code, so 8.2 s was in-fleet contamination "
                  "(~1.5x, the classified class), not a regression"),
    "76": (12.0, "near-dup CC clustering, 4.6 s band (r15 in-fleet)"),
    "244": (10.0, "sorted-neighborhood two-phase rank, 3.0 s band (r15 in-fleet)"),
    "269": (12.0, "DBSCAN: grid eps-join + CC, 4.9 s band (r15 in-fleet)"),
    "190": (15.0, "A-priori frequent pairs, absolute minsup: candidate "
                  "enumeration scans every basket, 0.9 s band after the "
                  "basket-memo (r15 in-fleet, was 5.0 s)"),
    "332": (15.0, "A-priori triples, relative minsup: 2.4 s band after the "
                  "basket-memo (r15 in-fleet, was 4.8 s)"),
    "277": (10.0, "PQ retrieve+rerank: Lloyd codebook training floor, "
                  "3.3 s band (r15 in-fleet)"),
}


def main(path):
    with open(path) as f:
        rec = json.load(f)
    qs = rec["queries"]
    bad = []
    for q, sec in sorted(qs.items(), key=lambda kv: int(kv[0])):
        budget, why = ALLOWLIST.get(q, (DEFAULT_BUDGET_S, "default"))
        if sec < 0:
            bad.append(f"q{q}: every run FAILED")
        elif sec > budget:
            bad.append(f"q{q}: {sec:.3f} s > budget {budget:.1f} s ({why})")
    total = sum(v for v in qs.values() if v >= 0)
    print(f"bench_budget: {len(qs)} queries, total {total:.1f} s "
          f"(sf={rec.get('sf')}, runs={rec.get('runs')}), "
          f"wall ceiling {TOTAL_BUDGET_S:.0f} s "
          f"(headroom {TOTAL_BUDGET_S - total:+.1f} s)")
    try:
        with open(ISOLATED_FILE) as f:
            iso = json.load(f)
    except (OSError, ValueError):
        iso = None
    if iso and iso.get("sf") == rec.get("sf") and iso.get("total", 0) > 0:
        ratio = total / iso["total"]
        print(f"fleet_vs_isolated: {ratio:.2f}x (this run {total:.1f} s vs "
              f"isolated HEAD min-of-{iso.get('runs', '?')} "
              f"{iso['total']:.1f} s @ {iso.get('git', '?')[:9]}, "
              f"recorded {iso.get('recorded', '?')})")
        if ratio > FLEET_VS_ISOLATED_MAX:
            bad.append(
                f"FLEET_VS_ISOLATED: {ratio:.2f}x > {FLEET_VS_ISOLATED_MAX}x"
                f" - the measured run is >15% above the same-code isolated"
                f" receipt. Classification: in-fleet/host contamination"
                f" (identical code, slower wall - the documented class:"
                f" two-sweep A/A at sf10 showed 4-7x single-query spikes"
                f" between identical-code runs). Re-measure isolated before"
                f" reading this as a code regression; if an ISOLATED re-run"
                f" also moved, it IS owned - bisect per-query vs"
                f" BENCH_QUERIES_r{{N-1}}.json")
    elif iso:
        print(f"fleet_vs_isolated: n/a (receipt sf={iso.get('sf')} vs "
              f"run sf={rec.get('sf')})")
    else:
        print("fleet_vs_isolated: no ISOLATED_BENCH.json receipt - record "
              "one at round close (round recipe step)")
    if total > TOTAL_BUDGET_S:
        bad.append(f"TOTAL: {total:.1f} s > wall budget {TOTAL_BUDGET_S:.1f} s"
                   " (driver bench timeout risk - trim the heavy tail before"
                   " adding queries)")
    if bad:
        print("\n".join("OVER " + b for b in bad))
        return 1
    print("all queries within budget")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "bench_queries.json"))
