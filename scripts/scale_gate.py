#!/usr/bin/env python3
"""Scale gate: fail if any registry query scales superlinearly across a
data decade (r14 verdict item 8 — turn the hand-driven sf1/sf10 round
ritual into a failing check instead of a judge catch).

Usage:
  # generate the decade fixtures (deterministic, ~158 MB / ~1.6 GB):
  sbt -batch "runMain graft.tools.GenSf1 /root/testdata/sf0.1 tmp/sf1"
  sbt -batch "runMain graft.tools.GenSf1 tmp/sf1 tmp/sf10"
  # bench each scale once (runs=1 — a scale run is a factor probe, not a
  # latency measurement; min-of-3 at sf1+ would triple a ~10 min run):
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=1 \
    SPARK_GRAFT_BENCH_QFILE=tmp/bq_sf0.1.json sbt -batch "runMain graft.Bench"
  SPARK_GRAFT_SF_DIR=tmp/sf1 SPARK_GRAFT_BENCH_RUNS=1 \
    SPARK_GRAFT_BENCH_QFILE=tmp/bq_sf1.json sbt -batch "runMain graft.Bench"
  # gate one decade against the one below it:
  python3 scripts/scale_gate.py tmp/bq_sf0.1.json tmp/bq_sf1.json

Reads the per-query maps Bench writes, computes each query's decade
factor t_hi / max(t_lo, FLOOR_S), and exits non-zero listing:
  - any query that FAILED at the high scale (-1 in the map),
  - any query missing from either map (registry drift between the runs),
  - any factor above its band (DEFAULT_FACTOR_X, or the ALLOWLIST below).

Band rationale: 10x data through a linear plan on a fixed 32-thread box
is <= ~10x wall, and small-wall queries amortize fixed overheads (session
setup, broadcast floors) so their factor is usually far BELOW 10. The
default band is 15x: a decade factor past that is a plan that changed
complexity class, not host noise. The FLOOR_S denominator clamp keeps a
0.05 s -> 1.0 s fixed-overhead move (factor "20") from flapping the gate
on queries whose low-scale wall is all constant cost.

Every ALLOWLIST entry must name WHY the factor is output-sensitive or
otherwise legitimately superlinear, with the measured band it was
admitted at — a regression WITHIN the allowlist is still visible because
the band is ~1.5x the measured factor, not unbounded.
"""
import json
import sys

# 18x, not a tight 10-12x: the high-scale map is a runs=1 IN-FLEET
# sweep (min-of-N at sf1+ would multiply a ~45 min run), and r13-r15
# all measured individual in-run walls up to ~1.5-2x their isolated
# min-of-3 receipts (GC/page-cache contamination from neighboring
# queries — q123 is the classified example). A linear plan under that
# noise reads as <= ~15-17x; a complexity-class change reads as 30x+.
# The r15 local[32] sweeps measured worst non-allowlisted factors
# 14.2x (sf0.1->sf1) and 16.4x (sf1->sf10).
DEFAULT_FACTOR_X = 18.0
FLOOR_S = 1.0

# Queries whose decade factor legitimately exceeds the default band.
# Factors measured r15 at the driver config (local[32]; sf0.1 min-of-3,
# sf1/sf10 runs=1 in-fleet). Bands are ~1.5-2x the measured factor — a
# regression WITHIN the allowlist stays visible.
ALLOWLIST = {
    "226": (30.0, "A-priori triples at ABSOLUTE minsup=2: the answer set "
                  "itself grows with density (output-sensitive by design "
                  "— the L2 pair set inflates 3.5k -> 1.2M across the "
                  "sf0.1->sf1 knee). The r18 basket-array rewrite removed "
                  "every self-join and halved the absolute walls "
                  "(isolated receipts 0.53 s -> 19.6 s -> 46.2 s, i.e. "
                  "19.6x floored at the knee and 2.4x the decade after) "
                  "but the knee IS the answer-set inflation, so the row "
                  "stays; q332 is the relative-minsup production form, "
                  "receipted 9.8x/2.3x/7.2x through sf100)"),
    # r16: q50 and q64 LEFT this allowlist — both now auto-gate on corpus
    # size (the auditUseAnn idiom): exact/library mode at fixture SFs
    # (oracle-identical), IVF-cell / AND-banded candidates above 10k rows
    # (EmbDedupAnnSpec / MlLshAnnSpec pin subset + recall). Their decade
    # factors must now sit inside the default band like every linear plan.
}


def load(path):
    with open(path) as f:
        rec = json.load(f)
    return rec["sf"], {q: float(s) for q, s in rec["queries"].items()}


def main(lo_path, hi_path):
    lo_sf, lo = load(lo_path)
    hi_sf, hi = load(hi_path)
    bad = []
    for q in sorted(set(lo) | set(hi), key=int):
        if q not in lo or q not in hi:
            bad.append((q, "MISSING", f"absent from {'low' if q not in lo else 'high'}-scale map — registry drift between runs"))
            continue
        if hi[q] < 0:
            bad.append((q, "FAILED", f"every run failed at {hi_sf}"))
            continue
        if lo[q] < 0:
            bad.append((q, "FAILED", f"every run failed at {lo_sf}"))
            continue
        factor = hi[q] / max(lo[q], FLOOR_S)
        band, why = ALLOWLIST.get(q, (DEFAULT_FACTOR_X, "default band"))
        if factor > band:
            bad.append((q, f"{factor:.1f}x > {band:.0f}x",
                        f"{lo[q]:.2f} s @ {lo_sf} -> {hi[q]:.2f} s @ {hi_sf} ({why})"))
    n = len(set(lo) | set(hi))
    tot_lo = sum(s for s in lo.values() if s >= 0)
    tot_hi = sum(s for s in hi.values() if s >= 0)
    print(f"scale_gate: {n} queries, {lo_sf} {tot_lo:.1f} s -> {hi_sf} {tot_hi:.1f} s "
          f"(aggregate factor {tot_hi / max(tot_lo, FLOOR_S):.1f}x)")
    if bad:
        print(f"RED — {len(bad)} offender(s):")
        for q, tag, detail in bad:
            print(f"  q{q}: {tag} — {detail}")
        return 1
    worst = max(((hi[q] / max(lo[q], FLOOR_S), q) for q in lo if q in hi and hi[q] >= 0 and lo[q] >= 0), default=(0, "-"))
    print(f"GREEN — worst factor {worst[0]:.1f}x (q{worst[1]}), all inside band")
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
