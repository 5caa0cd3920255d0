#!/usr/bin/env python3
"""Round-over-round bench regression gate, SENTINEL-NORMALIZED (dev tool).

Compares two bench_full.json artifacts. Each artifact (r13+) carries
`sentinel_sec` / `sentinel_end_sec`: the min-of-3 time of a fixed synthetic
CPU+shuffle workload that never touches the library or the testdata, so it
can only move with the MACHINE (noisy neighbors, turbo state) or the Spark
version — never with the code under grade. The per-query ratio new/old is
divided by the sentinel ratio before the gate, so a +12% evening-load run
(the documented same-binary drift that tripped w6d_kml three rounds in a
row) produces zero false regressions while a real code regression still
trips at the same threshold.

Usage: bench_compare.py OLD.json NEW.json [--ratio-max 1.3] [--abs-floor 0.5]

Gate: a query regresses iff  (new/old) / calib > ratio_max  AND
      new - old > abs_floor seconds (absolute floor keeps sub-second
      timer noise out, same convention as the historical gate).
Exit 1 iff any query regresses. Queries present on only one side are
listed informationally (added/removed), never gated.
"""
import json
import sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
opts = {a.split("=")[0]: a.split("=")[1] for a in sys.argv[1:]
        if a.startswith("--") and "=" in a}
RATIO_MAX = float(opts.get("--ratio-max", 1.3))
ABS_FLOOR = float(opts.get("--abs-floor", 0.5))
if len(args) != 2:
    print(__doc__)
    sys.exit(2)

old = json.load(open(args[0]))
new = json.load(open(args[1]))


def sentinel(d):
    # use the mid-suite estimate: mean of start/end sentinels when both
    # exist (load can drift DURING a 3-minute suite), else whichever is
    # present, else None (pre-r13 artifact)
    s0, s1 = d.get("sentinel_sec"), d.get("sentinel_end_sec")
    vals = [v for v in (s0, s1) if isinstance(v, (int, float)) and v > 0]
    return sum(vals) / len(vals) if vals else None


so, sn = sentinel(old), sentinel(new)
calib = (sn / so) if (so and sn) else 1.0
qo, qn = old["queries"], new["queries"]
common = sorted(set(qo) & set(qn))
added = sorted(set(qn) - set(qo))
removed = sorted(set(qo) - set(qn))

regressions, movers = [], []
for q in common:
    o, n = qo[q], qn[q]
    if o <= 0:
        continue
    raw = n / o
    norm = raw / calib
    if norm > RATIO_MAX and (n - o) > ABS_FLOOR:
        regressions.append((q, o, n, raw, norm))
    elif raw > RATIO_MAX and (n - o) > ABS_FLOOR:
        movers.append((q, o, n, raw, norm))  # raw trip absorbed by calib

tot_o = sum(qo[q] for q in common)
tot_n = sum(qn[q] for q in common)
print(f"[compare] {len(common)} common queries; total {tot_o:.1f}s -> "
      f"{tot_n:.1f}s (raw {tot_n / tot_o:.3f}x, "
      f"normalized {tot_n / tot_o / calib:.3f}x)")
print(f"[compare] sentinel old={so} new={sn} calib={calib:.3f} "
      f"(per-query ratios divided by this before the "
      f"{RATIO_MAX}x/{ABS_FLOOR}s gate)")
if added:
    print(f"[compare] new queries (not gated): {', '.join(added)}")
if removed:
    print(f"[compare] removed queries: {', '.join(removed)}")
for q, o, n, raw, norm in movers:
    print(f"[compare] NOISE-ABSORBED {q}: {o:.3f}s -> {n:.3f}s "
          f"(raw {raw:.2f}x, normalized {norm:.2f}x <= {RATIO_MAX}x)")
for q, o, n, raw, norm in regressions:
    print(f"[compare] REGRESSION {q}: {o:.3f}s -> {n:.3f}s "
          f"(raw {raw:.2f}x, normalized {norm:.2f}x > {RATIO_MAX}x)")
print(f"[compare] {len(regressions)} regression(s), "
      f"{len(movers)} raw trip(s) absorbed by sentinel calibration")
sys.exit(1 if regressions else 0)
