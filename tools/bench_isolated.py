#!/usr/bin/env python3
"""Isolated-vs-in-suite bench cross-check (dev tool — NOT part of the library).

The full-suite bench (graft.Bench, all queries, min-of-N with memo eviction
at pass boundaries) is the committed per-round number, but nothing proves a
query's IN-SUITE minimum tracks what it costs in a session of its own —
suite interference (GC debt, noisy neighbors on a shared box, block-manager
pressure from 200 earlier queries) could inflate it silently, and round 7/9
saw single-query spreads up to 5.6x from exactly that.

This gate re-measures a handful of historically-spready + heavy headline
queries, each in a FRESH JVM (its own sbt runMain => its own SparkSession,
nothing shared), and asserts:

    in_suite_min <= RATIO_MAX * isolated_min   for every checked query

(isolated runs pay their own JIT warm-up, so min-of-REPEATS within the
isolated session is the comparable estimator; historically in-suite minima
sit AT OR BELOW isolated ones because the suite amortizes codegen).

Writes bench_isolated.json next to bench_full.json and exits nonzero on a
gate breach. Usage:

    python3 tools/bench_isolated.py [sfDir] [ratio] [names...]

Defaults: sfDir=/root/testdata/sf0.1, ratio=1.2, the 7 queries below.
Requires a current bench_full.json (run `runMain graft.Bench` first).
"""
import json, os, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RATIO_MAX = float(sys.argv[2]) if len(sys.argv) > 2 else 1.2
# the historically-spready trio (w6d 5.6x, p1 4.1x, j9 3.0x in r9) plus
# three heavies covering graph / composed-pipeline / span-index families,
# plus sim6 (concurrent per-subspace fits since r11 — the one query whose
# cost model depends on free scheduler slots, exactly what a loaded suite
# might not have)
DEFAULT = ["w6d_kml", "p1_quality_filter", "j9_case_insensitive_join",
           "g2_pagerank", "cur9_curation_deterministic", "dd14_span_removal",
           "sim6_pq_ann"]
NAMES = sys.argv[3:] or DEFAULT

full_path = os.path.join(REPO, "bench_full.json")
with open(full_path) as f:
    full = json.load(f)
if os.path.basename(full.get("sf", "")) != os.path.basename(SF):
    print(f"bench_full.json is for sf={full.get('sf')}, gate asked for {SF}")
    sys.exit(2)
suite_min = full["queries"]

env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF)
rows = {}
breaches = []
for name in NAMES:
    if name not in suite_min:
        print(f"[isolated] {name}: not in bench_full.json, skipping")
        continue
    # fresh JVM per query: sbt -batch is a new process, runMain a new
    # SparkSession; bench writes the name-filtered run to bench_partial.json
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Bench {name}"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600)
    if r.returncode != 0:
        print((r.stdout + r.stderr)[-2000:])
        sys.exit(1)
    with open(os.path.join(REPO, "bench_partial.json")) as f:
        part = json.load(f)
    iso = part["queries"][name]
    ins = suite_min[name]
    ratio = ins / iso if iso > 0 else float("inf")
    rows[name] = {"isolated_min_sec": round(iso, 3),
                  "in_suite_min_sec": round(ins, 3),
                  "ratio": round(ratio, 3)}
    verdict = "OK" if ratio <= RATIO_MAX else "BREACH"
    print(f"[isolated] {name}: isolated {iso:.3f}s  in-suite {ins:.3f}s  "
          f"ratio {ratio:.2f}  {verdict}")
    if ratio > RATIO_MAX:
        breaches.append(name)

out = {"sf": SF, "ratio_max": RATIO_MAX, "repeats_env":
       os.environ.get("SPARK_GRAFT_REPEATS", "3"), "queries": rows,
       "breaches": breaches}
with open(os.path.join(REPO, "bench_isolated.json"), "w") as f:
    json.dump(out, f, indent=1)
    f.write("\n")
print(f"[isolated] wrote bench_isolated.json; "
      f"{len(breaches)} breach(es) at ratio_max={RATIO_MAX}")
sys.exit(1 if breaches else 0)
