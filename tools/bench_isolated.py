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

SELF-ADJUDICATION (the r11 w6d_kml lesson: a single-sample 1.2x gate on a
+-0.5s query trips on noise, and the exoneration lived only in NOTES prose):
a first-pass breach is a HYPOTHESIS, not a verdict. On breach the gate
re-measures the isolated side K-1 more times (K fresh JVMs total, each
min-of-REPEATS internally), gates on the MEDIAN of the K isolated minima,
and writes every sample plus a machine verdict into bench_isolated.json:

    noise        — the median-isolated ratio clears RATIO_MAX: the first
                   isolated sample was a lucky-low outlier; not a breach.
    interference — the ratio holds against the median: the query really is
                   slower in-suite than in a session of its own.

The in-suite side is already a min-of-REPEATS over full-suite passes (its
spread and cold columns from bench_full.json are copied into the artifact
for context), so the single-sample hazard lives on the isolated side — that
is the side the adjudication resamples. Only `interference` verdicts remain
in `breaches` / fail the exit code; `noise` trips are recorded under
`noise_trips` with their full sample evidence.

Writes bench_isolated.json next to bench_full.json and exits nonzero on an
adjudicated breach. Usage:

    python3 tools/bench_isolated.py [sfDir] [ratio] [names...]

Defaults: sfDir=/root/testdata/sf0.1, ratio=1.2, the 7 queries below,
K=SPARK_GRAFT_ADJUDICATE_RUNS (default 3).
Requires a current bench_full.json (run `runMain graft.Bench` first).
"""
import json, os, statistics, subprocess, sys

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
ADJ_RUNS = max(int(os.environ.get("SPARK_GRAFT_ADJUDICATE_RUNS", "3")), 2)

full_path = os.path.join(REPO, "bench_full.json")
with open(full_path) as f:
    full = json.load(f)
if os.path.basename(full.get("sf", "")) != os.path.basename(SF):
    print(f"bench_full.json is for sf={full.get('sf')}, gate asked for {SF}")
    sys.exit(2)
suite_min = full["queries"]
suite_spread = full.get("spread", {})
suite_cold = full.get("cold", {})

env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF)


def isolated_run(name):
    """One fresh JVM (sbt -batch => new process, runMain => new
    SparkSession); bench writes the name-filtered run to
    bench_partial.json and reports the min over its internal repeats."""
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Bench {name}"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600)
    if r.returncode != 0:
        print((r.stdout + r.stderr)[-2000:])
        sys.exit(1)
    with open(os.path.join(REPO, "bench_partial.json")) as f:
        return json.load(f)["queries"][name]


rows = {}
breaches = []
noise_trips = []
for name in NAMES:
    if name not in suite_min:
        print(f"[isolated] {name}: not in bench_full.json, skipping")
        continue
    iso_samples = [isolated_run(name)]
    ins = suite_min[name]
    ratio = ins / iso_samples[0] if iso_samples[0] > 0 else float("inf")
    row = {"isolated_min_sec": round(iso_samples[0], 3),
           "in_suite_min_sec": round(ins, 3),
           "in_suite_spread": suite_spread.get(name),
           "in_suite_cold_sec": suite_cold.get(name),
           "ratio": round(ratio, 3)}
    if ratio > RATIO_MAX:
        # first-pass breach: resample the isolated side to K fresh-JVM
        # minima and adjudicate on the median ratio
        print(f"[isolated] {name}: first-pass ratio {ratio:.2f} > "
              f"{RATIO_MAX} — adjudicating with {ADJ_RUNS - 1} more "
              f"fresh-JVM run(s)")
        while len(iso_samples) < ADJ_RUNS:
            iso_samples.append(isolated_run(name))
        med = statistics.median(iso_samples)
        ratio_med = ins / med if med > 0 else float("inf")
        # two noise grounds, both evidence-in-the-artifact:
        #  (a) the median-ratio clears the gate (the isolated FIRST run
        #      was the outlier), or
        #  (b) the in-suite minimum lies within the isolated sample
        #      ENVELOPE — the query running ALONE on a fresh JVM has
        #      been observed to cost this much, so the suite cannot be
        #      what inflated it (bimodal JIT/GC queries like w6d_kml:
        #      fresh-JVM samples span 2.07–4.00 s on one binary).
        # Only a suite number the solo query never reaches is
        # interference. Robustness (r12 advice): one slow solo outlier
        # must not exonerate — the suite minimum has to be reached by at
        # least TWO of the K fresh-JVM samples (i.e. <= the second-
        # largest sample, with 5% measurement slack).
        second_largest = sorted(iso_samples)[-2] if len(iso_samples) >= 2 \
            else iso_samples[0]
        envelope_ok = ins <= second_largest * 1.05
        # absolute floor (r14): the same 0.5 s convention every other
        # gate applies (bench_compare.py's abs_floor) — a ratio trip
        # whose absolute delta is sub-half-second is shared-box timer
        # noise, not a finding; without this the gate is stricter on
        # fast queries than the round-over-round gate it cross-checks
        sub_floor = (ins - med) <= 0.5
        verdict = ("noise" if ratio_med <= RATIO_MAX or envelope_ok
                   or sub_floor else "interference")
        row["adjudication"] = {
            "isolated_samples_sec": [round(s, 3) for s in iso_samples],
            "median_isolated_sec": round(med, 3),
            "ratio_vs_median": round(ratio_med, 3),
            "within_isolated_envelope": envelope_ok,
            "sub_abs_floor": sub_floor,
            "verdict": verdict}
        (breaches if verdict == "interference" else noise_trips).append(name)
        print(f"[isolated] {name}: samples "
              f"{[round(s, 3) for s in iso_samples]}  median {med:.3f}s  "
              f"ratio-vs-median {ratio_med:.2f}  verdict {verdict.upper()}")
    else:
        print(f"[isolated] {name}: isolated {iso_samples[0]:.3f}s  "
              f"in-suite {ins:.3f}s  ratio {ratio:.2f}  OK")
    rows[name] = row

out = {"sf": SF, "ratio_max": RATIO_MAX, "repeats_env":
       os.environ.get("SPARK_GRAFT_REPEATS", "3"),
       "adjudicate_runs": ADJ_RUNS, "queries": rows,
       "breaches": breaches, "noise_trips": noise_trips}
with open(os.path.join(REPO, "bench_isolated.json"), "w") as f:
    json.dump(out, f, indent=1)
    f.write("\n")
print(f"[isolated] wrote bench_isolated.json; "
      f"{len(breaches)} adjudicated breach(es), {len(noise_trips)} noise "
      f"trip(s) at ratio_max={RATIO_MAX}")
sys.exit(1 if breaches else 0)
