#!/bin/bash
# Round-15 growth sweeps (VERDICT r14 items 2+4, done-criteria for 1+3):
# full-registry repeats=1 screening at BOTH scales of BOTH vocab regimes
# on the regenerated corpora (dedicated zipf RNG; rj1 band table and dd12
# benchmark slice now fixed-size). Flagged (>8x) queries are re-measured
# with repeats=3 by tools/sweep_r15_flagged.sh after assembly flags them.
# bench_full.json is backed up/restored around the runs (Bench with no
# args writes it).
set -e
cd /root/repo
cp bench_full.json /tmp/bench_full_r15_keep.json
for run in "gensf01 /tmp/gensf01" "gensf1 /tmp/gensf1" "zipf01 /tmp/genzipf01" "zipf1 /tmp/genzipf1"; do
  set -- $run
  echo "=== sweep $1 ($2) ==="
  SPARK_GRAFT_SF_DIR=$2 SPARK_GRAFT_REPEATS=1 \
    sbt -batch "runMain graft.Bench" > /tmp/sweep_r15_$1.log 2>&1
  cp bench_full.json /tmp/sweep_r15_$1.json
done
cp /tmp/bench_full_r15_keep.json bench_full.json
echo SWEEPSDONE
