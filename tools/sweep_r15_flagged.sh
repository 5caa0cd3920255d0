#!/bin/bash
# Round-15 flagged re-measure: every query >8x in EITHER regime's
# repeats=1 screening, re-timed with SPARK_GRAFT_REPEATS=2 at both scales
# of both vocab regimes (the r14 method's "basis" upgrade), plus the
# round's new/pinned entries (dd3e/dd4c/dd4d/tok4/rj1/dd12) so their
# first gateable growth rows exist in both regimes. Bench with names
# writes bench_partial.json; each run is copied aside.
set -e
cd /root/repo
FLAGGED="geo1_proximity_join dd4c_simhash_topk_per_doc g6_coemployment_similarity \
dd4_simhash_neardup sim4c_cosine_topk_per_doc sim4b_neardup_portable \
e2e_jumps_envelope dd3b_minhash_portable mm7_image_features mm10_wav_frames \
dd5b_ngram_jaccard_portable mm8_image_resize mm4_perceptual_dedup \
dd3c_minhash_candidates_portable mm9_phash_dedup dd5_ngram_jaccard \
f3b_repair_dates mm6_png_roundtrip mm11_jpeg_stability ts10_bm25 \
cur12_attrition dd3e_minhash_candidates_sampled w6_paths_full wf5_winsorize \
w6d_kml dd16_cdc_chunk_dedup dd18_cdc_incremental tok4_bpe_1k \
dd4d_simhash_diagnostics rj1_range_join dd12_semantic_decontamination"
for run in "gensf01 /tmp/gensf01" "gensf1 /tmp/gensf1" "zipf01 /tmp/genzipf01" "zipf1 /tmp/genzipf1"; do
  set -- $run
  echo "=== flagged $1 ($2) ==="
  SPARK_GRAFT_SF_DIR=$2 SPARK_GRAFT_REPEATS=2 \
    sbt -batch "runMain graft.Bench $FLAGGED" > /tmp/flagged_r15_$1.log 2>&1
  cp bench_partial.json /tmp/flagged_r15_$1.json
done
echo FLAGGEDDONE
