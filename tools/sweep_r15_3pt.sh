#!/bin/bash
# Round-15 three-point scale curve (continuation session): the r15 flagged
# set re-timed at THREE log-spaced zipf-vocab scales (0.1 / 0.3 / 1.0,
# regenerated same-seed corpora) with SPARK_GRAFT_REPEATS=2, so each
# query's growth becomes a fitted power-law exponent instead of a 2-point
# ratio. Includes geo2_knn_within_radius (this session's output-bounded
# geo twin) next to geo1. Each run's bench_partial.json is copied aside;
# tools/fit_3pt.py folds them into BENCH_registry_r15.json.
set -e
cd /root/repo
FLAGGED="geo1_proximity_join geo2_knn_within_radius dd4c_simhash_topk_per_doc \
g6_coemployment_similarity dd4_simhash_neardup sim4c_cosine_topk_per_doc \
sim4b_neardup_portable e2e_jumps_envelope dd3b_minhash_portable \
mm7_image_features mm10_wav_frames dd5b_ngram_jaccard_portable \
mm8_image_resize mm4_perceptual_dedup dd3c_minhash_candidates_portable \
mm9_phash_dedup dd5_ngram_jaccard f3b_repair_dates mm6_png_roundtrip \
mm11_jpeg_stability ts10_bm25 cur12_attrition dd3e_minhash_candidates_sampled \
w6_paths_full wf5_winsorize w6d_kml dd16_cdc_chunk_dedup dd18_cdc_incremental \
tok4_bpe_1k dd4d_simhash_diagnostics rj1_range_join dd12_semantic_decontamination"
for run in "zipf01 /tmp/genzipf01" "zipf03 /tmp/genzipf03" "zipf1 /tmp/genzipf1"; do
  set -- $run
  echo "=== 3pt $1 ($2) ==="
  SPARK_GRAFT_SF_DIR=$2 SPARK_GRAFT_REPEATS=2 \
    sbt -batch "runMain graft.Bench $FLAGGED" > /tmp/3pt_r15_$1.log 2>&1
  cp bench_partial.json /tmp/3pt_r15_$1.json
done
echo 3PTDONE
