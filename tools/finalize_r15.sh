#!/bin/bash
# Promote the round-15 campaign artifacts from target/ to the repo root
# (the judge reads them there) — run after tools/campaign_r15.sh.
set -u
cd /root/repo
for f in BENCH_SHARED_r15.json BENCH_CONTROL_r14code_r15.json \
         BENCH_CONTROL_SUMMARY_r15.json BENCH_ISOLATED_NEWOPS_r15.json \
         BENCH_AB_NOISE_r13code_r15.json BENCH_AB_NOISE_r14code_r15.json \
         BENCH_AB_NOISE_SUMMARY_r15.json BENCH_SF1_NEWOPS_r15.json \
         BENCH_SF10_NEWOPS_r15.json RECALL_SCALE_SF1_r15.json \
         RECALL_SCALE_SF10_r15.json SOAK_GUARDED_SF1_r15.json \
         SOAK_SCAN_OFF_SF1_r15.json SOAK_ALL_SF1_r15.json; do
  if [ -f "target/$f" ]; then cp "target/$f" "$f"; echo "promoted $f";
  else echo "MISSING $f"; fi
done
