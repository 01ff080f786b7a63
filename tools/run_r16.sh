#!/bin/bash
# Round-16 gates + campaign, strictly sequential.
set -u
cd /root/repo
echo "=== gate 1: full sbt test ===" > /tmp/r16_gates.log
sbt -batch test >> /tmp/r16_gates.log 2>&1
echo "sbt test rc=$?" >> /tmp/r16_gates.log
grep -E "Tests:|Suites:" /tmp/r16_gates.log | tail -2 >> /tmp/r16_gates.log

echo "=== gate 2: full Verify sf0.01 + oracle ===" >> /tmp/r16_gates.log
rm -rf target/verify_sf0.01
SPARK_GRAFT_CPUS=16 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.01 /root/repo/target/verify_sf0.01" \
  > /tmp/r16_verify.log 2>&1
echo "verify rc=$?" >> /tmp/r16_gates.log
grep -c "\[verify\].*ok" /tmp/r16_verify.log >> /tmp/r16_gates.log
grep "\[verify\].*failed" /tmp/r16_verify.log >> /tmp/r16_gates.log
python3 tools/check_oracle.py /root/testdata/sf0.01 \
  target/verify_sf0.01 > /tmp/r16_oracle.log 2>&1
tail -2 /tmp/r16_oracle.log >> /tmp/r16_gates.log

echo "=== campaign ===" >> /tmp/r16_gates.log
bash tools/campaign_r16.sh > /tmp/campaign_r16.log 2>&1
echo "campaign rc=$?" >> /tmp/r16_gates.log
echo "ALL DONE" >> /tmp/r16_gates.log
