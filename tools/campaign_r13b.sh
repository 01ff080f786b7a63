#!/bin/bash
# Round-13 batch-B measurements — strictly sequential (bench protocol).
# Covers the queries added after the main r13 campaign ran:
# q_stream_ann_ivf_pq (committed post-campaign) and the batch-B trio
# (q_gopher_rules, q_token_budget, q_decontam_semantic).
# Artifacts: target/BENCH_ISOLATED_NEWOPS_B_r13.json (sf0.1 medians),
# target/BENCH_SF1_NEWOPS_B_r13.json, target/BENCH_SF10_NEWOPS_B_r13.json
# (manifest-stamped).
set -u
cd /root/repo
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED \
--add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
--add-opens=java.base/java.io=ALL-UNNAMED \
--add-opens=java.base/java.net=ALL-UNNAMED \
--add-opens=java.base/java.nio=ALL-UNNAMED \
--add-opens=java.base/java.util=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
--add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
--add-opens=java.base/sun.security.action=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
NEWQ="q_gopher_rules,q_token_budget,q_decontam_semantic,q_stream_ann_ivf_pq"

echo "=== step 1: isolated sf0.1 medians ==="
python3 tools/bench_isolated.py /root/testdata/sf0.1 \
  target/BENCH_ISOLATED_NEWOPS_B_r13.json --runs 3 --queries "$NEWQ" \
  > /tmp/bench_isolated_r13b.log 2>&1
echo "step 1 rc=$?"

echo "=== step 2: sf1 (one shared JVM, exact names) ==="
SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 \
SPARK_GRAFT_BENCH_ONLY=$NEWQ \
SPARK_GRAFT_BENCH_EXACT=1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SF1_NEWOPS_B_r13.json \
java -Xmx24g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
  > /tmp/bench_sf1_newops_r13b.log 2>&1
echo "step 2 rc=$?"

echo "=== step 3: sf10 (one JVM per query) + merge ==="
for q in ${NEWQ//,/ }; do
  echo "--- sf10 $q ---"
  timeout 5400 env \
    SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 \
    SPARK_GRAFT_INITIAL_PARTITIONS=512 \
    SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_BENCH_EXACT=1 \
    SPARK_GRAFT_BENCH_WARMUP=light SPARK_GRAFT_BENCH_RUNS=1 \
    SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SF10_r13b_$q.json \
    java -Xmx64g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
      > /tmp/bench_sf10_r13b_$q.log 2>&1
  echo "sf10 $q rc=$?"
done
python3 - <<'EOF'
import json, glob
qs, runs = {}, {}
for p in sorted(glob.glob("target/BENCH_SF10_r13b_q_*.json")):
    d = json.load(open(p))
    qs.update(d["queries"]); runs.update(d.get("runs", {}))
manifest = json.load(open("target/sf10/manifest.json"))
out = {"metric": "total", "value": round(sum(qs.values()), 3),
       "unit": "sec", "queries": qs, "sf": "/root/repo/target/sf10",
       "runs": runs, "data_manifest": manifest,
       "note": "one JVM per query (SPARK_GRAFT_BENCH_RUNS=1, light "
               "warmup), merged by tools/campaign_r13b.sh step 3; the "
               "regenerated sf10 dir's manifest MATCHES the main r13 "
               "campaign's artifacts (gen_scale determinism verified "
               "this session), so these rows are same-data comparable"}
with open("target/BENCH_SF10_NEWOPS_B_r13.json", "w") as f:
    f.write(json.dumps(out) + "\n")
print("merged", len(qs), "queries")
EOF
echo "step 3 rc=$?"
python3 - <<'EOF'
import json
p = "target/BENCH_SF1_NEWOPS_B_r13.json"
d = json.load(open(p))
d["data_manifest"] = json.load(open("target/sf1/manifest.json"))
with open(p, "w") as f:
    f.write(json.dumps(d) + "\n")
print("sf1 artifact stamped")
EOF
echo "=== batch-B campaign done ==="
