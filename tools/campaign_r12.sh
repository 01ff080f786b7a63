#!/bin/bash
# Round-12 measurement campaign — strictly sequential (bench protocol:
# nothing heavy may run concurrently). Artifacts land in target/.
# Focus: the five new/changed round-12 queries (q_langid_trained,
# q_perplexity_buckets, q_hybrid_rrf_ivf, q_stream_ann_pq, and the
# extended flagship q_pipeline_llm) at sf0.1 shared + isolated, then
# sf1 and sf10 (with a merge step — the sf10 artifact is assembled
# FROM the per-query outputs, reproducibly), a same-day r11-code
# control sweep, and the scale-recall rows (RecallScale) at sf1/sf10.
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
NEWQ="q_langid_trained,q_perplexity_buckets,q_hybrid_rrf_ivf,q_stream_ann_pq,q_pipeline_llm"
R11_COMMIT="${R11_COMMIT:-808f97e}"

echo "=== step 1: shared full bench sf0.1 (driver conditions) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SHARED_r12.json \
java -Xmx16g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
  > /tmp/bench_shared_r12.log 2>&1
echo "step 1 rc=$?"

echo "=== step 2: same-day r11-code control sweep (git worktree) ==="
CTRL=/root/repo/target/r11ctrl
if [ ! -d "$CTRL" ]; then
  git worktree add --detach "$CTRL" "$R11_COMMIT" > /dev/null
fi
(cd "$CTRL" && sbt -batch compile > /tmp/ctrl_compile_r12.log 2>&1)
echo "control compile rc=$?"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_CONTROL_r11code_r12.json \
java -Xmx16g -XX:+UseG1GC \
  -cp "$CTRL/target/scala-2.13/classes:/opt/spark/jars/*" $OPENS \
  graft.Bench > /tmp/bench_control_r12.log 2>&1
echo "step 2 rc=$?"

echo "=== step 3: isolated sf0.1 medians for the new queries ==="
python3 tools/bench_isolated.py /root/testdata/sf0.1 \
  target/BENCH_ISOLATED_NEWOPS_r12.json --runs 3 --queries "$NEWQ" \
  > /tmp/bench_isolated_r12.log 2>&1
echo "step 3 rc=$?"

echo "=== step 4: sf1 new queries (one shared JVM, exact names) ==="
SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 \
SPARK_GRAFT_BENCH_ONLY=$NEWQ \
SPARK_GRAFT_BENCH_EXACT=1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SF1_NEWOPS_r12.json \
java -Xmx24g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
  > /tmp/bench_sf1_newops_r12.log 2>&1
echo "step 4 rc=$?"

echo "=== step 5: sf10 new queries (one JVM per query) + merge ==="
for q in ${NEWQ//,/ }; do
  echo "--- sf10 $q ---"
  timeout 5400 env \
    SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 \
    SPARK_GRAFT_INITIAL_PARTITIONS=512 \
    SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_BENCH_EXACT=1 \
    SPARK_GRAFT_BENCH_WARMUP=light SPARK_GRAFT_BENCH_RUNS=1 \
    SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SF10_r12_$q.json \
    java -Xmx64g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
      > /tmp/bench_sf10_r12_$q.log 2>&1
  echo "sf10 $q rc=$?"
done
# merge the per-query artifacts into the single committed file (the
# round-11 artifact was hand-merged; this step makes it reproducible)
python3 - <<'EOF'
import json, glob
qs, runs = {}, {}
for p in sorted(glob.glob("target/BENCH_SF10_r12_q_*.json")):
    d = json.load(open(p))
    qs.update(d["queries"]); runs.update(d.get("runs", {}))
out = {"metric": "total", "value": sum(qs.values()), "unit": "sec",
       "queries": qs, "sf": "/root/repo/target/sf10", "runs": runs,
       "note": "one JVM per query (SPARK_GRAFT_BENCH_RUNS=1, light "
               "warmup), merged by tools/campaign_r12.sh step 5"}
with open("target/BENCH_SF10_NEWOPS_r12.json", "w") as f:
    f.write(json.dumps(out) + "\n")
print("merged", len(qs), "queries")
EOF
echo "step 5 rc=$?"

echo "=== step 6: scale recall (PQ/JL/IVF) at sf1 and sf10 ==="
SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 \
SPARK_GRAFT_RECALL_OUT=/root/repo/target/RECALL_SCALE_SF1_r12.json \
java -Xmx24g -XX:+UseG1GC -cp "$CP" $OPENS graft.tools.RecallScale \
  > /tmp/recall_sf1_r12.log 2>&1
echo "sf1 recall rc=$?"
SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 \
SPARK_GRAFT_RECALL_OUT=/root/repo/target/RECALL_SCALE_SF10_r12.json \
java -Xmx64g -XX:+UseG1GC -cp "$CP" $OPENS graft.tools.RecallScale \
  > /tmp/recall_sf10_r12.log 2>&1
echo "sf10 recall rc=$?"
echo "=== campaign done ==="
