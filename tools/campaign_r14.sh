#!/bin/bash
# Round-14 measurement campaign — strictly sequential (bench protocol:
# nothing heavy may run concurrently). Artifacts land in target/.
# Focus: the three new round-14 queries (q_crossmodal_ann,
# q_pipeline_llm_annotated, q_stream_dedup_exact), the queries the
# round's code changes touch (q_stream_ngram_diversity — sharded state;
# q_ngram_diversity + q_dedup_minhash — the kernel regex hoist;
# q_stream_line_dedup — the crash-contract reorder; q_triangles — the
# byte-aware gate) at sf0.1 shared + isolated, then sf1 and sf10
# (per-query JVMs + reproducible merge), and a same-day r13-code control
# sweep. Every BENCH_SF1/SF10 artifact is stamped with the scaled dir's
# data manifest. (The round's recall + soak artifacts ran separately:
# RECALL_SCALE_{SF1,SF10}_r14.json, SOAK_NDIV_LINE_SF1_r14.json,
# SOAK_DEDUPX_SF1_r14.json.)
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
NEWQ="q_crossmodal_ann,q_pipeline_llm_annotated,q_stream_dedup_exact,q_stream_ngram_diversity,q_ngram_diversity,q_stream_line_dedup,q_dedup_minhash,q_triangles"
R13_COMMIT="${R13_COMMIT:-3431051}"

echo "=== step 1: shared full bench sf0.1 (driver conditions) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SHARED_r14.json \
java -Xmx16g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
  > /tmp/bench_shared_r14.log 2>&1
echo "step 1 rc=$?"

echo "=== step 2: same-day r13-code control sweep (git worktree) ==="
CTRL=/root/repo/target/r13ctrl
if [ ! -d "$CTRL" ]; then
  git worktree add --detach "$CTRL" "$R13_COMMIT" > /dev/null
fi
(cd "$CTRL" && sbt -batch compile > /tmp/ctrl_compile_r14.log 2>&1)
echo "control compile rc=$?"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_CONTROL_r13code_r14.json \
java -Xmx16g -XX:+UseG1GC \
  -cp "$CTRL/target/scala-2.13/classes:/opt/spark/jars/*" $OPENS \
  graft.Bench > /tmp/bench_control_r14.log 2>&1
echo "step 2 rc=$?"

echo "=== step 3: isolated sf0.1 medians for the new/changed queries ==="
python3 tools/bench_isolated.py /root/testdata/sf0.1 \
  target/BENCH_ISOLATED_NEWOPS_r14.json --runs 3 --queries "$NEWQ" \
  > /tmp/bench_isolated_r14.log 2>&1
echo "step 3 rc=$?"

echo "=== step 4: sf1 new/changed queries (one shared JVM, exact names) ==="
SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 \
SPARK_GRAFT_BENCH_ONLY=$NEWQ \
SPARK_GRAFT_BENCH_EXACT=1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SF1_NEWOPS_r14.json \
java -Xmx24g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
  > /tmp/bench_sf1_newops_r14.log 2>&1
echo "step 4 rc=$?"

echo "=== step 5: sf10 new/changed queries (one JVM per query) + merge ==="
for q in ${NEWQ//,/ }; do
  echo "--- sf10 $q ---"
  timeout 5400 env \
    SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 \
    SPARK_GRAFT_INITIAL_PARTITIONS=512 \
    SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_BENCH_EXACT=1 \
    SPARK_GRAFT_BENCH_WARMUP=light SPARK_GRAFT_BENCH_RUNS=1 \
    SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SF10_r14_$q.json \
    java -Xmx64g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
      > /tmp/bench_sf10_r14_$q.log 2>&1
  echo "sf10 $q rc=$?"
done
python3 - <<'EOF'
import json, glob
qs, runs = {}, {}
for p in sorted(glob.glob("target/BENCH_SF10_r14_q_*.json")):
    d = json.load(open(p))
    qs.update(d["queries"]); runs.update(d.get("runs", {}))
manifest = json.load(open("target/sf10/manifest.json"))
out = {"metric": "total", "value": round(sum(qs.values()), 3),
       "unit": "sec", "queries": qs, "sf": "/root/repo/target/sf10",
       "runs": runs, "data_manifest": manifest,
       "note": "one JVM per query (SPARK_GRAFT_BENCH_RUNS=1, light "
               "warmup), merged by tools/campaign_r14.sh step 5; "
               "data_manifest pins the exact scaled-data content "
               "(tools/gen_scale.py) this artifact measured"}
with open("target/BENCH_SF10_NEWOPS_r14.json", "w") as f:
    f.write(json.dumps(out) + "\n")
print("merged", len(qs), "queries")
EOF
echo "step 5 rc=$?"
python3 - <<'EOF'
import json
p = "target/BENCH_SF1_NEWOPS_r14.json"
d = json.load(open(p))
d["data_manifest"] = json.load(open("target/sf1/manifest.json"))
with open(p, "w") as f:
    f.write(json.dumps(d) + "\n")
print("sf1 artifact stamped")
EOF
echo "step 5b rc=$?"
echo "=== campaign done ==="
