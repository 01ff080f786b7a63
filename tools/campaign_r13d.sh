#!/bin/bash
# Round-13 batch-D measurements — the queries added after batch C:
# the selection/annotation batch (q_moore_lewis, q_stream_lm_perplexity,
# q_prototype_prune, q_dedup_annotate), the tokenizer batch
# (q_unigram_segments, q_tokenizer_unigram, q_wordpiece), the
# composition batch (q_quality_ensemble, q_shard_assign), and the
# line/diversity/mixture batch (q_line_dedup, q_page_repetition,
# q_ngram_diversity, q_domain_weights). Then the FULL shared sweep
# (now 183 queries) with the same-day r12-code control per protocol.
# Strictly sequential; nothing else may run.
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
R12_COMMIT="${R12_COMMIT:-54c25a9}"
NEWQ="q_moore_lewis,q_stream_lm_perplexity,q_prototype_prune,q_dedup_annotate,q_unigram_segments,q_tokenizer_unigram,q_wordpiece,q_quality_ensemble,q_shard_assign,q_line_dedup,q_page_repetition,q_ngram_diversity,q_domain_weights"

echo "=== step 1: isolated sf0.1 medians ==="
python3 tools/bench_isolated.py /root/testdata/sf0.1 \
  target/BENCH_ISOLATED_NEWOPS_D_r13.json --runs 3 --queries "$NEWQ" \
  > /tmp/bench_isolated_r13d.log 2>&1
echo "step 1 rc=$?"

echo "=== step 2: sf1 (one shared JVM, exact names) ==="
SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 \
SPARK_GRAFT_BENCH_ONLY=$NEWQ \
SPARK_GRAFT_BENCH_EXACT=1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SF1_NEWOPS_D_r13.json \
java -Xmx24g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
  > /tmp/bench_sf1_newops_r13d.log 2>&1
echo "step 2 rc=$?"
python3 - <<'EOF'
import json
p = "target/BENCH_SF1_NEWOPS_D_r13.json"
d = json.load(open(p))
d["data_manifest"] = json.load(open("target/sf1/manifest.json"))
with open(p, "w") as f:
    f.write(json.dumps(d) + "\n")
print("sf1 artifact stamped")
EOF

echo "=== step 3: sf10 (one JVM per query) + merge ==="
for q in ${NEWQ//,/ }; do
  echo "--- sf10 $q ---"
  timeout 5400 env \
    SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 \
    SPARK_GRAFT_INITIAL_PARTITIONS=512 \
    SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_BENCH_EXACT=1 \
    SPARK_GRAFT_BENCH_WARMUP=light SPARK_GRAFT_BENCH_RUNS=1 \
    SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SF10_r13d_$q.json \
    java -Xmx64g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
      > /tmp/bench_sf10_r13d_$q.log 2>&1
  echo "sf10 $q rc=$?"
done
python3 - <<'EOF'
import json, glob
qs, runs = {}, {}
for p in sorted(glob.glob("target/BENCH_SF10_r13d_q_*.json")):
    d = json.load(open(p))
    qs.update(d["queries"]); runs.update(d.get("runs", {}))
manifest = json.load(open("target/sf10/manifest.json"))
out = {"metric": "total", "value": round(sum(qs.values()), 3),
       "unit": "sec", "queries": qs, "sf": "/root/repo/target/sf10",
       "runs": runs, "data_manifest": manifest,
       "note": "one JVM per query (SPARK_GRAFT_BENCH_RUNS=1, light "
               "warmup), merged by tools/campaign_r13d.sh step 3; the "
               "regenerated sf10 dir's manifest MATCHES every earlier "
               "r13 scale artifact (machine-checked at regeneration), "
               "so these rows are same-data comparable"}
with open("target/BENCH_SF10_NEWOPS_D_r13.json", "w") as f:
    f.write(json.dumps(out) + "\n")
print("merged", len(qs), "queries")
EOF
echo "step 3 rc=$?"

echo "=== step 4: shared full bench sf0.1 (all queries) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SHARED_D_r13.json \
java -Xmx16g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
  > /tmp/bench_shared_r13d.log 2>&1
echo "step 4 rc=$?"

echo "=== step 5: same-day r12-code control sweep (git worktree) ==="
CTRL=/root/repo/target/r12ctrl
if [ ! -d "$CTRL" ]; then
  git worktree add --detach "$CTRL" "$R12_COMMIT" > /dev/null
fi
(cd "$CTRL" && sbt -batch compile > /tmp/ctrl_compile_r13d.log 2>&1)
echo "control compile rc=$?"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_CONTROL_D_r12code_r13.json \
java -Xmx16g -XX:+UseG1GC \
  -cp "$CTRL/target/scala-2.13/classes:/opt/spark/jars/*" $OPENS \
  graft.Bench > /tmp/bench_control_r13d.log 2>&1
echo "step 5 rc=$?"

echo "=== step 6: control summary ==="
python3 - <<'EOF'
import json
cur = json.load(open("target/BENCH_SHARED_D_r13.json"))
ctl = json.load(open("target/BENCH_CONTROL_D_r12code_r13.json"))
common = sorted(set(cur["queries"]) & set(ctl["queries"]))
cs = sum(cur["queries"][q] for q in common)
xs = sum(ctl["queries"][q] for q in common)
out = {
  "protocol": ("same-day, same-host, sequential: full r13 sweep "
               "(batch D final corpus) then full r12-code sweep from "
               "a git-worktree build (tools/campaign_r13d.sh)"),
  "shared_r13_total_sec": round(cur["value"], 1),
  "shared_r13_n": len(cur["queries"]),
  "control_r12code_total_sec": round(ctl["value"], 1),
  "control_r12code_n": len(ctl["queries"]),
  "common_queries": len(common),
  "common_r13_sec": round(cs, 1),
  "common_r12code_sec": round(xs, 1),
  "ratio_r13_over_r12code": round(cs / xs, 3),
}
with open("target/BENCH_CONTROL_SUMMARY_D_r13.json", "w") as f:
    f.write(json.dumps(out, indent=1) + "\n")
print(json.dumps(out, indent=1))
EOF
echo "=== batch-D campaign done ==="
