#!/bin/bash
# Round-15 measurement campaign — strictly sequential (bench protocol:
# nothing heavy may run concurrently). Artifacts land in target/.
# Focus: the new round-15 queries (q_avro_source,
# q_stream_ann_ivf_requantized) and the bloom-guarded/footer-watermark
# fold family (q_stream_bm25, q_stream_line_dedup, q_stream_dedup_exact,
# q_stream_crossmodal_ann, q_stream_ann_ivf{,_trained,_pq}, q_stream_ann_pq,
# q_stream_decontam_semantic, q_stream_ngram_diversity, drift monitors)
# at sf0.1 shared + isolated, sf1, and sf10; a same-day r14-code control
# sweep; the r14-nit isolation A/B (q_quality_classifier,
# q_prototype_prune, q_dsir_select on r13 vs r14 code); the 50-batch sf1
# soaks with state-scan bytes (bloom on + the counterfactual off arm);
# and the scale-recall rows with the drift-response maintenance ladder.
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
NEWQ="q_avro_source,q_stream_ann_ivf_requantized,q_stream_bm25,q_stream_line_dedup,q_stream_dedup_exact,q_stream_crossmodal_ann,q_stream_ann_ivf,q_stream_ann_ivf_trained,q_stream_ann_pq,q_stream_ann_ivf_pq,q_stream_decontam_semantic,q_stream_ngram_diversity,q_quantizer_drift,q_stream_quantizer_drift"
SF10Q="q_avro_source,q_stream_ann_ivf_requantized,q_stream_bm25,q_stream_line_dedup,q_stream_dedup_exact,q_stream_crossmodal_ann,q_stream_ngram_diversity"
ABQ="q_quality_classifier,q_prototype_prune,q_dsir_select"
R13_COMMIT="${R13_COMMIT:-3431051}"
R14_COMMIT="${R14_COMMIT:-2d03172}"

echo "=== step 1: shared full bench sf0.1 (driver conditions) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SHARED_r15.json \
java -Xmx16g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
  > /tmp/bench_shared_r15.log 2>&1
echo "step 1 rc=$?"

echo "=== step 2: same-day r14-code control sweep (git worktree) ==="
CTRL14=/root/repo/target/r14ctrl
if [ ! -d "$CTRL14" ]; then
  git worktree add --detach "$CTRL14" "$R14_COMMIT" > /dev/null
fi
(cd "$CTRL14" && sbt -batch compile > /tmp/ctrl14_compile_r15.log 2>&1)
echo "control-r14 compile rc=$?"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_CONTROL_r14code_r15.json \
java -Xmx16g -XX:+UseG1GC \
  -cp "$CTRL14/target/scala-2.13/classes:/opt/spark/jars/*" $OPENS \
  graft.Bench > /tmp/bench_control_r15.log 2>&1
echo "step 2 rc=$?"

python3 - <<'EOF'
import json
a = json.load(open("target/BENCH_SHARED_r15.json"))
b = json.load(open("target/BENCH_CONTROL_r14code_r15.json"))
qa, qb = a["queries"], b["queries"]
common = sorted(set(qa) & set(qb))
ca, cb = sum(qa[q] for q in common), sum(qb[q] for q in common)
out = {
  "protocol": "same-day, same-host, sequential: full r15 sweep then "
              "full r14-code sweep from a git-worktree build "
              "(tools/campaign_r15.sh steps 1-2)",
  "shared_r15_total_sec": round(a["value"], 1),
  "shared_r15_n": len(qa),
  "control_r14code_total_sec": round(b["value"], 1),
  "control_r14code_n": len(qb),
  "common_queries": len(common),
  "common_r15_sec": round(ca, 1),
  "common_r14code_sec": round(cb, 1),
  "ratio_r15_over_r14code": round(ca / cb, 3),
  "per_query_over_2x": {q: {"r15": qa[q], "r14code": qb[q]}
                        for q in common if qa[q] > 2 * qb[q] and qa[q] > 1.0},
}
with open("target/BENCH_CONTROL_SUMMARY_r15.json", "w") as f:
    f.write(json.dumps(out) + "\n")
print(json.dumps({k: v for k, v in out.items() if k != "protocol"}))
EOF
echo "step 2b rc=$?"

echo "=== step 3: isolated sf0.1 medians for the new/changed queries ==="
python3 tools/bench_isolated.py /root/testdata/sf0.1 \
  target/BENCH_ISOLATED_NEWOPS_r15.json --runs 3 --queries "$NEWQ" \
  > /tmp/bench_isolated_r15.log 2>&1
echo "step 3 rc=$?"

echo "=== step 4: r14-nit isolation A/B (r13 code vs r14 code, the "
echo "    shared-sweep 2.03x/1.69x/1.33x swings) ==="
CTRL13=/root/repo/target/r13ctrl
if [ ! -d "$CTRL13" ]; then
  git worktree add --detach "$CTRL13" "$R13_COMMIT" > /dev/null
fi
(cd "$CTRL13" && sbt -batch compile > /tmp/ctrl13_compile_r15.log 2>&1)
echo "control-r13 compile rc=$?"
python3 "$CTRL13/tools/bench_isolated.py" /root/testdata/sf0.1 \
  target/BENCH_AB_NOISE_r13code_r15.json --runs 3 --queries "$ABQ" \
  > /tmp/bench_ab13_r15.log 2>&1
echo "step 4a rc=$?"
python3 "$CTRL14/tools/bench_isolated.py" /root/testdata/sf0.1 \
  target/BENCH_AB_NOISE_r14code_r15.json --runs 3 --queries "$ABQ" \
  > /tmp/bench_ab14_r15.log 2>&1
echo "step 4b rc=$?"
python3 - <<'EOF'
import json
a = json.load(open("target/BENCH_AB_NOISE_r13code_r15.json"))
b = json.load(open("target/BENCH_AB_NOISE_r14code_r15.json"))
out = {"note": "per-JVM median-of-3 isolation A/B for the r14 judge "
               "nit (shared-sweep swings q_quality_classifier 2.03x, "
               "q_prototype_prune 1.69x, q_dsir_select 1.33x): same "
               "day, same data, r13-code vs r14-code worktrees",
       "sf": "/root/testdata/sf0.1",
       "queries": {}}
for q in a["queries"]:
    ra, rb = a["queries"][q], b["queries"][q]
    out["queries"][q] = {"r13_median_sec": ra, "r14_median_sec": rb,
                         "r14_over_r13": round(rb / ra, 3)}
with open("target/BENCH_AB_NOISE_SUMMARY_r15.json", "w") as f:
    f.write(json.dumps(out) + "\n")
print(json.dumps(out["queries"]))
EOF
echo "step 4 rc=$?"

echo "=== step 5: sf1 new/changed queries (one shared JVM, exact names) ==="
SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 \
SPARK_GRAFT_BENCH_ONLY=$NEWQ \
SPARK_GRAFT_BENCH_EXACT=1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SF1_NEWOPS_r15.json \
java -Xmx24g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
  > /tmp/bench_sf1_newops_r15.log 2>&1
echo "step 5 rc=$?"
python3 - <<'EOF'
import json
p = "target/BENCH_SF1_NEWOPS_r15.json"
d = json.load(open(p))
d["data_manifest"] = json.load(open("target/sf1/manifest.json"))
with open(p, "w") as f:
    f.write(json.dumps(d) + "\n")
print("sf1 artifact stamped")
EOF

echo "=== step 6: sf10 new/changed queries (one JVM per query) + merge ==="
for q in ${SF10Q//,/ }; do
  echo "--- sf10 $q ---"
  timeout 5400 env \
    SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 \
    SPARK_GRAFT_INITIAL_PARTITIONS=512 \
    SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_BENCH_EXACT=1 \
    SPARK_GRAFT_BENCH_WARMUP=light SPARK_GRAFT_BENCH_RUNS=1 \
    SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SF10_r15_$q.json \
    java -Xmx64g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
      > /tmp/bench_sf10_r15_$q.log 2>&1
  echo "sf10 $q rc=$?"
done
python3 - <<'EOF'
import json, glob
qs, runs = {}, {}
for p in sorted(glob.glob("target/BENCH_SF10_r15_q_*.json")):
    d = json.load(open(p))
    qs.update(d["queries"]); runs.update(d.get("runs", {}))
manifest = json.load(open("target/sf10/manifest.json"))
out = {"metric": "total", "value": round(sum(qs.values()), 3),
       "unit": "sec", "queries": qs, "sf": "/root/repo/target/sf10",
       "runs": runs, "data_manifest": manifest,
       "note": "one JVM per query (SPARK_GRAFT_BENCH_RUNS=1, light "
               "warmup), merged by tools/campaign_r15.sh step 6; "
               "data_manifest pins the exact scaled-data content "
               "(tools/gen_scale.py) this artifact measured"}
with open("target/BENCH_SF10_NEWOPS_r15.json", "w") as f:
    f.write(json.dumps(out) + "\n")
print("merged", len(qs), "queries")
EOF
echo "step 6 rc=$?"

echo "=== step 7: scale recall sf1 + sf10 (maintenance ladder rows) ==="
SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 \
SPARK_GRAFT_RECALL_OUT=/root/repo/target/RECALL_SCALE_SF1_r15.json \
SPARK_GRAFT_CPUS=16 \
java -Xmx24g -XX:+UseG1GC -cp "$CP" $OPENS graft.tools.RecallScale \
  > /tmp/recall_sf1_r15.log 2>&1
echo "step 7a rc=$?"
SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 \
SPARK_GRAFT_RECALL_OUT=/root/repo/target/RECALL_SCALE_SF10_r15.json \
SPARK_GRAFT_CPUS=32 \
java -Xmx64g -XX:+UseG1GC -cp "$CP" $OPENS graft.tools.RecallScale \
  > /tmp/recall_sf10_r15.log 2>&1
echo "step 7b rc=$?"

echo "=== step 8: 50-batch sf1 soaks, guarded + delta families (bloom ON) ==="
SPARK_GRAFT_CPUS=16 \
java -Xmx24g -XX:+UseG1GC -cp "$CP" $OPENS graft.tools.NearlineSoak \
  /root/repo/target/sf1/documents.parquet 50 \
  /root/repo/target/SOAK_GUARDED_SF1_r15.json bm25,xmodal,line,dedupx,ndiv \
  > /tmp/soak_guarded_r15.log 2>&1
echo "step 8 rc=$?"

echo "=== step 9: counterfactual soak arm (bloom OFF, guarded families) ==="
SPARK_GRAFT_CPUS=16 SPARK_GRAFT_BLOOM=off \
java -Xmx24g -XX:+UseG1GC -cp "$CP" $OPENS graft.tools.NearlineSoak \
  /root/repo/target/sf1/documents.parquet 50 \
  /root/repo/target/SOAK_SCAN_OFF_SF1_r15.json bm25,xmodal,line \
  > /tmp/soak_off_r15.log 2>&1
echo "step 9 rc=$?"

echo "=== step 10: full 10-family 50-batch sf1 soak ==="
SPARK_GRAFT_CPUS=16 \
java -Xmx24g -XX:+UseG1GC -cp "$CP" $OPENS graft.tools.NearlineSoak \
  /root/repo/target/sf1/documents.parquet 50 \
  /root/repo/target/SOAK_ALL_SF1_r15.json \
  > /tmp/soak_all_r15.log 2>&1
echo "step 10 rc=$?"

echo "=== campaign done ==="
