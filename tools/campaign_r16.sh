#!/bin/bash
# Round-16 measurement campaign — strictly sequential (bench protocol:
# nothing heavy may run concurrently). Artifacts land in target/.
# Focus: the three new query surfaces (q_stream_dedup_annotate,
# q_stream_ann_ivf_split, q_crossmodal_ann_ivf), the resized Bloom
# guard's fold family at sf0.1/sf1/sf10, a same-day r15-code control
# sweep, the r15-verdict isolation A/B (the NINE >2x shared-sweep
# swings, r15 code vs r16 code), query-surface recall rows
# (tools/QueryRecall), the sf1 soaks with the cc family + bloom-off
# counterfactual, and the sf10 bloom-OVERLOAD soak (bm25/dedupx past
# 420k keys — the resize must fire and fresh-batch scan bytes stay ~0).
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
NEWQ="q_stream_dedup_annotate,q_stream_ann_ivf_split,q_crossmodal_ann_ivf,q_stream_bm25,q_stream_line_dedup,q_stream_dedup_exact,q_stream_crossmodal_ann,q_stream_ann_ivf,q_stream_ann_ivf_trained,q_stream_ann_pq,q_stream_ann_ivf_pq,q_stream_decontam_semantic,q_avro_source"
SF10Q="q_stream_dedup_annotate,q_stream_ann_ivf_split,q_crossmodal_ann_ivf,q_stream_bm25,q_stream_line_dedup"
ABQ="q_collocations,q_audio_dedup,q_bulk_load_fact,q_bm25,q_ann_projected,q_chunk_docs,q_tokenizer_unigram,q_bulk_load_dimension,q_bloom_semijoin"
R15_COMMIT="${R15_COMMIT:-1b480c4}"

echo "=== step 1: shared full bench sf0.1 (driver conditions) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SHARED_r16.json \
java -Xmx16g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
  > /tmp/bench_shared_r16.log 2>&1
echo "step 1 rc=$?"

echo "=== step 2: same-day r15-code control sweep (git worktree) ==="
CTRL15=/root/repo/target/r15ctrl
if [ ! -d "$CTRL15" ]; then
  git worktree add --detach "$CTRL15" "$R15_COMMIT" > /dev/null
fi
(cd "$CTRL15" && sbt -batch compile > /tmp/ctrl15_compile_r16.log 2>&1)
echo "control-r15 compile rc=$?"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_CONTROL_r15code_r16.json \
java -Xmx16g -XX:+UseG1GC \
  -cp "$CTRL15/target/scala-2.13/classes:/opt/spark/jars/*" $OPENS \
  graft.Bench > /tmp/bench_control_r16.log 2>&1
echo "step 2 rc=$?"

python3 - <<'EOF'
import json
a = json.load(open("target/BENCH_SHARED_r16.json"))
b = json.load(open("target/BENCH_CONTROL_r15code_r16.json"))
qa, qb = a["queries"], b["queries"]
common = sorted(set(qa) & set(qb))
ca, cb = sum(qa[q] for q in common), sum(qb[q] for q in common)
out = {
  "protocol": "same-day, same-host, sequential: full r16 sweep then "
              "full r15-code sweep from a git-worktree build "
              "(tools/campaign_r16.sh steps 1-2)",
  "shared_r16_total_sec": round(a["value"], 1),
  "shared_r16_n": len(qa),
  "control_r15code_total_sec": round(b["value"], 1),
  "control_r15code_n": len(qb),
  "common_queries": len(common),
  "common_r16_sec": round(ca, 1),
  "common_r15code_sec": round(cb, 1),
  "ratio_r16_over_r15code": round(ca / cb, 3),
  "per_query_over_2x": {q: {"r16": qa[q], "r15code": qb[q]}
                        for q in common if qa[q] > 2 * qb[q] and qa[q] > 1.0},
}
with open("target/BENCH_CONTROL_SUMMARY_r16.json", "w") as f:
    f.write(json.dumps(out) + "\n")
print(json.dumps({k: v for k, v in out.items() if k != "protocol"}))
EOF
echo "step 2b rc=$?"

echo "=== step 3: isolated sf0.1 medians for the new/changed queries ==="
python3 tools/bench_isolated.py /root/testdata/sf0.1 \
  target/BENCH_ISOLATED_NEWOPS_r16.json --runs 3 --queries "$NEWQ" \
  > /tmp/bench_isolated_r16.log 2>&1
echo "step 3 rc=$?"

echo "=== step 4: r15-verdict isolation A/B (the NINE >2x swings, r15 "
echo "    code vs r16 code, per-JVM median-of-3) ==="
python3 "$CTRL15/tools/bench_isolated.py" /root/testdata/sf0.1 \
  target/BENCH_AB_NOISE_r15code_r16.json --runs 3 --queries "$ABQ" \
  > /tmp/bench_ab15_r16.log 2>&1
echo "step 4a rc=$?"
python3 tools/bench_isolated.py /root/testdata/sf0.1 \
  target/BENCH_AB_NOISE_r16code_r16.json --runs 3 --queries "$ABQ" \
  > /tmp/bench_ab16_r16.log 2>&1
echo "step 4b rc=$?"
python3 - <<'EOF'
import json
a = json.load(open("target/BENCH_AB_NOISE_r15code_r16.json"))
b = json.load(open("target/BENCH_AB_NOISE_r16code_r16.json"))
out = {"note": "per-JVM median-of-3 isolation A/B for the r15 judge "
               "nit #2 (the nine >2x shared-sweep swings: "
               "q_collocations 3.68x, q_audio_dedup 3.23x, "
               "q_bulk_load_fact 3.17x, q_bm25 2.92x, q_ann_projected "
               "2.74x, q_chunk_docs 2.49x, q_tokenizer_unigram 2.33x, "
               "q_bulk_load_dimension 2.16x, q_bloom_semijoin 2.02x): "
               "same day, same data, r15-code vs r16-code worktrees",
       "sf": "/root/testdata/sf0.1",
       "queries": {}}
for q in a["queries"]:
    ra, rb = a["queries"][q], b["queries"].get(q)
    out["queries"][q] = {"r15_median_sec": ra, "r16_median_sec": rb,
                         "r16_over_r15": round(rb / ra, 3) if rb else None}
with open("target/BENCH_AB_NOISE_SUMMARY_r16.json", "w") as f:
    f.write(json.dumps(out) + "\n")
print(json.dumps(out["queries"]))
EOF
echo "step 4 rc=$?"

echo "=== step 5: sf1 new/changed queries (one shared JVM, exact names) ==="
SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 \
SPARK_GRAFT_BENCH_ONLY=$NEWQ \
SPARK_GRAFT_BENCH_EXACT=1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SF1_NEWOPS_r16.json \
java -Xmx24g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
  > /tmp/bench_sf1_newops_r16.log 2>&1
echo "step 5 rc=$?"
python3 - <<'EOF'
import json
p = "target/BENCH_SF1_NEWOPS_r16.json"
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
    SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SF10_r16_$q.json \
    java -Xmx64g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
      > /tmp/bench_sf10_r16_$q.log 2>&1
  echo "sf10 $q rc=$?"
done
python3 - <<'EOF'
import json, glob
qs, runs = {}, {}
for p in sorted(glob.glob("target/BENCH_SF10_r16_q_*.json")):
    d = json.load(open(p))
    qs.update(d["queries"]); runs.update(d.get("runs", {}))
manifest = json.load(open("target/sf10/manifest.json"))
out = {"metric": "total", "value": round(sum(qs.values()), 3),
       "unit": "sec", "queries": qs, "sf": "/root/repo/target/sf10",
       "runs": runs, "data_manifest": manifest,
       "note": "one JVM per query (SPARK_GRAFT_BENCH_RUNS=1, light "
               "warmup), merged by tools/campaign_r16.sh step 6; "
               "data_manifest pins the exact scaled-data content "
               "(tools/gen_scale.py) this artifact measured"}
with open("target/BENCH_SF10_NEWOPS_r16.json", "w") as f:
    f.write(json.dumps(out) + "\n")
print("merged", len(qs), "queries")
EOF
echo "step 6 rc=$?"

echo "=== step 7: query-surface recall rows (tools/QueryRecall) ==="
SPARK_GRAFT_CPUS=16 \
java -Xmx16g -XX:+UseG1GC -cp "$CP" $OPENS graft.tools.QueryRecall \
  /root/testdata/sf0.1 /root/repo/target/QUERY_RECALL_SF01_r16.json \
  > /tmp/qrecall_sf01_r16.log 2>&1
echo "step 7a rc=$?"
SPARK_GRAFT_CPUS=16 \
timeout 7200 java -Xmx24g -XX:+UseG1GC -cp "$CP" $OPENS \
  graft.tools.QueryRecall \
  /root/repo/target/sf1 /root/repo/target/QUERY_RECALL_SF1_r16.json \
  > /tmp/qrecall_sf1_r16.log 2>&1
echo "step 7b rc=$?"
python3 - <<'EOF'
import json
for p in ("target/QUERY_RECALL_SF01_r16.json",
          "target/QUERY_RECALL_SF1_r16.json"):
    try:
        d = json.load(open(p))
    except Exception as e:
        print(p, "unreadable:", e); continue
    out = {"rows": d, "note": "recall through SparkEntry.queries (the "
           "shipped, oracle-checked surfaces), tools/QueryRecall"}
    if "sf1" in p:
        out["data_manifest"] = json.load(open("target/sf1/manifest.json"))
    with open(p, "w") as f:
        f.write(json.dumps(out) + "\n")
print("recall artifacts stamped")
EOF

echo "=== step 8: 50-batch sf1 soaks, guarded families + cc (bloom ON) ==="
SPARK_GRAFT_CPUS=16 \
java -Xmx24g -XX:+UseG1GC -cp "$CP" $OPENS graft.tools.NearlineSoak \
  /root/repo/target/sf1/documents.parquet 50 \
  /root/repo/target/SOAK_GUARDED_SF1_r16.json bm25,xmodal,line,dedupx,cc \
  > /tmp/soak_guarded_r16.log 2>&1
echo "step 8 rc=$?"

echo "=== step 9: counterfactual soak arm (bloom OFF) ==="
SPARK_GRAFT_BLOOM=off SPARK_GRAFT_CPUS=16 \
java -Xmx24g -XX:+UseG1GC -cp "$CP" $OPENS graft.tools.NearlineSoak \
  /root/repo/target/sf1/documents.parquet 50 \
  /root/repo/target/SOAK_OFF_SF1_r16.json bm25,xmodal,line,dedupx,cc \
  > /tmp/soak_off_r16.log 2>&1
echo "step 9 rc=$?"

echo "=== step 10: sf10 bloom-OVERLOAD soak (bm25+dedupx past 420k "
echo "    keys: the resize must fire — guard bytes step up — and "
echo "    fresh-batch scan bytes stay ~0) ==="
SPARK_GRAFT_CPUS=32 \
java -Xmx64g -XX:+UseG1GC -cp "$CP" $OPENS graft.tools.NearlineSoak \
  /root/repo/target/sf10/documents.parquet 25 \
  /root/repo/target/SOAK_OVERLOAD_SF10_r16.json bm25,dedupx \
  > /tmp/soak_overload_r16.log 2>&1
echo "step 10 rc=$?"
python3 - <<'EOF'
import json
for p in ("target/SOAK_GUARDED_SF1_r16.json", "target/SOAK_OFF_SF1_r16.json"):
    d = json.load(open(p))
    d["data_manifest"] = json.load(open("target/sf1/manifest.json"))
    with open(p, "w") as f:
        f.write(json.dumps(d) + "\n")
d = json.load(open("target/SOAK_OVERLOAD_SF10_r16.json"))
d["data_manifest"] = json.load(open("target/sf10/manifest.json"))
with open("target/SOAK_OVERLOAD_SF10_r16.json", "w") as f:
    f.write(json.dumps(d) + "\n")
print("soak artifacts stamped")
EOF
echo "campaign done"
