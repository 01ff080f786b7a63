#!/bin/bash
# Round-10 measurement campaign — strictly sequential (bench protocol:
# nothing heavy may run concurrently). Artifacts land in target/.
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

echo "=== step 1: shared full bench sf0.1 (driver conditions) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SHARED_r10.json \
java -Xmx16g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
  > /tmp/bench_shared_r10.log 2>&1
echo "step 1 rc=$?"

echo "=== step 2: isolated sf0.1 for the >=2s queries ==="
SLOW=$(python3 -c "
import json
d = json.load(open('target/BENCH_SHARED_r10.json'))
print(','.join(sorted(n for n, v in d['queries'].items() if v >= 2.0)))")
echo "isolating: $SLOW"
python3 tools/bench_isolated.py /root/testdata/sf0.1 \
  target/BENCH_ISOLATED_r10.json --runs 3 --queries "$SLOW" \
  > /tmp/bench_isolated_r10.log 2>&1
echo "step 2 rc=$?"

echo "=== step 2b: A/B summary ==="
python3 - <<'EOF'
import json
shared = json.load(open('target/BENCH_SHARED_r10.json'))
iso = json.load(open('target/BENCH_ISOLATED_r10.json'))
merged = dict(shared['queries'])
for n, v in iso['queries'].items():
    merged[n] = v
shared_total = sum(shared['queries'].values())
merged_total = sum(merged.values())
out = {
    'shared_total': round(shared_total, 2),
    'isolated_merged_total': round(merged_total, 2),
    'ratio': round(shared_total / merged_total, 4),
    'per_query_shared_vs_isolated': {
        n: {'shared': round(shared['queries'][n], 2),
            'isolated': round(v, 2),
            'ratio': round(shared['queries'][n] / v, 3)}
        for n, v in sorted(iso['queries'].items())},
}
json.dump(out, open('target/BENCH_AB_r10.json', 'w'), indent=1)
print(json.dumps({k: out[k] for k in ('shared_total',
  'isolated_merged_total', 'ratio')}))
EOF

echo "=== step 3: sf1 composed pipelines ==="
SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 \
SPARK_GRAFT_BENCH_ONLY=q_pipeline_llm,q_pipeline_default,q_pipeline_declarative,q_pipeline_e2e,q_stream_warehouse \
SPARK_GRAFT_BENCH_EXACT=1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SF1_PIPE_r10.json \
java -Xmx24g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
  > /tmp/bench_sf1_pipe.log 2>&1
echo "step 3 rc=$?"

echo "=== step 4: sf10 composed pipelines (one JVM per query) ==="
for q in q_pipeline_llm q_pipeline_default q_pipeline_declarative \
         q_pipeline_e2e q_stream_warehouse; do
  echo "--- sf10 $q ---"
  timeout 5400 env \
    SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 \
    SPARK_GRAFT_INITIAL_PARTITIONS=512 \
    SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_BENCH_EXACT=1 \
    SPARK_GRAFT_BENCH_WARMUP=light SPARK_GRAFT_BENCH_RUNS=1 \
    SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SF10_$q.json \
    java -Xmx64g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
      > /tmp/bench_sf10_$q.log 2>&1
  echo "sf10 $q rc=$?"
done

echo "=== step 5: nearline soak sf1, 50 batches ==="
SPARK_GRAFT_CPUS=32 \
java -Xmx24g -XX:+UseG1GC -cp "$CP" $OPENS graft.tools.NearlineSoak \
  /root/repo/target/sf1/documents.parquet 50 \
  /root/repo/target/SOAK_SF1_r10.json \
  > /tmp/soak_sf1.log 2>&1
echo "step 5 rc=$?"
echo "=== campaign done ==="
