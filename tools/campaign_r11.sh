#!/bin/bash
# Round-11 measurement campaign — strictly sequential (bench protocol:
# nothing heavy may run concurrently). Artifacts land in target/.
# Focus: the four new round-11 queries (q_lm_perplexity, q_hybrid_rrf,
# q_ann_pq, q_quality_classifier) at sf0.1 shared + isolated, then
# sf1 and sf10, plus a full shared sweep for round-over-round control.
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
NEWQ="q_lm_perplexity,q_hybrid_rrf,q_ann_pq,q_quality_classifier"

echo "=== step 1: shared full bench sf0.1 (driver conditions) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SHARED_r11.json \
java -Xmx16g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
  > /tmp/bench_shared_r11.log 2>&1
echo "step 1 rc=$?"

echo "=== step 2: isolated sf0.1 medians for the new queries ==="
python3 tools/bench_isolated.py /root/testdata/sf0.1 \
  target/BENCH_ISOLATED_NEWOPS_r11.json --runs 3 --queries "$NEWQ" \
  > /tmp/bench_isolated_r11.log 2>&1
echo "step 2 rc=$?"

echo "=== step 3: sf1 new queries (one shared JVM, exact names) ==="
SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 \
SPARK_GRAFT_BENCH_ONLY=$NEWQ \
SPARK_GRAFT_BENCH_EXACT=1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SF1_NEWOPS_r11.json \
java -Xmx24g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
  > /tmp/bench_sf1_newops.log 2>&1
echo "step 3 rc=$?"

echo "=== step 4: sf10 new queries (one JVM per query) ==="
for q in q_lm_perplexity q_hybrid_rrf q_ann_pq q_quality_classifier; do
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
echo "=== campaign done ==="