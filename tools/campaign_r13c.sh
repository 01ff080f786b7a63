#!/bin/bash
# Round-13 final sweep refresh — after batch B grew the query corpus to
# 166, re-run the full shared sf0.1 sweep AND the same-day r12-code
# control back-to-back (quiet window), then recompute the control
# summary. Strictly sequential; nothing else may run.
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

echo "=== step 1: shared full bench sf0.1, 166 queries ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_SHARED_B_r13.json \
java -Xmx16g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
  > /tmp/bench_shared_r13c.log 2>&1
echo "step 1 rc=$?"

echo "=== step 2: same-day r12-code control sweep (git worktree) ==="
CTRL=/root/repo/target/r12ctrl
if [ ! -d "$CTRL" ]; then
  git worktree add --detach "$CTRL" "$R12_COMMIT" > /dev/null
fi
(cd "$CTRL" && sbt -batch compile > /tmp/ctrl_compile_r13c.log 2>&1)
echo "control compile rc=$?"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_CONTROL_B_r12code_r13.json \
java -Xmx16g -XX:+UseG1GC \
  -cp "$CTRL/target/scala-2.13/classes:/opt/spark/jars/*" $OPENS \
  graft.Bench > /tmp/bench_control_r13c.log 2>&1
echo "step 2 rc=$?"

echo "=== step 3: control summary ==="
python3 - <<'EOF'
import json
cur = json.load(open("target/BENCH_SHARED_B_r13.json"))
ctl = json.load(open("target/BENCH_CONTROL_B_r12code_r13.json"))
common = sorted(set(cur["queries"]) & set(ctl["queries"]))
cs = sum(cur["queries"][q] for q in common)
xs = sum(ctl["queries"][q] for q in common)
out = {
  "protocol": ("same-day, same-host, sequential: full r13 sweep (166 "
               "queries incl. batch B) then full r12-code sweep from a "
               "git-worktree build (tools/campaign_r13c.sh)"),
  "shared_r13_total_sec": round(cur["value"], 1),
  "shared_r13_n": len(cur["queries"]),
  "control_r12code_total_sec": round(ctl["value"], 1),
  "control_r12code_n": len(ctl["queries"]),
  "common_queries": len(common),
  "common_r13_sec": round(cs, 1),
  "common_r12code_sec": round(xs, 1),
  "ratio_r13_over_r12code": round(cs / xs, 3),
}
with open("target/BENCH_CONTROL_SUMMARY_B_r13.json", "w") as f:
    f.write(json.dumps(out, indent=1) + "\n")
print(json.dumps(out, indent=1))
EOF
echo "=== refresh done ==="
