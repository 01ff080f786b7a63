#!/bin/bash
# Round-17 OPTIMIZATION A/B: control classes (a worktree build of the
# chosen baseline commit) vs working tree, INTERLEAVED one-JVM-per-sweep
# (the BENCH_AB_INTERLEAVED_r16 protocol), isolated per-query sessions
# inside each sweep (Bench's fresh-context harness), light warmup,
# 1 timed run per query per sweep.
# Usage: ab_r17opt.sh <tag> <comma-separated-queries> <rounds> [sfdir]
# Hardened per ADVICE.md r16: fails fast when the control classes are
# missing and aborts on any non-zero bench exit.
set -eu
cd /root/repo
TAG="$1"; QUERIES="$2"; ROUNDS="${3:-3}"; SFDIR="${4:-/root/testdata/sf0.1}"
CP_BEFORE="${CP_BEFORE_DIR:-target/headctrl/target/scala-2.13/classes}"
CP_AFTER="target/scala-2.13/classes"
for d in "$CP_BEFORE" "$CP_AFTER"; do
  if [ ! -f "$d/graft/Bench.class" ]; then
    echo "FATAL: classes dir $d missing or has no graft.Bench" >&2
    exit 1
  fi
done
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
mkdir -p "target/ab_$TAG"
for r in $(seq 1 "$ROUNDS"); do
  for side in before after; do
    if [ "$side" = before ]; then CP="$CP_BEFORE:/opt/spark/jars/*"
    else CP="$CP_AFTER:/opt/spark/jars/*"; fi
    SPARK_GRAFT_SF_DIR="$SFDIR" \
    SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
    SPARK_GRAFT_BENCH_EXACT=1 \
    SPARK_GRAFT_BENCH_WARMUP=light \
    SPARK_GRAFT_BENCH_RUNS=1 \
    SPARK_GRAFT_BENCH_OUT="/root/repo/target/ab_$TAG/${side}_r$r.json" \
    java -Xmx16g -XX:+UseG1GC -cp "$CP" $OPENS graft.Bench \
      > "/tmp/ab_${TAG}_${side}_r$r.log" 2>&1 \
      || { echo "FATAL: round $r $side bench failed (rc=$?), see /tmp/ab_${TAG}_${side}_r$r.log" >&2; exit 1; }
    echo "round $r $side ok"
  done
done
python3 - "$TAG" <<'EOF'
import json, sys, glob, statistics
tag = sys.argv[1]
def med(side):
    runs = [json.load(open(f))["queries"]
            for f in sorted(glob.glob(f"target/ab_{tag}/{side}_r*.json"))]
    qs = runs[0].keys()
    return {q: statistics.median([r[q] for r in runs]) for q in qs}
b, a = med("before"), med("after")
out = {q: {"before": round(b[q], 3), "after": round(a[q], 3),
           "ratio": round(a[q] / b[q], 3)} for q in sorted(b)}
out["_total"] = {"before": round(sum(b.values()), 2),
                 "after": round(sum(a.values()), 2),
                 "ratio": round(sum(a.values()) / sum(b.values()), 3)}
json.dump(out, open(f"target/ab_{tag}/summary.json", "w"), indent=1)
print(json.dumps(out, indent=1))
EOF
