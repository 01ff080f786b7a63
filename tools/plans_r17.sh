#!/bin/bash
# Capture .explain("formatted") for the given query prefixes with the
# r16-final control classes (before) and the working tree (after).
# Usage: plans_r17.sh <comma-prefixes>
set -eu
cd /root/repo
PREFIXES="$1"
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
mkdir -p plans/r17
for side in before after; do
  if [ "$side" = before ]; then CP="target/headctrl/target/scala-2.13/classes:/opt/spark/jars/*"
  else CP="target/scala-2.13/classes:/opt/spark/jars/*"; fi
  java -Xmx8g -cp "$CP" $OPENS graft.Explain /root/testdata/sf0.001 "$PREFIXES" \
    2>/dev/null > "/tmp/plans_r17_$side.txt"
  python3 - "$side" <<'EOF'
import sys, re
side = sys.argv[1]
text = open(f"/tmp/plans_r17_{side}.txt").read()
blocks = re.split(r"\n?========== (\S+) ==========\n", text)
for i in range(1, len(blocks), 2):
    name, body = blocks[i], blocks[i+1]
    open(f"plans/r17/{name}_{side}.txt", "w").write(body.strip() + "\n")
    ex = body.count("Exchange")
    print(f"{side} {name}: {len(body)} chars, Exchange x{ex}, "
          f"BHJ x{body.count('BroadcastHashJoin')}, "
          f"SMJ x{body.count('SortMergeJoin')}")
EOF
done
