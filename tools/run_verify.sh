#!/bin/bash
# Local loop: compile, run graft.Verify on a testdata SF dir, then compare
# against DuckDB oracles (mimics the driver's t2 gate).
# Usage: tools/run_verify.sh [sfDir] [outDir]
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
# copyResources too: a bare `compile` leaves META-INF/services out of the
# classes dir and the bvgraph short name would fail to resolve
sbt -batch compile Compile/copyResources 2>&1 | grep -E 'error|success'
rm -rf "$OUT"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
java $ADD_OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF" "$OUT" 2>&1 | grep -vE '^2[0-9]|WARN|INFO' || true
python3 tools/check_oracle.py "$SF" "$OUT"
