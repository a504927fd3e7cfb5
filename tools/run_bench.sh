#!/bin/bash
# Local bench loop: compile + run graft.Bench exactly as the driver does.
# Usage: tools/run_bench.sh [sfDir] [cpus]
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.1}
CPUS=${2:-32}
# copyResources too: a bare `compile` leaves META-INF/services out of the
# classes dir and the bvgraph short name would fail to resolve
sbt -batch compile Compile/copyResources 2>&1 | grep -E 'error|success'
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
java $ADD_OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench 2>/dev/null | tail -1
