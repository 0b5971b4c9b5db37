#!/bin/bash
# Capture graft.Smoke's .explain("formatted") for one query to stdout.
# Usage: tools/explain_query.sh <query> [sfDir]
set -e
cd "$(dirname "$0")/.."
Q=$1; SF=${2:-/root/testdata/sf0.01}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  java $ADD_OPENS -Dfile.encoding=UTF-8 -Xmx8g \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Smoke "$Q" "$SF" \
  2>/dev/null | sed -n '/^== Physical Plan ==/,/^rows (first/p' | head -n -1
