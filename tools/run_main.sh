#!/bin/bash
# Run a graft main against the already-compiled classes WITHOUT sbt —
# no build-lock contention with a concurrently running sbt, no ~25 s
# JVM+sbt startup per run. Compile first (sbt compile); this script
# does NOT recompile.
#
#   tools/run_main.sh graft.tools.FuzzGen 40 /root/testdata/sf0.01 tmp/fuzz40
#
# Env knobs mirror the sbt fork: SPARK_DRIVER_MEM (default 8g), plus
# any -D via JAVA_TOOL_EXTRA.
set -e
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  $JAVA_TOOL_EXTRA \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
