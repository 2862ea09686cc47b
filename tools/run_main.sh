#!/bin/bash
# Run a graft main class via plain java (no sbt lock, no [info] prefixes).
# usage: tools/run_main.sh <mainClass> [args...]
# env: GRAFT_MEM (default 8g), GRAFT_APC (ActiveProcessorCount; default unset)
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
MEM="${GRAFT_MEM:-8g}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
APCFLAG=""
if [ -n "${GRAFT_APC:-}" ]; then APCFLAG="-XX:ActiveProcessorCount=$GRAFT_APC"; fi
exec java -cp "$CP" -Xmx"$MEM" -Xms"$MEM" $APCFLAG \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  $OPENS "$@"
