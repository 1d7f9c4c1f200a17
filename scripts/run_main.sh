#!/bin/bash
# Run a graft main class directly on the compiled classes — no sbt lock, so
# a long scaling run can share the machine with an interactive sbt session.
# Mirrors build.sbt's forked-JVM options (JDK17 add-opens, UTC, no UI).
# Usage: scripts/run_main.sh <MainClass> [args...]   (compile first: sbt compile)
set -euo pipefail
cd "$(dirname "$0")/.."
CLASSES=target/scala-2.13/classes
[ -d "$CLASSES" ] || { echo "run 'sbt compile' first ($CLASSES missing)" >&2; exit 1; }
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
