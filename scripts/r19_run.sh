#!/bin/bash
# Round-19 measurement runner: run any graft main class from a compiled
# classes dir with the bench session dials, without sbt's JVM startup or
# its build lock (paired A/B runs need back-to-back launches).
# Usage: scripts/r19_run.sh <classes_dir> <mainClass> [args...]
# Env passthrough: SPARK_GRAFT_* honored as in receipt_run.sh.
set -u
cd "$(dirname "$0")/.."
CLASSES=$1 MAIN=$2; shift 2
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
exec java $OPENS -Xmx${R19_XMX:-16g} -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" "$MAIN" "$@"
