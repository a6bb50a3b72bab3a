#!/usr/bin/env bash
# Launch a graft main class directly (no sbt), with the same JVM flags
# build.sbt gives forked runs. Usage: tools/run_main.sh <MainClass> [args...]
# Env: SPARK_GRAFT_* consumed by the mains; SPARK_DRIVER_MEM heap (default 8g).
set -euo pipefail
CLS="$1"; shift
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OPENS=(java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
  java.util java.util.concurrent java.util.concurrent.atomic)
FLAGS=()
for p in "${OPENS[@]}"; do FLAGS+=(--add-opens "java.base/$p=ALL-UNNAMED"); done
FLAGS+=(--add-opens "java.base/sun.nio.ch=ALL-UNNAMED" \
  --add-opens "java.base/sun.nio.cs=ALL-UNNAMED" \
  --add-opens "java.base/sun.security.action=ALL-UNNAMED" \
  --add-opens "java.base/sun.util.calendar=ALL-UNNAMED")
exec java "${FLAGS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -cp "$REPO/target/scala-2.13/classes:$REPO/src/main/resources:/opt/spark/jars/*" \
  "$CLS" "$@"
