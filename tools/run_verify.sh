#!/bin/bash
# Dev harness: run graft.Verify directly (no sbt JVM overhead).
# Usage: tools/run_verify.sh [sfDir] [outDir] [mainClass] [onlyQueries]
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-target/verify_out}
MAIN=${3:-graft.Verify}
# wipe stale outputs so a failed query can't masquerade as a pass
if [ "$MAIN" = "graft.Verify" ]; then rm -rf "$OUT"; fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# GC left to JVM ergonomics (r14: r13's unconditional -XX:+UseParallelGC
# regressed the big-heap driver bench; see build.sbt). Extra JVM flags for
# experiments go through SPARK_GRAFT_JVM_OPTS.
exec java $ADD_OPENS -Xmx${SPARK_GRAFT_XMX:-8g} ${SPARK_GRAFT_JVM_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/opt/spark/jars/*:target/scala-2.13/classes" \
  "$MAIN" "$SF" "$OUT" ${4:+"$4"}
