#!/bin/bash
# Local measurement helper (guide §1): runs graft.Bench directly with
# java (no sbt startup) from a scratch cwd so experiment runs never
# clobber the committed bench_local.json. Not part of the driver
# contract — the driver keeps using `sbt "runMain graft.Bench"`.
# Usage: benchrun.sh <workdir> [extra env via environment]
set -e
WD="${1:-/tmp/benchwork}"
mkdir -p "$WD"
cd "$WD"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "${BENCH_MAIN:-graft.Bench}"
