#!/bin/bash
# Direct-JVM runner for graft probe mains: same classpath (compiled
# classes + the unmanaged Spark jars) and JDK-17 module flags as
# build.sbt's forked run, WITHOUT the sbt project lock — long probes no
# longer serialize against compiles/tests. Compile first (sbt compile);
# heap via SPARK_DRIVER_MEM (default 8g), cpus via SPARK_GRAFT_CPUS.
#   tools/runmain.sh graft.ScaleProbe 200000 384
set -euo pipefail
MAIN=$1; shift
MEM=${SPARK_DRIVER_MEM:-8g}
exec java \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"$MEM" \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
