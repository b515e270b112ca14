#!/bin/sh
# Direct-JVM launcher for graft mains (what sbt's javaOptions provide, for
# `java -cp` runs): JDK-17 add-opens — the RDD-core queries' Kryo shuffle
# path needs java.base/java.nio opened — plus the standard session props.
# Usage: tools/jrun.sh [-XmxNN] graft.Main args...
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
XMX=48g
case "$1" in -Xmx*) XMX="${1#-Xmx}"; shift;; esac
exec java -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*" \
  -Xmx"$XMX" -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  "$@"
