#!/usr/bin/env bash
# Zero-code deployment smoke test, in a FRESH JVM (not the sbt/test JVM):
#
#   sbt package                      -> target/scala-2.13/exonspark_*.jar
#   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
#
# The driver class (graft.tools.DeploySmoke) never calls registerAll, so a
# pass proves the one-conf-line deployment path: scalar UDFs + SQL table
# functions arrive via the extension injection, formats via
# META-INF/services. Exit code 0 = all checks passed.
set -euo pipefail
cd "$(dirname "$0")/.."

SPARK_HOME="${SPARK_HOME:-/opt/spark}"

sbt -batch package
JAR=$(ls target/scala-2.13/exonspark_2.13-*.jar | head -1)
echo "jar: $JAR"

exec "$SPARK_HOME/bin/spark-submit" \
  --master 'local[4]' \
  --conf spark.sql.extensions=graft.GraftExtensions \
  --conf spark.ui.enabled=false \
  --class graft.tools.DeploySmoke \
  "$JAR" "${1:-/root/testdata/sf0.001}"
