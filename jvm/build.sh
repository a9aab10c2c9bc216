#!/bin/sh
# Build jars/spark-graft-nochmodfs.jar from jvm/src.
#
# Compiles against the hadoop-client-api jar that ships inside the
# installed pyspark (same Hadoop the runtime loads), so no network or
# external toolchain beyond a JDK is needed. Re-run after editing
# jvm/src and commit the rebuilt jar.
set -eu
cd "$(dirname "$0")"
PYSPARK_JARS=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
HADOOP_API=$(ls "$PYSPARK_JARS"/hadoop-client-api-*.jar)
OUT=$(mktemp -d)
javac -encoding UTF-8 -classpath "$HADOOP_API" -d "$OUT" src/sparkgraft/*.java
jar cf ../jars/spark-graft-nochmodfs.jar -C "$OUT" sparkgraft
rm -rf "$OUT"
echo "built ../jars/spark-graft-nochmodfs.jar"
