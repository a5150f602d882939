#!/bin/bash
# Run a graft main on the raw classpath (no sbt lock held).
#
# SPARK_HOME / SPARK_SCALA_VERSION must reach the JVM env: the in-process
# Worker of a local-cluster master builds each executor command through
# launcher.WorkerCommandBuilder, which force-overwrites the child's
# SPARK_HOME with the WORKER's sparkHome — and the Worker resolves that
# from the env (cwd-relative "." when absent, then dies looking for
# ./assembly/target/scala-2.13/jars). spark.executorEnv.* cannot fix this
# (it is applied before the override), so a clean `env -i` launch needs
# the exports here; ClusterSmoke additionally pins the worker-side home
# in-code (spark.test.home) so even a bare `java -cp` works.
export SPARK_HOME="${SPARK_HOME:-/opt/spark}"
export SPARK_SCALA_VERSION="${SPARK_SCALA_VERSION:-2.13}"
CP="/root/repo/target/scala-2.13/classes:$(ls "$SPARK_HOME"/jars/*.jar | tr '\n' ':')"
exec java -Xmx96g --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -cp "$CP" "$@"
