#!/bin/bash
# Scaling-only bench run via plain java (no sbt lock). Writes JSON to stdout.
cd /root/repo
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_LOCAL_DIRS="${SPARK_GRAFT_LOCAL_DIR:-/dev/shm/graft-spark}"
# local-cluster workers launch executors via the Spark distribution's
# in-process launcher, which needs SPARK_HOME *and* SPARK_SCALA_VERSION
# (normally set by bin/load-spark-env.sh); without them every
# ExecutorRunner dies with "Cannot find any build directories" and the
# fleet never registers. Mirrors build.sbt's envVars for the sbt path.
export SPARK_HOME=/opt/spark
export SPARK_SCALA_VERSION=2.13
exec java $ADDOPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx32g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
