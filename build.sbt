ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tarantulaspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// local-cluster bench mode forks real executor JVMs and needs the Spark
// distribution root to build their launch command
val sparkHomeEnv = Map(
  "SPARK_HOME" -> sys.env.getOrElse("SPARK_HOME", "/opt/spark"),
  // the executor launcher needs this when bypassing bin/load-spark-env.sh
  "SPARK_SCALA_VERSION" -> "2.13",
  // standalone workers hand executors their local dirs via env, ignoring
  // spark.local.dir — without this, executor shuffle files land on the
  // slow disk-backed /tmp and serialize the whole shuffle path
  "SPARK_LOCAL_DIRS" -> sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
Compile / run / envVars ++= sparkHomeEnv
Compile / runMain / envVars ++= sparkHomeEnv
Test / envVars ++= sparkHomeEnv
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
