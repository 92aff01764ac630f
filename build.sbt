ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "listenbrainzserverspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // JDK 17 G1 retries a failed allocation only TWICE while a JNI
  // critical section (snappy/zstd in the parquet codec) holds the
  // GCLocker — under heavy Tungsten page churn that throws a SPURIOUS
  // OutOfMemoryError with plenty of heap free (hit by the round-9 100×
  // probes; JDK 21 removed the failure mode). Production clusters set
  // the same pair via spark.executor.extraJavaOptions.
  "-XX:+UnlockDiagnosticVMOptions", "-XX:GCLockerRetryAllocationCount=64",
) ++
  // Probe hook: space-separated extra JVM flags for the forked run JVM
  // (e.g. -Dspark.eventLog.enabled=true to get per-stage timings out of
  // a ProbeOne run). Spark picks spark.* system properties up into
  // SparkConf, so this needs no code path in the mains. Unset = no-op.
  sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq
    .flatMap(_.split("\\s+").filter(_.nonEmpty))
