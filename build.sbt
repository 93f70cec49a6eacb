ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "salesdatapipelinespark"
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
  // 24g default: the string-heavy dedup/mart queries thrash an 8g heap
  // under 32 threads — GC pauses then bill to whichever query is being
  // timed (the round-3 driver bench billed a 40 s stall to one query).
  // The bench box has 125g; a real cluster sizes executor memory anyway.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // throughput collector for the batch engine: the query mix churns
  // short-lived row/array objects (HOF lambdas, object aggregates) and
  // ParallelGC's bulk young collections beat G1's incremental pauses
  // for pure throughput — measured 5% on the 16 heaviest sf0.1
  // queries across alternating JVMs (OPTIMIZATION_r17.md §3). Same
  // guidance as the standard executor-JVM tuning for batch Spark;
  // latency-sensitive services should keep G1.
  "-XX:+UseParallelGC",
)
