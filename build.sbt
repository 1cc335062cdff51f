ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datawranglingprojectspark"
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
  // 24g (r15): at 8g the bench JVM — one heap hosting local[32]
  // execution memory, every prewarmed artifact's storage blocks AND the
  // driver — thrashed once the ~48 shared artifacts were cached:
  // measured solo walls grew run-over-run (v25 6.7→9.5 s, m6 5.2→7.5 s
  // at 8g; both flat at ~2.8/1.7 s once the heap fits), and the m-family
  // read as residual bench anomalies. The sandbox has 128 GiB; sizing
  // the JVM to the machine is the §5 memory lever, and the env override
  // keeps it parameterised for smaller hosts.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)

// The test JVM hosts EVERY suite's cached frames and sinks in one heap
// (getOrCreate shares a single SparkSession across suites); at 78+
// suites the 8g default starts throwing UNABLE_TO_ACQUIRE_MEMORY on
// execution-memory-heavy joins. Later -Xmx wins on HotSpot, so this
// overrides the base setting for tests only.
Test / javaOptions += "-Xmx16g"
