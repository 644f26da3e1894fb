ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "aghadatavalidationpipelinespark"
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
// The forked run's stdout passes through UNPREFIXED (no sbt [info]
// decoration): Bench/Verify print one machine-readable JSON line that the
// calling harness parses; Spark's own logs go to stderr.
run / outputStrategy := Some(StdoutOutput)
// Shuffle/spill on tmpfs: the calling environment may export
// SPARK_LOCAL_DIRS (which silently overrides spark.local.dir) pointing at
// the single shared virtio disk — that serializes shuffle I/O across all
// cores and poisons scaling measurements. On a real cluster each executor
// has node-local disks; tmpfs is the honest local-mode analog.
run / envVars += ("SPARK_LOCAL_DIRS" -> "/dev/shm/graft-spark")
Test / envVars += ("SPARK_LOCAL_DIRS" -> "/dev/shm/graft-spark")
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
  // 16g default: the scaling bench pushes ~6 GB/pass through one JVM; a
  // tight heap makes GC a noise source in the measured window (host has
  // 128 GiB)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // columnar cache batches approach the G1 humongous-allocation threshold;
  // a fixed 32m region keeps multi-MB batch buffers out of humongous space
  "-XX:G1HeapRegionSize=32m",
) ++ sys.env.get("GRAFT_JAVA_OPTS").map(_.split(" ").toSeq).getOrElse(Seq())
