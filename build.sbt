ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "openeoprocessesdaskspark"
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
// Pass the forked JVM's stdout straight through instead of routing it via
// sbt's logger: the logger prefixes every line with "[info] ", which breaks
// the driver's json.loads of Bench's single-line output.
run / outputStrategy := Some(StdoutOutput)
// ...and suppress the trailing "[success] Total time: ..." line for the same
// reason: Bench's JSON must be the LAST line on stdout. (Commands read the
// key even though no task does — exclude it from the unused-key lint.)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // Whole-stage-codegen class cache (STATIC conf — must be set before the
  // SparkContext exists, hence here and not in SparkTuning.tune). The
  // stock 100-entry LRU cannot hold one pass of a many-query session
  // (~10-20 codegen units per query plan × a 180+-query registry), so
  // every invocation re-Janino-compiles every stage, serialized behind
  // CodeGenerator.compile's per-source KeyLock — thread dumps under
  // graft.Bench showed 32 executor threads parked on that lock while
  // kilobyte-sized stages waited on fresh compiles. 8192 entries holds
  // the registry's full working set (~2-3k distinct sources; compiled
  // classes live in metaspace, ~30 KB each, ≤ ~250 MB worst case). On a
  // real cluster the same knob belongs in spark-defaults.conf.
  // SPARK_CODEGEN_CACHE_ENTRIES=100 restores the stock size for A/Bs.
  s"-Dspark.sql.codegen.cache.maxEntries=${sys.env.getOrElse("SPARK_CODEGEN_CACHE_ENTRIES", "8192")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
