ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mysql_ch_replicatorspark"
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
  // local[32] puts driver + all executor threads in ONE JVM: the whole
  // bench surface (45 queries, streaming memory sinks, an ~900k-event
  // CDC replay) shares this heap. 8g measurably GC-thrashes the tail of
  // the run (cdc_e2e_replicate: 21s in-sequence vs 7s alone); 32g on
  // the 128 GiB host keeps every query at its solo timing.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
) ++ {
  // Throughput collector by default: the r8 official bench attributed
  // 7.6 s of the CDC family's 27.3 s to GC; an A/B on the mixed set
  // measured ParallelGC 11.5 s vs G1 13.5 s (cdc_e2e_replicate 2.84 s
  // vs 4.45 s). A single-JVM local[32] batch bench has no pause-time
  // SLA, so the compacting throughput collector is strictly better
  // here; real clusters tune GC per executor as usual. Overridable:
  // any SPARK_GRAFT_JVM_OPTS that names a collector wins.
  val opts = sys.env.get("SPARK_GRAFT_JVM_OPTS")
    .toSeq.flatMap(_.split("\\s+").toSeq).filter(_.nonEmpty)
  (if (opts.exists(_.contains("GC"))) Seq.empty
   else Seq("-XX:+UseParallelGC")) ++ opts
}
