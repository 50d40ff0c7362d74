package graft.tools

/** Dump `.explain("formatted")` for declared queries to one file per
  * query — the optimization round's before/after plan evidence
  * (plans/r13/<name>_before.txt / _after.txt).
  *
  * Building a query's DataFrame executes any side-effecting setup it
  * carries (streaming replays, CdcPipeline batches) exactly as the
  * bench does; the dumped plan is the plan of the RETURNED DataFrame —
  * the one the bench's `count()` executes. With AQE on, this is the
  * initial plan (`isFinalPlan=false`): Exchange placement, join
  * strategy, PushedFilters and ReadSchema are all visible; runtime
  * coalescing is not, and that is fine for shape claims.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [names]
  *   names: comma-separated query names; omit or "all" for the full
  *   surface.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = if (args.length > 2) args(2) else "before"
    val names: Seq[String] =
      if (args.length > 3 && args(3) != "all")
        args(3).split(",").map(_.trim).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      val out = outDir.resolve(s"${name}_$suffix.txt")
      try {
        val df = qs(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(out,
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] $name -> $out")
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[plandump] $name FAILED: $e")
      }
      graft.GraftSession.dropTempViews(spark)
    }
    spark.stop()
  }
}
