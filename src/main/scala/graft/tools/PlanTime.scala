package graft.tools

/** Where does a small-data query's wall go — planning or execution?
  *
  * For each named query: build the DataFrame (fits/side effects run
  * here), then time (a) planning — a fresh Dataset over the same
  * logical plan, forced through analysis/optimization/physical
  * planning via `executedPlan` — and (b) execution — `count()` on a
  * freshly planned copy — separately, `runs` times each. Guides the
  * choose-your-target decision of guide §1.2 (distributed algorithm vs
  * per-task work vs overhead) for queries whose data is KB-scale but
  * whose expression trees are not.
  *
  * Usage: runMain graft.tools.PlanTime <sfDir> <names> [runs]
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).toSeq
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      val df = qs(name)(spark, sfDir)
      df.count() // warm: codegen/JIT/caches
      val plan = df.queryExecution.logical
      (0 until runs).foreach { i =>
        // planning: a fresh QueryExecution over the same logical plan,
        // forced through analysis → optimization → physical planning
        val t0 = System.nanoTime()
        spark.sessionState.executePlan(plan).executedPlan
        val tPlan = (System.nanoTime() - t0) / 1e9
        // execution: the original Dataset's QueryExecution caches its
        // planning after the warmup count, so this count is exec-only
        val t1 = System.nanoTime()
        df.count()
        val tExec = (System.nanoTime() - t1) / 1e9
        println(f"[plantime] $name run$i plan=$tPlan%.3f s exec=$tExec%.3f s")
      }
      graft.GraftSession.dropTempViews(spark)
    }
    spark.stop()
  }
}
