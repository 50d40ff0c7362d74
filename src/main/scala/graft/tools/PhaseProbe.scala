package graft.tools

/** Isolated fresh-JVM profile of the THREE phase headlines BASELINE.md
  * names (the reference's own measurement protocol,
  * tests/test_performance.py): `bulk_rows_per_sec` (initial
  * replication through the sharded snapshot path),
  * `final_rows_per_sec` (the FINAL dedup-on-read over the loaded
  * table) — the exact [[graft.Bench.bulkLoad]] code the full bench
  * times — and `events_per_sec` (realtime CDC through
  * `CdcPipeline.processBatch`), with NOTHING in front of them.
  *
  * Why it exists (VERDICT r10 task 1; r12 task 1 added events): in
  * the full bench these phases run AFTER ~200 queries × 2 passes in
  * the same JVM, so a headline dip can be session drift (heap shape,
  * page cache, shuffle-dir fill) rather than code. The r8 events/s
  * question was settled by exactly this method — a fresh-JVM isolated
  * run is the code's number; the in-sequence number carries the
  * session tax. r12's official artifact published 121 681 events/s
  * while the SAME HEAD measured 279 592 the same day — the events
  * headline was still the in-sequence sample. Here the event fixture
  * is built ONCE, outside the timed loop (official runs also showed
  * `fixture_sec` riding the weather, 3.19 vs 0.35 steady), and each
  * timed run replays the full durable pipeline into a fresh
  * warehouse.
  *
  * Usage: runMain graft.tools.PhaseProbe <sfDir> <outJson> [runs]
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outJson = args(1)
    val runs = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)

    def gcMs(): Long = {
      var s = 0L
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .forEach { b => val t = b.getCollectionTime; if (t > 0) s += t }
      s
    }

    // one untimed warmup: codegen/JIT/page cache, same as the bench's
    // warmup contract (steady-state medians)
    graft.Bench.bulkLoad(spark, sfDir, shards = 4)
    val gc0 = gcMs()
    val timed = (0 until runs).map { _ =>
      graft.Bench.bulkLoad(spark, sfDir, shards = 4)
    }
    val gc = gcMs() - gc0
    val rows = timed.head._1
    def med(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val loadTs = timed.map(_._2)
    val finalTs = timed.map(_._3)

    // e2e/events phase: fixture built ONCE (untimed), then `runs` timed
    // replays of the full durable pipeline, each into a fresh warehouse
    // (a replay into a warm table would measure merge-into-existing, a
    // different phase than the realtime-loop headline).
    val (batch, nEvents, fixtureSec, _) =
      graft.queries.CdcQueries.e2eFixture(spark, sfDir)
    def rm(p: java.io.File): Unit = {
      Option(p.listFiles).foreach(_.foreach(rm)); p.delete(); ()
    }
    def replayOnce(): Double = {
      val wh = java.nio.file.Files.createTempDirectory("graft-probe-e2e")
      try {
        val (_, sec, _) =
          graft.queries.CdcQueries.e2eReplay(spark, batch, wh.toString)
        sec
      } finally rm(wh.toFile)
    }
    replayOnce() // untimed warmup, same contract as bulk
    val gcE0 = gcMs()
    val e2eTs = (0 until runs).map(_ => replayOnce())
    val gcE2e = gcMs() - gcE0

    val json =
      s"""{"sf_dir":"$sfDir","rows":$rows,"runs":$runs,""" +
        s""""bulk_sec":[${loadTs.map(t => f"$t%.6f").mkString(",")}],""" +
        s""""final_sec":[${finalTs.map(t => f"$t%.6f").mkString(",")}],""" +
        s""""bulk_med_sec":${f"${med(loadTs)}%.6f"},""" +
        s""""final_med_sec":${f"${med(finalTs)}%.6f"},""" +
        s""""bulk_rows_per_sec":${math.round(rows / med(loadTs))},""" +
        s""""final_rows_per_sec":${math.round(rows / med(finalTs))},""" +
        s""""events":$nEvents,"fixture_sec":${f"$fixtureSec%.6f"},""" +
        s""""e2e_sec":[${e2eTs.map(t => f"$t%.6f").mkString(",")}],""" +
        s""""e2e_med_sec":${f"${med(e2eTs)}%.6f"},""" +
        s""""events_per_sec":${math.round(nEvents / med(e2eTs))},""" +
        s""""gc_ms_e2e":$gcE2e,""" +
        s""""gc_ms_timed":$gc}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
