package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // SPARK_GRAFT_ONLY=q1,q2 narrows the run for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val queries = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val spark = GraftSession.local(cpus)
    // Untimed warmup at the smallest scale factor (when present next to
    // the bench dir): absorbs one-time JVM costs — Janino codegen
    // compilation, aggregate/join class loading, JIT — so the timed pass
    // measures steady-state throughput, matching how the reference's
    // long-lived replicator process is benchmarked. Failures are ignored
    // here; the timed loop reports them.
    val warmDir = new java.io.File(sfDir).getParentFile match {
      case null => None
      case p => Some(new java.io.File(p, "sf0.001")).filter(_.isDirectory)
    }
    warmDir.foreach { d =>
      queries.values.foreach { fn =>
        try fn(spark, d.getPath).count()
        catch { case _: Throwable => () }
      }
      spark.catalog.clearCache()
    }
    // the warmup populated the e2e stats from the TINY fixture — a timed
    // run that then fails must not report the warmup's events/s under
    // the big sf label
    graft.queries.CdcQueries.lastE2eStats = None

    // A failed query must NOT masquerade as a timing: it reports -1 and
    // lands in "errors" so a red query can't inflate a green-looking run.
    val results = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e"); false
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // operators persist shared intermediates; drop them between queries
      // so one query's cache residue can't distort the next measurement.
      // Streaming queries leave memory-sink tables behind — driver-heap
      // residents that accumulate across the run; drop those too.
      spark.catalog.clearCache()
      spark.catalog.listTables().collect()
        .filter(_.isTemporary).foreach(t => spark.catalog.dropTempView(t.name))
      name -> (if (ok) elapsed else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v < 0 => s"\"$k\"" }
      .mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    // headline vs the reference's ~20k events/s realtime claim: the e2e
    // query reports pipeline-only time (fixture synthesis split out)
    val e2e = graft.queries.CdcQueries.lastE2eStats.map(s =>
      s""","events_per_sec":${math.round(s.eventsPerSec)}""" +
        s""","e2e":{"events":${s.events},"fixture_sec":${s.fixtureSec},""" +
        s""""pipeline_sec":${s.pipelineSec}}""").getOrElse("")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors$e2e,"sf":"$sfDir"}""")
    spark.stop()
  }
}
