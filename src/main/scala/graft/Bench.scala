package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — the driver's per-round performance gate.
  *
  * Each query runs `SPARK_GRAFT_RUNS` times (default 5 — 3-run medians
  * left the e2e headline with ±30% between-invocation swing; five
  * stabilize it) and reports its
  * MEDIAN (plus min/max and the raw times): a single-shot bench cannot
  * tell an environment hiccup from a real regression — r5's
  * `s_ann_lsh_probe` 0.73→4.53 s "regression" was unadjudicable for
  * exactly that reason. The full result JSON is also written to a file
  * (`SPARK_GRAFT_BENCH_OUT`, default `bench_full.json`) because the
  * driver truncates long stdout lines; summary fields (`metric`,
  * `value`, `events_per_sec`, `bulk_rows_per_sec`) sit at the END of
  * the printed line so a tail-truncated capture still carries them.
  *
  * Beyond per-query timings it reports the two phase headlines
  * BASELINE.md measures for the reference (tests/test_performance.py):
  *  - `events_per_sec` — realtime CDC through the full durable
  *    `CdcPipeline.processBatch` path (from `cdc_e2e_replicate`);
  *  - `bulk_rows_per_sec` — initial replication through
  *    `Snapshot.runSharded` (shard predicates → conversion → versioned
  *    bucketed parquet) over the sf lineitem fixture;
  * and `recall` — recall@3 of every approximate ANN query vs the exact
  * brute-force top-k (the oracles prove the approximate plans are
  * computed exactly; this tracks how approximate they ARE).
  */
object Bench {

  private def median(xs: Seq[Double]): Double = {
    val ok = xs.filter(_ >= 0).sorted
    if (ok.isEmpty) -1.0
    else if (ok.size % 2 == 1) ok(ok.size / 2)
    else (ok(ok.size / 2 - 1) + ok(ok.size / 2)) / 2.0
  }

  /** Initial-replication throughput: lineitem (the biggest fixture
    * table) pushed through the real snapshot path — CRC32 shard
    * predicates, MySQL-shaped type conversion, versioned bucket+salt
    * parquet writes — into a throwaway warehouse dir. Also times the
    * FINAL-view read over the loaded table (the reference's third
    * observable phase: `SELECT ... FINAL`, the dedup-on-read path every
    * downstream query pays) → (rows, loadSec, finalReadSec). */
  private def bulkLoad(spark: SparkSession, sfDir: String,
                       shards: Int): (Long, Double, Double) = {
    import graft.ddl.SchemaRegistry
    import graft.sources.Snapshot
    val registry = new SchemaRegistry
    registry.applySql(
      """CREATE TABLE lineitem (
        |  l_orderkey bigint NOT NULL, l_partkey bigint, l_suppkey bigint,
        |  l_linenumber int NOT NULL, l_quantity double,
        |  l_extendedprice double, l_discount double, l_tax double,
        |  l_returnflag varchar(1), l_linestatus varchar(1),
        |  l_shipdate timestamp,
        |  PRIMARY KEY (l_orderkey, l_linenumber))""".stripMargin)
    val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val rows = src.count() // untimed: fixture metadata, not load work
    val wh = java.nio.file.Files.createTempDirectory("graft-bulk").toString
    val marks = java.nio.file.Files.createTempDirectory("graft-bulk-mk")
      .toString
    val pks = Seq("l_orderkey", "l_linenumber")
    // cleanup in finally: a failed run must not leak a half-written
    // warehouse into the (tmpfs-backed) scratch dir for the later runs
    def rm(p: java.io.File): Unit = {
      Option(p.listFiles).foreach(_.foreach(rm)); p.delete(); ()
    }
    try {
      val t0 = System.nanoTime()
      val t = Snapshot.runSharded(spark, registry("lineitem"), s"$wh/lineitem",
        marks, shards,
        k => if (shards == 1) src
             else src.filter(Snapshot.shardPredicate(pks, shards, k)))
      val sec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val finalRows = t.read.count() // FinalView dedup-on-read, not raw parquet
      val finalSec = (System.nanoTime() - t1) / 1e9
      // the synthetic fixture carries duplicate PKs by design, so FINAL
      // returns fewer rows than were loaded — the throughput denominator
      // is the rows SCANNED through the dedup (the work), not the output
      require(finalRows > 0 && finalRows <= rows,
        s"FINAL view implausible: $finalRows of $rows")
      (rows, sec, finalSec)
    } finally { rm(new java.io.File(wh)); rm(new java.io.File(marks)) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_RUNS", "5").toInt)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
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
      System.gc() // drop the warmup's shuffle/broadcast residue untimed
    }
    // the warmup populated the e2e stats from the TINY fixture — a timed
    // run that then fails must not report the warmup's events/s under
    // the big sf label
    graft.queries.CdcQueries.lastE2eStats = None

    // A failed run must NOT masquerade as a timing: it records -1 and the
    // query lands in "errors" (median is over the successful runs only,
    // so one flaky failure doesn't hide two good timings — but ANY
    // failure is reported).
    val e2eRuns =
      scala.collection.mutable.ArrayBuffer[graft.queries.CdcQueries.E2eStats]()
    val results: Seq[(String, Seq[Double])] = queries.toSeq.map {
      case (name, fn) =>
        val times = (0 until runs).map { _ =>
          graft.queries.CdcQueries.lastE2eStats = None
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: $e"); false
          }
          val elapsed = (System.nanoTime() - t0) / 1e9
          // operators persist shared intermediates; drop them between
          // runs so one run's cache residue can't distort the next.
          // Streaming queries leave memory-sink tables behind —
          // driver-heap residents that accumulate; drop those too.
          spark.catalog.clearCache()
          spark.catalog.listTables().collect()
            .filter(_.isTemporary)
            .foreach(t => spark.catalog.dropTempView(t.name))
          graft.queries.CdcQueries.lastE2eStats.foreach(e2eRuns += _)
          if (ok) elapsed else -1.0
        }
        // Untimed, between queries: shuffle files on the (tmpfs) scratch
        // dir are only deleted when the ContextCleaner sees their
        // dependencies collected — without a GC nudge a 32 GiB heap can
        // go the whole bench without one, and ~1500 runs of shuffle
        // residue squeeze the page cache the later queries need. The r7
        // full-surface run showed exactly that shape: conv_scalar_suite
        // 0.5→8.3 s monotone ACROSS its own runs in-sequence, flat at
        // ~0.4 s in isolation.
        System.gc()
        name -> times
    }

    // phase 2 headline: bulk load (initial replication), same medians.
    // Skipped under SPARK_GRAFT_ONLY (cheap local iteration must not pay
    // three snapshot loads), and a failed run records -1 like a failed
    // query — one red phase must not destroy the run's other results.
    val bulkTimes =
      if (only.nonEmpty) Seq.empty
      else (0 until runs).map { _ =>
        try bulkLoad(spark, sfDir, shards = 4)
        catch { case e: Throwable =>
          System.err.println(s"[bench] bulk load FAILED: $e"); (0L, -1.0, -1.0)
        }
      }
    val bulkRows = bulkTimes.collectFirst { case (r, _, _) if r > 0 => r }
      .getOrElse(0L)
    val bulkMed = median(bulkTimes.map(_._2))
    val bulkRate = if (bulkMed > 0 && bulkRows > 0) bulkRows / bulkMed else 0.0
    val finalMed = median(bulkTimes.map(_._3))
    val finalRate =
      if (finalMed > 0 && bulkRows > 0) bulkRows / finalMed else 0.0

    // ANN recall@3 vs the exact baseline — deterministic, computed once,
    // on both fixtures: the parquet embeddings (uniform random — the
    // degenerate worst case) and the clustered synthetic fixture (the
    // structure the methods are built for; where residual-code quality
    // is visible)
    val recall =
      if (only.nonEmpty) Map.empty[String, Double]
      else try graft.queries.SimilarityQueries.annRecall(spark, sfDir, k = 3)
      catch { case e: Throwable =>
        System.err.println(s"[bench] recall FAILED: $e"); Map.empty[String, Double]
      }
    val recallClustered =
      if (only.nonEmpty) Map.empty[String, Double]
      else try graft.queries.SimilarityQueries.annRecallOn(
        graft.queries.SimilarityQueries.clusteredEmbeddings(spark), k = 3)
      catch { case e: Throwable =>
        System.err.println(s"[bench] clustered recall FAILED: $e")
        Map.empty[String, Double]
      }
    spark.catalog.clearCache()

    // env-provided paths are spliced into the JSON — escape them like
    // every other string field or one quote in a path breaks the
    // round's whole performance artifact
    def esc(x: String): String =
      x.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    def fmtD(v: Double): String =
      if (!java.lang.Double.isFinite(v)) "-1"
      // Locale.ROOT: the default-locale format would emit "1,500000" on
      // comma-decimal JVMs and break every JSON consumer downstream
      else String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))
    val meds = results.map { case (k, v) => k -> median(v) }
    val qs = meds.map { case (k, v) => s"\"$k\":${fmtD(v)}" }
      .mkString("{", ",", "}")
    val stats = results.map { case (k, v) =>
      // min/max over SUCCESSFUL runs only — the -1 failure sentinel is
      // not a timing (median() already filters it); all-failed → -1
      val ok = v.filter(_ >= 0)
      val mn = if (ok.nonEmpty) ok.min else -1.0
      val mx = if (ok.nonEmpty) ok.max else -1.0
      s"\"$k\":{\"med\":${fmtD(median(v))},\"min\":${fmtD(mn)}," +
        s"\"max\":${fmtD(mx)},\"runs\":[${v.map(fmtD).mkString(",")}]}"
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v.exists(_ < 0) => s"\"$k\"" }
      .mkString("[", ",", "]")
    val total = meds.collect { case (_, v) if v >= 0 => v }.sum
    val recallJson = recall.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"$k\":${fmtD(v)}" }.mkString("{", ",", "}")
    val recallClJson = recallClustered.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"$k\":${fmtD(v)}" }.mkString("{", ",", "}")
    // realtime headline vs the reference's ~20k events/s claim: median
    // pipeline-time run of cdc_e2e_replicate (fixture synthesis split out)
    val e2e = e2eRuns.sortBy(_.pipelineSec).toSeq match {
      case Seq() => ""
      case rs =>
        // lower-middle run: the median element for odd run counts, and
        // for even counts the faster of the two middles — never the
        // slow outlier of a 2-run hiccup (rs.size / 2 picked that)
        val s = rs((rs.size - 1) / 2)
        s""","events_per_sec":${math.round(s.eventsPerSec)}""" +
          s""","e2e":{"events":${s.events},"fixture_sec":${fmtD(s.fixtureSec)},""" +
          s""""pipeline_sec":${fmtD(s.pipelineSec)},"runs":${rs.size}}"""
    }
    // summary fields LAST: a tail-truncated stdout capture keeps them
    val json =
      s"""{"queries":$qs,"query_stats":$stats,"errors":$errors,""" +
        s""""recall":$recallJson,"recall_clustered":$recallClJson,""" +
        s""""bulk":{"rows":$bulkRows,"med_sec":${fmtD(bulkMed)},""" +
        s""""runs":[${bulkTimes.map(t => fmtD(t._2)).mkString(",")}],""" +
        s""""final_read_med_sec":${fmtD(finalMed)},""" +
        s""""final_read_runs":[${bulkTimes.map(t => fmtD(t._3)).mkString(",")}]}""" +
        s"""$e2e,"bulk_rows_per_sec":${math.round(bulkRate)},""" +
        s""""final_rows_per_sec":${math.round(finalRate)},""" +
        s""""runs_per_query":$runs,"bench_file":"${esc(outPath)}",""" +
        s""""metric":"total","value":${fmtD(total)},"unit":"sec","sf":"${esc(sfDir)}"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    System.err.println(s"[bench] full JSON written to $outPath")
    println(json)
    spark.stop()
  }
}
