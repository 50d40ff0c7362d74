package graft.tools

import scala.collection.mutable

/** Where does a warm query's wall go — how many jobs, how many tasks,
  * which stages? Runs each named query `runs` times WARM (state
  * retained, the bench's median regime) after one untimed build+run,
  * and prints per run: wall, #jobs, #stages, #tasks, task-time sum.
  * Then a per-stage breakdown (name prefix, tasks, ms) of the slowest
  * run. Guide §1/§7: attribute before changing.
  *
  * Usage: runMain graft.tools.JobProbe <sfDir> <names> [runs]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).toSeq
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)

    @volatile var jobs = 0
    val jobSpans = mutable.ArrayBuffer.empty[(Int, Long, Long)]
    val jobStart = mutable.Map.empty[Int, Long]
    val stageTasks = mutable.Map.empty[Int, (String, Int, Long)]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs += 1
        jobStart(e.jobId) = e.time
      }
      override def onJobEnd(
          e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobStart.remove(e.jobId).foreach(s =>
          jobSpans.synchronized { jobSpans += ((e.jobId, s, e.time)) })
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stageTasks(si.stageId) = (si.name.takeWhile(_ != '\n').take(60),
          si.numTasks, si.taskMetrics.executorRunTime)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      // untimed warm build (fits, memo, JIT)
      try qs(name)(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[jobprobe] $name warmup FAILED: $e") }
      (0 until runs).foreach { i =>
        Thread.sleep(150) // let listener events drain
        jobs = 0; stageTasks.clear(); jobSpans.clear()
        val w0 = System.currentTimeMillis()
        val t0 = System.nanoTime()
        // sample the main thread mid-run: the pre-job gap is driver work
        val main = Thread.currentThread()
        val sampler = new Thread(() => {
          (0 until 4).foreach { k =>
            Thread.sleep(150)
            val st = main.getStackTrace
            println(s"[jobprobe]   sample$k@${System.currentTimeMillis() - w0}ms " +
              st.take(14).mkString(" <- "))
          }
        })
        if (i == runs - 1) sampler.start()
        qs(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150)
        val nStages = stageTasks.size
        val nTasks = stageTasks.values.map(_._2).sum
        val taskMs = stageTasks.values.map(_._3).sum
        println(f"[jobprobe] $name run$i wall=$wall%.3f s jobs=$jobs " +
          f"stages=$nStages tasks=$nTasks taskTime=${taskMs}ms")
        val st = spark.sparkContext.getRDDStorageInfo
        val mem = st.map(_.memSize).sum >> 20
        val dsk = st.map(_.diskSize).sum >> 20
        val partial = st.count(r => r.numCachedPartitions < r.numPartitions)
        println(f"[jobprobe]   storage: ${st.length} rdds ${mem}MB mem " +
          f"${dsk}MB disk, $partial partially-cached")
        if (i == runs - 1) {
          stageTasks.toSeq.sortBy(-_._2._3).take(12)
            .foreach { case (id, (nm, nt, ms)) =>
              println(f"[jobprobe]   stage$id%5d tasks=$nt%4d ${ms}%6d ms  $nm")
            }
          // job timeline relative to run start: gaps = driver-side work
          jobSpans.sortBy(_._2).foreach { case (id, s, e) =>
            println(f"[jobprobe]   job$id%4d  +${s - w0}%5d .. +${e - w0}%5d ms")
          }
        }
        graft.GraftSession.dropTempViews(spark)
      }
    }
    spark.stop()
  }
}
