package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized crash-replay fuzz for the staged, shard-resumable
  * snapshot: a driver that dies at arbitrary shards across arbitrary
  * restart attempts must (a) never expose a partial table to readers at
  * ANY point, (b) converge to the exact source content, and (c) never
  * re-read a completed shard. Seeded, so failures replay.
  */
class SnapshotCrashFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("random crash schedules: reader sees empty-until-complete, exactly-once shards") {
    val rnd = new scala.util.Random(0x6ea57L)
    (1 to 4).foreach { round =>
      val n = 50 + rnd.nextInt(150)
      val shards = 2 + rnd.nextInt(4)
      val rows = (1 to n).map(i => (i.toLong, s"v$i"))
      val df = rows.toDF("id", "v")
      val schema = graft.ddl.DdlParser.parse(
        "CREATE TABLE s (id bigint NOT NULL, v varchar(20), PRIMARY KEY(id))")
        .asInstanceOf[graft.ddl.DdlOp.CreateTable].schema
      val dir = tmpDir(s"graft-fuzz-snap-$round")
      val markers = tmpDir(s"graft-fuzz-mk-$round")
      val reader = graft.operators.GraftTable(spark, dir,
        schema.primaryKeys, schema.toStructType)
      val reads = scala.collection.mutable.Set.empty[Int]
      var attempt = 0
      var done = false
      while (!done) {
        attempt += 1
        assert(attempt <= shards + 5, "crash schedule failed to converge")
        // each attempt may die at one random not-yet-done shard (the
        // last attempt runs clean so the fuzz terminates)
        val dieAt = if (attempt > shards) -1
                    else if (rnd.nextBoolean()) rnd.nextInt(shards) else -1
        def src(k: Int) = {
          // the mid-load reader must never see a partial table
          assert(reader.read.count() === 0L,
            s"round $round attempt $attempt: reader saw a partial table")
          assert(!reads.contains(k),
            s"round $round: completed shard $k was re-read")
          if (k == dieAt) throw new RuntimeException("simulated crash")
          reads += k
          df.filter(Snapshot.shardPredicate(Seq("id"), shards, k))
        }
        try {
          Snapshot.runSharded(spark, schema, dir, markers, shards, src)
          done = true
        } catch { case e: RuntimeException
            if e.getMessage == "simulated crash" => () }
      }
      assert(reader.read.collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet === rows.toSet,
        s"round $round: published table != source")
      assert(reader.log.count() === n.toLong,
        s"round $round: duplicate shard images in the log")
    }
  }
}
