package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized differential test for THE core semantic — the FINAL view
  * (latest version per key, tombstones dropped, delete beats insert at
  * an equal version): a dozen seeded dense logs with version collisions
  * and insert+delete ties per key, against a driver-side reference.
  * Payload is a pure function of (key, version, delete) so duplicate
  * events are harmless rather than a nondeterminism trap.
  */
class FinalViewFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("finalView matches the naive reference on random versioned logs") {
    val rnd = new scala.util.Random(55667788L)
    for (round <- 1 to 12) {
      val rows = Seq.fill(30 + rnd.nextInt(60)) {
        val k = rnd.nextInt(6).toLong
        val v = rnd.nextInt(7).toLong
        val del = rnd.nextBoolean()
        (k, v, del, k * 1000 + v * 10 + (if (del) 1 else 0))
      }
      val want = rows.groupBy(_._1).flatMap { case (k, evs) =>
        val best = evs.maxBy(e => (e._2, e._3)) // delete wins a version tie
        if (best._3) None else Some((k, best._4))
      }.toSet
      val got = FinalView.finalView(
          rows.toDF("k", "v", "del", "payload"), Seq("k"),
          version = struct(col("v"), col("del")), isDelete = col("del"))
        .select("k", "payload").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, s"round $round diverged")
    }
  }
}
