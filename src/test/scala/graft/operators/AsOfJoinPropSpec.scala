package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized differential test: AsOfJoin.backward vs a driver-side
  * naive reference (per left row, scan all right rows for the max
  * right-time ≤ left-time within the key). Seeded generation — a dozen
  * dense random datasets with heavy key/time collisions exercise the
  * tie and null paths far harder than the fixture does.
  */
class AsOfJoinPropSpec extends SparkSpec {
  import spark.implicits._

  private def naive(left: Seq[(Long, Long, Long)],
                    right: Seq[(Long, Long, Long)]): Set[(Long, Long, Long, Option[Long])] =
    left.map { case (k, t, lv) =>
      val m = right.filter(r => r._1 == k && r._2 <= t)
      // operator contract: ties on (key, time) break by highest tiebreak
      // (defaults to the time column) — mirror with max by (t, payload)
      val best = if (m.isEmpty) None
        else Some(m.maxBy(r => (r._2, r._3))._3)
      (k, t, lv, best)
    }.toSet

  test("backward as-of join matches the naive reference on random data") {
    val rnd = new scala.util.Random(20260812L)
    for (round <- 1 to 12) {
      val nKeys = 1 + rnd.nextInt(3)
      val left = Seq.fill(5 + rnd.nextInt(25))(
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(12).toLong, rnd.nextLong(1000)))
        // the left side must be unique rows for the set compare
        .distinct
      val right = Seq.fill(5 + rnd.nextInt(25))(
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(12).toLong, rnd.nextLong(1000)))
        // operator contract: right unique per (key, time) up to tiebreak;
        // keep one row per (key, time) to make the reference unambiguous
        .groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq
      val lDf = left.toDF("k", "t", "lv")
      val rDf = right.toDF("k", "t", "rv")
      val got = AsOfJoin.backward(lDf, rDf, Seq("k"), "t", "t")
        .select(col("k"), col("t"), col("lv"), col("asof.rv").as("rv"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSet
      assert(got === naive(left, right), s"round $round diverged " +
        s"(left=$left right=$right)")
    }
  }

  test("banded range join matches the naive reference on random data") {
    val rnd = new scala.util.Random(8130L)
    for (round <- 1 to 12) {
      val nKeys = 1 + rnd.nextInt(3)
      val lower = -(1 + rnd.nextInt(8)).toLong
      val upper = rnd.nextInt(8).toLong // lower < 0 <= upper
      val left = Seq.fill(5 + rnd.nextInt(25))(
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(40).toLong, rnd.nextLong(1000)))
        .distinct
      val right = Seq.fill(5 + rnd.nextInt(25))(
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(40).toLong, rnd.nextLong(1000)))
        .distinct
      val want = (for {
        (lk, lt, lv) <- left
        (rk, rt, rv) <- right
        if rk == lk && rt - lt >= lower && rt - lt <= upper
      } yield (lk, lt, lv, rt, rv)).toSet
      val got = RangeJoin.within(left.toDF("k", "t", "lv"),
          right.toDF("k", "t", "rv"), Seq("k"), "t", "t", lower, upper)
        .select(col("k"), col("t"), col("lv"),
          col("matched.t").as("rt"), col("matched.rv"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .toSet
      assert(got === want,
        s"round $round diverged (lower=$lower upper=$upper)")
    }
  }
}
