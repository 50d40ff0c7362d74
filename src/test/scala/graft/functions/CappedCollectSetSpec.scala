package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property: for ANY input, the capped aggregate equals plain
  * `collect_set` post-filtered by size — except it never materializes an
  * over-cap buffer. Saturation must be order-independent (a group
  * saturates iff its distinct count exceeds the cap, regardless of
  * partitioning or merge order).
  */
class CappedCollectSetSpec extends SparkSpec {
  import spark.implicits._

  test("capped collect_set == collect_set + size filter, random datasets") {
    val rnd = new scala.util.Random(20260812L)
    val cap = 3
    (1 to 6).foreach { round =>
      // keys/values in a narrow range so groups regularly cross the cap
      val rows = List.fill(20 + rnd.nextInt(300))(
        (rnd.nextInt(5), rnd.nextInt(8).toLong))
      val df = rows.toDF("k", "v")
        .repartition(1 + rnd.nextInt(6)) // vary partial/merge shapes
      val got = df.groupBy("k")
        .agg(call_function("graft_capped_collect_set", col("v"), lit(cap))
          .as("ids"))
        .filter(col("ids").isNotNull && size(col("ids")) >= 2)
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      val want = df.groupBy("k")
        .agg(sort_array(collect_set(col("v"))).as("ids"))
        .filter(size(col("ids")).between(2, cap))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      assert(got === want, s"round $round diverged (rows=${rows.size})")
    }
  }

  test("strings sort and saturate identically to collect_set") {
    val df = Seq(
      ("a", "x"), ("a", "y"), ("a", "z"), ("a", "w"),        // df 4 > cap
      ("b", "m"), ("b", "n"),                                 // df 2 kept
      ("c", "q"),                                             // df 1 dropped
      ("d", "r"), ("d", "r"), ("d", "s")                      // dup values
    ).toDF("k", "v").repartition(3)
    val got = df.groupBy("k")
      .agg(call_function("graft_capped_collect_set", col("v"), lit(3))
        .as("ids"))
      .filter(col("ids").isNotNull && size(col("ids")) >= 2)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got === Map("b" -> Seq("m", "n"), "d" -> Seq("r", "s")))
  }
}
