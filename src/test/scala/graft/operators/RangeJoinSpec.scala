package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("banded range join matches exact bounds, both inclusive") {
    val l = Seq((1L, 1000L, "p")).toDF("k", "t", "lv")
    val r = Seq((1L, 900L), (1L, 800L), (1L, 1000L), (1L, 799L), (1L, 1001L))
      .toDF("k", "t")
    // right.t - left.t ∈ [-200, 0]
    val out = RangeJoin.within(l, r, Seq("k"), "t", "t", -200L, 0L)
      .select(col("matched.t")).as[Long].collect().sorted
    assert(out === Seq(800L, 900L, 1000L))
  }

  test("no cross-key matches; window straddling a bucket boundary found") {
    val l = Seq((1L, 150L, "a"), (2L, 150L, "b")).toDF("k", "t", "lv")
    val r = Seq((1L, 100L), (2L, 60L)).toDF("k", "t")
    val out = RangeJoin.within(l, r, Seq("k"), "t", "t", -100L, -1L)
      .select(col("k"), col("matched.t")).as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 100L), (2L, 60L)))
  }

  test("randomized: banded join ≡ brute-force inequality join") {
    val rnd = new scala.util.Random(42)
    val left = Seq.fill(300)((rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong))
      .distinct.toDF("k", "t")
    val right = Seq.fill(300)((rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong))
      .distinct.toDF("k", "t")
    val (lo, hi) = (-537L, 211L)
    val banded = RangeJoin.within(left, right, Seq("k"), "t", "t", lo, hi)
      .select(col("k"), col("t"), col("matched.t").as("rt"))
      .as[(Long, Long, Long)].collect().toSet
    val brute = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") &&
          (col("r.t") - col("l.t")).between(lo, hi))
      .select(col("l.k"), col("l.t"), col("r.t"))
      .as[(Long, Long, Long)].collect().toSet
    assert(banded === brute)
  }

  test("randomized: as-of join ≡ brute-force max-at-or-before") {
    val rnd = new scala.util.Random(7)
    val left = Seq.fill(200)((rnd.nextInt(4).toLong, rnd.nextInt(5000).toLong))
      .distinct.map { case (k, t) => (k, t, s"l$k-$t") }
      .toDF("k", "t", "lv")
    val right = Seq.fill(200)((rnd.nextInt(4).toLong, rnd.nextInt(5000).toLong))
      .distinct.map { case (k, t) => (k, t, s"r$k-$t") }
      .toDF("k", "t", "rv")
    val asof = AsOfJoin.backward(left, right, Seq("k"), "t", "t")
      .select(col("k"), col("t"), col("asof.t").as("rt"))
      .as[(Long, Long, Option[Long])].collect().toSet
    val brute = left.as("l")
      .join(right.as("r"),
        col("l.k") === col("r.k") && col("r.t") <= col("l.t"), "left")
      .groupBy(col("l.k").as("k"), col("l.t").as("t"))
      .agg(max(col("r.t")).as("rt"))
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(asof === brute)
  }
}
