package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit coverage for the backward as-of join on constructed inputs (the
  * fixture-scale behavior is covered by the oracle gate's
  * q_asof_purchase_click vs DuckDB ASOF LEFT JOIN).
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(left: Seq[(Long, Long, String)],
                  right: Seq[(Long, Long, String)]) = {
    val l = left.toDF("k", "t", "lv")
    val r = right.toDF("k", "t", "rv")
    AsOfJoin.backward(l, r, Seq("k"), "t", "t").collect()
      .map(row => (row.getLong(0), row.getLong(1),
        Option(row.getStruct(3)).map(_.getString(1)).orNull))
      .sortBy(x => (x._1, x._2))
  }

  test("picks the most recent right row at or before each left time") {
    val out = run(
      left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (1L, 5L, "c")),
      right = Seq((1L, 8L, "r8"), (1L, 20L, "r20"), (1L, 30L, "r30")))
    assert(out === Seq((1L, 5L, null), (1L, 10L, "r8"), (1L, 25L, "r20")))
  }

  test("equal timestamps are inclusive (l.t >= r.t)") {
    val out = run(
      left = Seq((1L, 10L, "a")),
      right = Seq((1L, 10L, "req"), (1L, 9L, "r9")))
    assert(out === Seq((1L, 10L, "req")))
  }

  test("keys never match across groups; missing groups yield null") {
    val out = run(
      left = Seq((1L, 10L, "a"), (2L, 10L, "b")),
      right = Seq((1L, 5L, "r1")))
    assert(out === Seq((1L, 10L, "r1"), (2L, 10L, null)))
  }

  test("plans as one shuffle + window — no join node, no cartesian") {
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "lv")
    val r = Seq((1L, 5L, "r")).toDF("k", "t", "rv")
    val plan = AsOfJoin.backward(l, r, Seq("k"), "t", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join node:\n$plan")
    assert(plan.contains("Window"), "missing window node")
  }
}
