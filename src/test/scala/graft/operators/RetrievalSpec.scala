package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def list(rows: (Long, Long, Int)*) =
    rows.toDF("query_id", "neighbor_id", "rnk")

  test("shared candidates sum both reciprocal terms") {
    val lex = list((1L, 10L, 1), (1L, 11L, 2))
    val dense = list((1L, 10L, 2), (1L, 12L, 1))
    val out = Retrieval.rrfFuse(lex, dense, kConst = 60, topK = 5)
      .select("neighbor_id", "rrf")
      .as[(Long, Double)].collect().toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(10L) == r6(1.0 / 61 + 1.0 / 62)) // in both lists
    assert(out(11L) == r6(1.0 / 62))            // lexical only
    assert(out(12L) == r6(1.0 / 61))            // dense only
  }

  test("a query present in only one tower still ranks") {
    val lex = list((1L, 10L, 1))
    val dense = list((2L, 20L, 1))
    val out = Retrieval.rrfFuse(lex, dense)
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 10L, 1), (2L, 20L, 1)))
  }

  test("ties break on neighbor id; topK truncates") {
    val lex = list((1L, 10L, 1), (1L, 11L, 1), (1L, 12L, 2))
    val dense = Seq.empty[(Long, Long, Int)]
      .toDF("query_id", "neighbor_id", "rnk")
    val out = Retrieval.rrfFuse(lex, dense, topK = 2)
      .orderBy("rnk")
      .select("neighbor_id").as[Long].collect().toSeq
    assert(out == Seq(10L, 11L))
  }
}
