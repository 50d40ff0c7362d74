package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KeepBestSpec extends SparkSpec {
  import spark.implicits._

  // hand-built pair graph: {1,2,3} one cluster, {10,11} another,
  // 20 isolated
  private val docs = Seq(
    (1L, 0.5), (2L, 0.9), (3L, 0.9), (10L, 0.2), (11L, 0.1), (20L, 0.7)
  ).toDF("doc_id", "q")
  private val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    .toDF("id_a", "id_b")

  test("keeps the max-score member, ties to the smaller id") {
    val out = Dedup.keepBest(docs, "doc_id", pairs, col("q"))
      .as[(Long, Long, Double, Long)].collect().sortBy(_._2)
    assert(out.toSeq == Seq(
      (2L, 1L, 0.9, 3L),   // 2 and 3 tie at 0.9 → smaller id wins
      (10L, 10L, 0.2, 2L),
      (20L, 20L, 0.7, 1L)))
  }

  test("survivor count = clusters + isolated docs") {
    val n = Dedup.keepBest(docs, "doc_id", pairs, col("q")).count()
    assert(n == 3)
  }
}
