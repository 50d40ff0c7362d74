package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Token-budget sampling: derived keep-fractions actually land near the
  * budget, over-budget sources keep everything, unbudgeted sources keep
  * nothing, and the kept set is deterministic. */
class SamplingBudgetSpec extends SparkSpec {
  import spark.implicits._

  // 40 docs per source, 10 tokens each → 400 tokens per source
  private def docs() = (for {
    s <- Seq("a", "b", "c")
    i <- 1 to 40
  } yield (s.hashCode.toLong * 100 + i, s, 10)).toDF("id", "src", "toks")

  test("budgets met approximately; edge cases exact") {
    val kept = Sampling.tokenBudgetSample(docs(), "id", "src", col("toks"),
      budgets = Map("a" -> 200L, "b" -> 4000L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // a: half the tokens requested — hash uniformity lands near 200
    assert(bySrc.getOrElse("a", 0) >= 100 && bySrc("a") <= 300,
      s"src a kept ${bySrc.get("a")} tokens for a 200 budget")
    // b: budget exceeds the total → keeps every row (the w>=1 'g' cut)
    assert(bySrc.get("b").contains(400))
    // c: no budget → nothing
    assert(!bySrc.contains("c"))
    // deterministic: same inputs, same kept set
    val again = Sampling.tokenBudgetSample(docs().repartition(5), "id",
      "src", col("toks"), budgets = Map("a" -> 200L, "b" -> 4000L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(again.toSet === kept.toSet)
  }

  test("raising a budget only grows the kept set (monotone mixtures)") {
    def keptIds(budget: Long): Set[Long] =
      Sampling.tokenBudgetSample(docs(), "id", "src", col("toks"),
        budgets = Map("a" -> budget)).collect().map(_.getLong(0)).toSet
    val low = keptIds(100L)
    val high = keptIds(250L)
    assert(low.subsetOf(high),
      s"budget raise dropped ids: ${low -- high}")
    assert(high.size > low.size) // and actually admitted more
  }
}
