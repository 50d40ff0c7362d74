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

  test("mixSchedule: per-phase edges hold; phases draw independently") {
    val sched = Sampling.mixSchedule(docs(), "id", "src", col("toks"),
      phases = Seq(
        "p1" -> Map("a" -> 200L, "b" -> 4000L),
        "p2" -> Map("a" -> 200L, "c" -> 0L)))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val byPhase = sched.groupBy(_._1)
    // p1/b over budget → all 40 rows; p1/c unbudgeted → none
    val p1 = byPhase("p1").map(x => (x._2, x._3))
    assert(p1.count(_._2 == "b") === 40)
    assert(!p1.exists(_._2 == "c"))
    // p2/c zero budget → none
    assert(!byPhase("p2").exists(_._3 == "c"))
    // same source, same budget, different phase → a DIFFERENT subset
    // (the phase salt); both land near the 200-token target
    val a1 = p1.filter(_._2 == "a").map(_._1).toSet
    val a2 = byPhase("p2").filter(_._3 == "a").map(_._2).toSet
    assert(a1 !== a2, "phase salt did not decorrelate the draws")
    assert(a1.size >= 10 && a1.size <= 30 && a2.size >= 10 && a2.size <= 30)
    // deterministic under repartition
    val again = Sampling.mixSchedule(docs().repartition(7), "id", "src",
      col("toks"), phases = Seq(
        "p1" -> Map("a" -> 200L, "b" -> 4000L),
        "p2" -> Map("a" -> 200L, "c" -> 0L)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(again.toSet === sched.toSet)
  }

  test("mixSchedule: one corpus scan, no shuffle in the selection pass") {
    val out = Sampling.mixSchedule(docs(), "id", "src", col("toks"),
      phases = Seq("p1" -> Map("a" -> 200L), "p2" -> Map("b" -> 200L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"selection pass should be map-only, got:\n$plan")
  }
}
