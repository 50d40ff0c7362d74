package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Filter-funnel waterfall audit: first-fail charging, zero-drop stage
  * visibility, and the funnel identities (n_in chains, drops + survivors
  * partition the corpus).
  */
class FilterFunnelSpec extends SparkSpec {
  import spark.implicits._

  private case class Row(stageIdx: Int, stage: String, nIn: Long,
                         nDropped: Long, nOut: Long, dropFrac: Double,
                         wDropped: Long, cumSurvival: Double)

  private def run(docs: org.apache.spark.sql.DataFrame,
                  rules: Seq[(String, org.apache.spark.sql.Column)]) =
    TextAnalysis.filterFunnel(docs,
        size(TextAnalysis.tokens(coalesce(col("text"), lit("")))), rules)
      .as[(Int, String, Long, Long, Long, Double, Long, Double)]
      .collect().map(Row.tupled).toSeq

  // 6 docs: two fail rule A (short), one fails BOTH A and B (charged to
  // A only — waterfall), one fails only B, two keep. Rule Z never fires.
  private val docs = Seq(
    (1L, "a b"),                      // 2 words: fails A
    (2L, "x"),                        // 1 word: fails A; also fails B
    (3L, "one two three four"),       // 4 words, no 'the': fails B
    (4L, "the quick brown fox here"), // keeps
    (5L, "the lazy dog sat down"),    // keeps
    (6L, null.asInstanceOf[String])   // null text → 0-char, fails A
  ).toDF("doc_id", "text")

  private def rules = {
    val t = TextAnalysis.tokens(coalesce(col("text"), lit("")))
    Seq(
      "min_words" -> (size(t) >= 3),
      "has_the" -> array_contains(t, "the"),
      "max_words" -> (size(t) <= 1000))
  }

  test("first failing rule is charged; later failures are not") {
    val out = run(docs, rules)
    assert(out.map(r => (r.stage, r.nDropped)) == Seq(
      ("min_words", 3L),   // docs 1, 2, 6 (doc 2 NOT double-charged)
      ("has_the", 1L),     // doc 3 only
      ("max_words", 0L)))  // zero-drop stage still reports
  }

  test("funnel identities: n_in chains, drops+survivors=total") {
    val out = run(docs, rules)
    assert(out.head.nIn == 6L)
    out.sliding(2).foreach { case Seq(a, b) =>
      assert(a.nOut == b.nIn, s"${a.stage}→${b.stage} n_in chain broke")
    }
    assert(out.map(_.nDropped).sum + out.last.nOut == 6L)
    assert(out.last.nOut == 2L)
    assert(out.last.cumSurvival == math.rint(2.0 / 6.0 * 1e6) / 1e6)
  }

  test("weight_dropped sums the charged docs' weights") {
    val out = run(docs, rules)
    // min_words drops "a b"(2) + "x"(1) + null→""(1) = 4 words
    assert(out.find(_.stage == "min_words").get.wDropped == 4L)
    assert(out.find(_.stage == "has_the").get.wDropped == 4L)
    assert(out.find(_.stage == "max_words").get.wDropped == 0L)
  }

  test("drop_frac is relative to the stage's entering count") {
    val out = run(docs, rules)
    assert(out.head.dropFrac == math.rint(3.0 / 6.0 * 1e6) / 1e6)
    assert(out(1).dropFrac == math.rint(1.0 / 3.0 * 1e6) / 1e6)
    assert(out(2).dropFrac == 0.0)
  }

  test("all docs dropped → downstream stages see n_in=0, frac 0") {
    val all = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val out = run(all, rules)
    assert(out.head.nDropped == 2L && out.head.nOut == 0L)
    assert(out(1).nIn == 0L && out(1).dropFrac == 0.0)
    assert(out.last.cumSurvival == 0.0)
  }

  test("reserved and duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      TextAnalysis.filterFunnel(docs, lit(1),
        Seq("kept" -> lit(true)))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.filterFunnel(docs, lit(1),
        Seq("r" -> lit(true), "r" -> lit(false)))
    }
  }
}
