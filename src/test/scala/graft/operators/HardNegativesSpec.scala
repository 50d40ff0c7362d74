package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hard-negative mining: label exclusion, null-label semantics, and a
  * differential check against brute force restricted to the probed
  * cells. */
class HardNegativesSpec extends SparkSpec {

  import spark.implicits._

  private def fixture = {
    val rnd = new scala.util.Random(11)
    (0L until 300L).map { i =>
      val label: Integer = if (i % 50 == 49) null else (i % 3).toInt
      (i, Seq.fill(16)((rnd.nextDouble() * 2 - 1).toFloat), label)
    }.toDF("vec_id", "embedding", "label")
  }

  test("every mined negative carries a different, non-null label") {
    val df = fixture
    val model = Ivf.fit(df, "vec_id", "embedding", k = 4, iters = 2)
    val mined = Ivf.hardNegatives(df.filter(col("vec_id") < 10), df,
      "vec_id", "embedding", "label", model, k = 5, nProbe = 2)
    assert(mined.count() > 0)
    assert(mined.filter(col("n_label").isNull ||
      col("n_label") === col("q_label")).count() === 0L)
    // ranks are dense 1..k per query
    val badRanks = mined.groupBy("query_id")
      .agg(max("rnk").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(badRanks === 0L)
  }

  test("matches brute force restricted to the probed cells' candidates") {
    val df = fixture
    val model = Ivf.fit(df, "vec_id", "embedding", k = 4, iters = 2)
    val q = df.filter(col("vec_id") < 10)
    val mined = Ivf.hardNegatives(q, df, "vec_id", "embedding", "label",
      model, k = 3, nProbe = 4)
    // nProbe = k probes EVERY cell, so the candidate set is the whole
    // corpus and the result must equal exact brute force over
    // label-mismatched pairs
    val exactPairs = Similarity.bruteForceTopK(q, df, "vec_id",
      "embedding", k = 300)
    val qLabels = q.select(col("vec_id").as("query_id"),
      col("label").as("q_label"))
    val cLabels = df.select(col("vec_id").as("neighbor_id"),
      col("label").as("n_label"))
    val expected = exactPairs.join(qLabels, "query_id")
      .join(cLabels, "neighbor_id")
      .filter(col("n_label") =!= col("q_label"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc_nulls_last,
        col("neighbor_id"))
    val expTop = expected
      .withColumn("rnk2", row_number().over(w)).filter(col("rnk2") <= 3)
      .select("query_id", "neighbor_id", "sim")
    val got = mined.select("query_id", "neighbor_id", "sim")
    assert(got.exceptAll(expTop).count() === 0L)
    assert(expTop.exceptAll(got).count() === 0L)
  }

  test("a null-label query mines nothing (it has no verifiable negatives)") {
    val df = fixture
    val model = Ivf.fit(df, "vec_id", "embedding", k = 4, iters = 2)
    val mined = Ivf.hardNegatives(df.filter(col("vec_id") === 49L), df,
      "vec_id", "embedding", "label", model, k = 5, nProbe = 4)
    assert(mined.count() === 0L)
  }
}
