package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val stop = graft.operators.TextAnalysis.langProfiles.head._2
  private val fixture = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$fixture/documents.parquet")

  test("distilled fit recovers the heuristic gate (accuracy floor)") {
    val label =
      (TextAnalysis.qualityScore(col("text"), stop) >= 0.5).cast("int")
    val m = QualityClassifier.fit(docs, col("text"), label, stop)
    val lg = QualityClassifier.logit(
      m, QualityClassifier.features(col("text"), stop).map(_._2))
    val scored = docs.select(label.as("y"), (lg > 0.0).as("pred"))
    val n = scored.count().toDouble
    val correct =
      scored.filter(col("pred") === (col("y") === 1)).count().toDouble
    // the teacher rule is (x0+x1+x2)/3 >= 0.5 — linear in the features,
    // so IRLS must recover it well above the ~0.72 base rate
    assert(correct / n >= 0.90, s"train accuracy ${correct / n}")
    // the band features carry the rule's signal; their weights must be
    // positive for the model to mean what it claims
    val byName = m.featureNames.zip(m.weights).toMap
    assert(byName("f_len") > 0.0 && byName("f_stop") > 0.0, m.toString)
  }

  test("zero iterations is the null model") {
    val m = QualityClassifier.fit(docs, col("text"), lit(1), stop, iters = 0)
    assert(m.bias == 0.0 && m.weights.forall(_ == 0.0))
  }

  test("IRLS matches a local reference implementation") {
    // tiny separable-ish dataset, one partition so the aggregation's
    // fold order is fixed; tolerance absorbs residual FP reordering
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val good = i % 3 != 0
      val words =
        if (good) Seq("the", "a", "of", "and") ++ Seq.fill(60)(s"w$i")
        else Seq.fill(8)(s"w$i")
      (i.toLong, words.mkString(" "), if (good) 1 else 0)
    }
    val df = rows.toDF("doc_id", "text", "y").repartition(1)
    val m = QualityClassifier.fit(df, col("text"), col("y"), stop,
      iters = 4)

    // local twin: same features, same ridge-damped Newton steps
    val feats = rows.map { case (_, text, y) =>
      val tk = text.split(" ", -1)
      val dt = tk.distinct
      val x = Array(1.0,
        math.min(tk.length / 64.0, 1.0),
        dt.length.toDouble / tk.length,
        math.min(dt.count(stop.contains) / 4.0, 1.0),
        (text.length - tk.length + 1).toDouble / tk.length)
      (x, y.toDouble)
    }
    val d = 5
    val n = feats.size.toDouble
    val ridge = 1e-3
    val w = Array.fill(d)(0.0)
    for (_ <- 0 until 4) {
      val g = Array.fill(d)(0.0)
      val h = Array.ofDim[Double](d, d)
      feats.foreach { case (x, y) =>
        val z0 = (0 until d).map(j => x(j) * w(j)).sum
        val z = math.max(-30.0, math.min(30.0, z0))
        val p = 1.0 / (1.0 + math.exp(-z))
        val s = p * (1.0 - p)
        for (j <- 0 until d) {
          g(j) += (y - p) * x(j)
          for (k <- j until d) h(j)(k) += s * x(j) * x(k)
        }
      }
      for (j <- 0 until d) {
        for (k <- 0 until j) h(j)(k) = h(k)(j)
        h(j)(j) += ridge * n
        g(j) -= ridge * n * w(j)
      }
      // gaussian elimination, mirroring the operator's solver
      val a = h.map(_.clone()); val b = g.clone()
      for (i <- 0 until d) {
        val p = (i until d).maxBy(r => math.abs(a(r)(i)))
        val t = a(i); a(i) = a(p); a(p) = t
        val tb = b(i); b(i) = b(p); b(p) = tb
        for (r <- i + 1 until d) {
          val f = a(r)(i) / a(i)(i)
          for (c <- i until d) a(r)(c) -= f * a(i)(c)
          b(r) -= f * b(i)
        }
      }
      val x = new Array[Double](d)
      for (i <- d - 1 to 0 by -1) {
        var acc = b(i)
        for (c <- i + 1 until d) acc -= a(i)(c) * x(c)
        x(i) = acc / a(i)(i)
      }
      for (j <- 0 until d) w(j) += x(j)
    }
    assert(math.abs(m.bias - w(0)) < 1e-6, s"bias ${m.bias} vs ${w(0)}")
    m.weights.zipWithIndex.foreach { case (wj, j) =>
      assert(math.abs(wj - w(j + 1)) < 1e-6, s"w$j $wj vs ${w(j + 1)}")
    }
  }

  test("fitOn learns from hashed features above the base rate") {
    val hashed = TextAnalysis.featureHash(docs, "doc_id", "text", dim = 8)
    val labeled = docs.select(col("doc_id"),
      (TextAnalysis.qualityScore(col("text"), stop) >= 0.5)
        .cast("int").as("y"))
      .join(hashed, Seq("doc_id"))
    val feats = (0 until 8).map(j => s"h$j" -> col(s"f$j").cast("double"))
    val m = QualityClassifier.fitOn(labeled, feats, col("y"))
    val lg = QualityClassifier.logit(m, feats.map(_._2))
    val scored = labeled.select(col("y"), (lg > 0.0).as("pred"))
    val n = scored.count().toDouble
    val acc = scored.filter(col("pred") === (col("y") === 1)).count() / n
    val base = math.max(labeled.filter(col("y") === 1).count() / n,
      1.0 - labeled.filter(col("y") === 1).count() / n)
    assert(acc > base + 0.05, s"acc $acc vs base $base")
  }

  test("fit is bit-identical across partition layouts (memoFit contract)") {
    // the gradient/Hessian sums aggregate fixed-decimal contributions,
    // so partition count / row order cannot perturb the fitted weights
    // — the property memoFit's pure-function contract relies on
    val label =
      (TextAnalysis.qualityScore(col("text"), stop) >= 0.5).cast("int")
    val m1 = QualityClassifier.fit(
      docs.repartition(1), col("text"), label, stop, iters = 4)
    val m7 = QualityClassifier.fit(
      docs.repartition(7, col("doc_id")), col("text"), label, stop,
      iters = 4)
    assert(m1.bias == m7.bias, s"${m1.bias} vs ${m7.bias}")
    assert(m1.weights == m7.weights, s"${m1.weights} vs ${m7.weights}")
  }

  test("fit on zero usable rows returns the null model") {
    val empty = Seq.empty[(Long, String, Int)].toDF("doc_id", "text", "y")
    val m = QualityClassifier.fit(empty, col("text"), col("y"), stop)
    assert(m.bias == 0.0 && m.weights == Seq(0.0, 0.0, 0.0, 0.0))
    val allNull = Seq((1L, null.asInstanceOf[String], 1))
      .toDF("doc_id", "text", "y")
    val m2 = QualityClassifier.fit(allNull, col("text"), col("y"), stop)
    assert(m2.bias == 0.0 && m2.weights.forall(_ == 0.0))
  }

  test("null text rows are dropped from the fit and score to null") {
    val df = Seq((1L, "the a of and it is for on the a", 1),
      (2L, null.asInstanceOf[String], 0)).toDF("doc_id", "text", "y")
    val m = QualityClassifier.fit(df, col("text"), col("y"), stop,
      iters = 2)
    assert(m.weights.exists(_ != 0.0))
    val lg = QualityClassifier.logit(
      m, QualityClassifier.features(col("text"), stop).map(_._2))
    val out = df.select(col("doc_id"), lg.as("logit"))
      .orderBy("doc_id").collect()
    assert(!out(0).isNullAt(1) && out(1).isNullAt(1))
  }

  test("large features fit in range; absurd ones fail loudly, not silently") {
    // features ~2e7 used to overflow the per-row decimal(26,12) cast to
    // NULL, which sum() silently skipped — the Newton step then fit a
    // biased model with no error. decimal(38,12) takes them in stride.
    val big = Seq((1L, 2.0e7, 1), (2L, 1.9e7, 1), (3L, 0.5, 0),
      (4L, 0.7, 0)).toDF("id", "f", "y")
    val m = QualityClassifier.fitOn(big, Seq("f" -> col("f")), col("y"),
      iters = 3)
    assert(m.weights.head != 0.0 && !m.weights.head.isNaN)
    // beyond decimal(38,12)'s envelope the fit must throw, not bias
    val absurd = Seq((1L, 1.0e30, 1), (2L, 0.5, 0)).toDF("id", "f", "y")
    val ex = intercept[IllegalStateException] {
      QualityClassifier.fitOn(absurd, Seq("f" -> col("f")), col("y"),
        iters = 1)
    }
    assert(ex.getMessage.contains("overflowed"))
  }
}
