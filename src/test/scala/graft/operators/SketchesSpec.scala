package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HLL sketch: accuracy on both estimator branches, partition
  * invariance (the determinism the scaled-integer register sums buy),
  * and the standard-error contract at the default register count.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def estimate(n: Int, p: Int = 9, parts: Int = 5): Double = {
    val df = (0 until n).map(i => ("g", s"value-$i")).toDF("g", "v")
      .repartition(parts)
    Sketches.hllDistinct(df, Seq("g"), col("v"), p)
      .head().getDouble(1)
  }

  test("linear-counting branch: small cardinalities are near-exact") {
    // n ≪ m: most registers empty → the ln(m/V) correction applies and
    // is accurate to a few percent
    val est = estimate(100)
    assert(math.abs(est - 100) / 100.0 < 0.05, s"est=$est for n=100")
  }

  test("raw branch: large cardinalities within HLL standard error") {
    // n = 40000 ≫ 2.5m = 1280 forces the raw α·m²/Σ2^-M estimator;
    // σ = 1.04/√512 ≈ 4.6% — assert 3σ
    val est = estimate(40000)
    assert(est > 2.5 * 512, "expected the raw branch, got linear counting")
    assert(math.abs(est - 40000) / 40000.0 < 0.14, s"est=$est for n=40000")
  }

  test("estimate is invariant to partitioning and row order") {
    val a = estimate(5000, parts = 3)
    val b = estimate(5000, parts = 17)
    assert(a === b, s"partitioning changed the estimate: $a vs $b")
  }

  test("duplicates don't move the estimate") {
    val base = (0 until 1000).map(i => ("g", s"value-$i"))
    val dup = base ++ base ++ base
    val est1 = Sketches.hllDistinct(base.toDF("g", "v"), Seq("g"), col("v"))
      .head().getDouble(1)
    val est3 = Sketches.hllDistinct(dup.toDF("g", "v"), Seq("g"), col("v"))
      .head().getDouble(1)
    assert(est1 === est3, s"duplicates moved the estimate: $est1 vs $est3")
  }

  test("groups estimate independently") {
    val df = ((0 until 2000).map(i => ("big", s"v$i")) ++
      (0 until 50).map(i => ("small", s"v$i"))).toDF("g", "v")
    val out = Sketches.hllDistinct(df, Seq("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("big") - 2000) / 2000.0 < 0.14, s"big=${out("big")}")
    assert(math.abs(out("small") - 50) / 50.0 < 0.1, s"small=${out("small")}")
  }

  test("cms never underestimates; overestimate stays inside the ε bound") {
    // skewed multiset: key-j appears 3·(j+1) times, N = 15150
    val rows = (0 until 100).flatMap(j => Seq.fill(3 * (j + 1))(s"key-$j"))
    val df = rows.toDF("v").repartition(7)
    val counters = Sketches.cmsCounters(df, col("v"))
    val exact = df.groupBy("v").agg(count(lit(1)).as("n"))
    val out = Sketches.cmsEstimate(counters, exact, col("v")).collect()
    assert(out.length === 100)
    out.foreach { r =>
      val (n, est) = (r.getLong(1), r.getLong(2))
      assert(est >= n, s"${r.getString(0)}: CMS underestimated $est < $n")
      // ε ≈ e/width ≈ 0.27% of N=15150 per row; depth-4 min keeps the
      // realized error well inside 1% of N
      assert(est - n <= 152, s"${r.getString(0)}: over by ${est - n}")
    }
  }

  test("cms counters merge by addition") {
    val a = (0 until 500).map(i => s"k${i % 37}").toDF("v")
    val b = (0 until 700).map(i => s"k${i % 53}").toDF("v")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = toMap(Sketches.cmsCounters(a.union(b), col("v")))
    val parts = toMap(
      Sketches.cmsCounters(a, col("v"))
        .union(Sketches.cmsCounters(b, col("v")))
        .groupBy("_cms_row", "_cms_bucket")
        .agg(sum("_cms_count").as("_cms_count")))
    assert(whole === parts, "union-then-sketch != sketch-then-add")
  }

  test("bloom: no false negatives, false positives inside the load bound") {
    val ref = (0 until 2000).map(i => s"member-$i").toDF("v")
    val set = Sketches.bloomSet(ref, col("v"))
    val members = (0 until 2000).map(i => s"member-$i")
    val nonMembers = (0 until 2000).map(i => s"other-$i")
    val out = Sketches.bloomMightContain(
      set, (members ++ nonMembers).toDF("v"), col("v")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    members.foreach(m => assert(out(m), s"false negative on $m"))
    // n=2000, k=3, bits=65536 → fp ≈ (1−e^(−kn/bits))^k ≈ 0.07%,
    // expectation ~1.3 of 2000 — 20 is a >10× cushion
    val fps = nonMembers.count(out(_))
    assert(fps <= 20, s"$fps false positives out of 2000")
  }

  test("bloom set size is bounded by k·bits, not the reference size") {
    val ref = (0 until 5000).map(i => s"x-$i").toDF("v")
    val n = Sketches.bloomSet(ref, col("v"), k = 2, bits = 256).count()
    assert(n <= 2 * 256, s"bloom relation grew past k·bits: $n")
  }

  test("p outside [4,14] is rejected") {
    val df = Seq(("g", "v")).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Sketches.hllDistinct(df, Seq("g"), col("v"), p = 3)
    }
    intercept[IllegalArgumentException] {
      Sketches.hllDistinct(df, Seq("g"), col("v"), p = 15)
    }
  }
}
