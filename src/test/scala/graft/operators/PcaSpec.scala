package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Math + determinism coverage for [[Pca]]; fixture-scale equality is
  * covered by the `s_pca_project` oracle gate. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def planted(n: Int, seed: Long = 7L) = {
    // anisotropic Gaussian: sd 3 along u=(1,1,0,0)/√2, sd 1 along
    // v=(1,-1,0,0)/√2, sd 0.1 on the last two axes, mean (5, -2, 1, 0)
    val rnd = new scala.util.Random(seed)
    val s2 = math.sqrt(2.0)
    (0 until n).map { i =>
      val a = rnd.nextGaussian() * 3.0
      val b = rnd.nextGaussian() * 1.0
      val c = rnd.nextGaussian() * 0.1
      val d = rnd.nextGaussian() * 0.1
      (i.toLong, Seq(5.0 + a / s2 + b / s2, -2.0 + a / s2 - b / s2,
        1.0 + c, 0.0 + d).map(_.toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("jacobiEig recovers a known spectrum") {
    // A = diag(4, 1) rotated by 30°: eigenvalues exactly {4, 1}
    val th = math.Pi / 6
    val (c, s) = (math.cos(th), math.sin(th))
    val a = Array(
      Array(4 * c * c + 1 * s * s, (4 - 1) * c * s),
      Array((4 - 1) * c * s, 4 * s * s + 1 * c * c))
    val (eig, v) = Pca.jacobiEig(a)
    assert(eig.sorted.zip(Seq(1.0, 4.0)).forall {
      case (x, y) => math.abs(x - y) < 1e-10 })
    // eigenvector columns orthonormal
    val dot01 = v(0)(0) * v(0)(1) + v(1)(0) * v(1)(1)
    assert(math.abs(dot01) < 1e-10)
  }

  test("fit: orthonormal axes, descending eigenvalues, planted geometry") {
    val m = Pca.fit(planted(2000), "vec_id", "embedding", p = 4)
    assert(m.q === 4 && m.d === 4)
    // descending, nonnegative
    assert(m.eigenvalues === m.eigenvalues.sortBy(-_))
    assert(m.eigenvalues.forall(_ >= 0.0))
    // planted variances 9, 1, 0.01, 0.01 (sampling tolerance)
    assert(math.abs(m.eigenvalues(0) - 9.0) < 1.0, m.eigenvalues.toString)
    assert(math.abs(m.eigenvalues(1) - 1.0) < 0.2)
    // orthonormal rows
    for (i <- 0 until 4; j <- i until 4) {
      val d = m.components(i).zip(m.components(j)).map(t => t._1 * t._2).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-4, s"e${i}.e$j = $d")
    }
    // pc1 aligns with the planted dominant axis (1,1,0,0)/√2
    val u = Seq(1, 1, 0, 0).map(_ / math.sqrt(2.0))
    val cos = m.components(0).zip(u).map(t => t._1 * t._2).sum
    assert(math.abs(cos) > 0.99, s"pc1 misaligned: ${m.components(0)}")
    // mean recovered
    assert(math.abs(m.mean(0) - 5.0) < 0.2 &&
      math.abs(m.mean(1) + 2.0) < 0.2)
  }

  test("projection is centered; whitening normalizes the variance") {
    val df = planted(2000)
    val m = Pca.fit(df, "vec_id", "embedding", p = 2)
    val scored = df.select(
      Pca.component(col("embedding"), m, 0).as("p0"),
      Pca.whitened(col("embedding"), m, 0).as("w0"))
    val r = scored.agg(avg("p0"), variance("p0"), variance("w0")).head()
    assert(math.abs(r.getDouble(0)) < 0.2) // centered
    assert(math.abs(r.getDouble(1) - m.eigenvalues(0)) <
      0.05 * m.eigenvalues(0)) // var(pc) ≈ λ (fit uses all 2000 rows)
    assert(math.abs(r.getDouble(2) - 1.0) < 0.05) // whitened unit var
  }

  test("fit is deterministic across repeated runs") {
    val df = planted(500)
    val m1 = Pca.fit(df, "vec_id", "embedding", p = 3)
    val m2 = Pca.fit(df.repartition(7), "vec_id", "embedding", p = 3)
    assert(m1.components === m2.components)
    assert(m1.eigenvalues === m2.eigenvalues)
    assert(m1.mean === m2.mean)
  }
}
