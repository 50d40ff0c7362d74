package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF coarse quantizer + probe search on planted, well-separated
  * clusters: training must recover the cluster partition and probing
  * must find the true nearest neighbors (recall 1 when cells are
  * separated far beyond the in-cluster spread).
  */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  // 3 clusters of 20 vectors in R⁴, centers on scaled axes
  private def planted() = {
    val rows = for {
      cl <- 0 until 3
      j <- 0 until 20
    } yield {
      val base = Array.fill(4)(0.0f)
      base(cl) = 10.0f
      base((cl + 1) % 4) += j * 0.01f // small deterministic spread
      (cl * 100L + j, base)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("fit recovers the planted cluster partition") {
    val vecs = planted()
    val model = Ivf.fit(vecs, "vec_id", "embedding", k = 3, iters = 4)
    val cells = vecs.select(col("vec_id"),
      Ivf.assign(col("embedding"), model).as("cell"))
      .collect().map(r => (r.getLong(0) / 100, r.getInt(1)))
    // cluster-mates share a cell; different clusters get different cells
    val byCluster = cells.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byCluster.values.forall(_.size == 1), s"split cluster: $byCluster")
    assert(byCluster.values.flatten.toSet.size === 3)
  }

  test("fit is order-independent: shuffled/repartitioned input, same model") {
    val vecs = planted()
    val base = Ivf.fit(vecs, "vec_id", "embedding", k = 3, iters = 4)
    // same rows, different physical order and partitioning — the hash
    // sample and farthest-point seeds must not notice (a limit()-based
    // sample would train on whatever rows happen to list first)
    val shuffled = vecs.orderBy(col("vec_id").desc).repartition(7)
    val again = Ivf.fit(shuffled, "vec_id", "embedding", k = 3, iters = 4)
    assert(base.centroids === again.centroids)
  }

  test("hashSample keeps a size-targeted, id-determined subset") {
    val vecs = planted()
    val kept = Ivf.hashSample(vecs, "vec_id", "embedding", target = 30)
      .select("_h").collect().map(_.getString(0)).sorted.toSeq
    val again = Ivf.hashSample(vecs.repartition(5), "vec_id", "embedding",
      target = 30).select("_h").collect().map(_.getString(0)).sorted.toSeq
    assert(kept === again)
    assert(kept.nonEmpty && kept.size < 60)
    // target ≥ total keeps everything
    assert(Ivf.hashSample(vecs, "vec_id", "embedding", target = 60)
      .count() === 60)
  }

  test("topK with cell probing matches brute force on separated clusters") {
    val vecs = planted()
    val model = Ivf.fit(vecs, "vec_id", "embedding", k = 3, iters = 4)
    val queries = vecs.filter(col("vec_id").isin(5L, 105L, 205L))
    val ivf = Ivf.topK(queries, vecs, "vec_id", "embedding", model,
      k = 3, nProbe = 1)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = Similarity.bruteForceTopK(queries, vecs, "vec_id",
      "embedding", k = 3)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivf === brute)
  }

  test("assign: the large-k HOF path matches driver arithmetic exactly") {
    // k > 64 switches cellScores from the unrolled codegen'd array
    // (which blows Janino's method-size limit around k ≈ 100 — the
    // √n cell count real corpora want) to one k-independent zip_with
    // expression; both fold the same doubles sequentially, so the
    // assignment must equal a driver-side reference bit-for-bit
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    val cents = IndexedSeq.tabulate(100, 4)((_, _) => rnd.nextDouble())
    val model = Ivf.Model(cents)
    val vecs = (0L until 200L)
      .map(i => (i, Seq.fill(4)(rnd.nextDouble())))
      .toDF("vec_id", "embedding")
    val got = vecs.select(col("vec_id"),
        Ivf.assign(col("embedding"), model).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byId = vecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    byId.foreach { case (id, v) =>
      val scores = cents.map(c =>
        c.map(x => x * x).sum - 2.0 * c.zip(v).map { case (a, b) =>
          a * b }.foldLeft(0.0)(_ + _))
      assert(got(id) === scores.indexOf(scores.min), s"vec $id")
    }
  }
}
