package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization on planted, well-separated clusters: codes must
  * collapse cluster-mates together, and ADC ranking must surface the
  * true nearest cluster when the separation dwarfs quantization error.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 4 clusters of 15 vectors in R⁸, centers on scaled axes — dsub = 4
  // with m = 2, so each subspace sees a 2-cluster structure it can code.
  // (Order no longer matters to fit: farthest-point seeding over the
  // hash sample spans the clusters regardless of row order.)
  private def planted() = {
    val rows = for {
      j <- 0 until 15
      cl <- 0 until 4
    } yield {
      val base = Array.fill(8)(0.0f)
      base(cl * 2) = 10.0f
      base(cl * 2 + 1) = 5.0f
      base((cl * 2 + 3) % 8) += j * 0.01f
      (cl * 100L + j, base)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("encode separates clusters: no code sequence spans two clusters") {
    val vecs = planted()
    val model = Pq.fit(vecs, "vec_id", "embedding", m = 2, ksub = 4, iters = 4,
      sample = 100)
    assert(model.m === 2 && model.dsub === 4 && model.ksub === 4)
    val codes = vecs.select(col("vec_id"),
      Pq.encode(col("embedding"), model).as("codes"))
      .collect().map(r => (r.getLong(0) / 100, r.getSeq[Int](1)))
    // spare codewords may subdivide a cluster's internal spread (that is
    // quantization working as intended) — the separation contract is
    // that a code sequence never AGGREGATES two different clusters
    val byCode = codes.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    assert(byCode.values.forall(_.size == 1),
      s"code collides clusters: ${byCode.filter(_._2.size > 1)}")
  }

  test("adcTopK ranks the query's own cluster first") {
    val vecs = planted()
    val model = Pq.fit(vecs, "vec_id", "embedding", m = 2, ksub = 4, iters = 4,
      sample = 100)
    val queries = vecs.filter(col("vec_id").isin(5L, 105L, 305L))
    val got = Pq.adcTopK(queries, vecs, "vec_id", "embedding", model, k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id")))
    // every returned neighbor comes from the query's own cluster
    assert(got.nonEmpty && got.forall { case (q, n) => q / 100 == n / 100 },
      s"cross-cluster neighbor: ${got.mkString(",")}")
  }

  test("a null/ragged corpus vector never enters any top-k (NULLS LAST)") {
    val vecs = planted()
    val model = Pq.fit(vecs, "vec_id", "embedding", m = 2, ksub = 4, iters = 4,
      sample = 100)
    // poison rows: one null vector, one ragged (wrong-dim) vector — both
    // encode to null codes and a null ADC distance; Spark's default
    // ascending sort is NULLS FIRST, which would rank them #1 for EVERY
    // query without the explicit nulls-last ordering
    val poisoned = vecs.unionByName(Seq(
      (9001L, null.asInstanceOf[Array[Float]]),
      (9002L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding"))
    val queries = vecs.filter(col("vec_id").isin(5L, 105L))
    val got = Pq.adcTopK(queries, poisoned, "vec_id", "embedding", model,
      k = 5).collect()
    assert(got.nonEmpty)
    assert(!got.exists(_.getAs[Long]("neighbor_id") >= 9000L),
      "null-distance poison row entered a top-k")
    assert(got.forall(!_.isNullAt(got.head.fieldIndex("adist"))))
  }

  test("fit is order-independent: shuffled/repartitioned input, same model") {
    val vecs = planted()
    val base = Pq.fit(vecs, "vec_id", "embedding", m = 2, ksub = 4,
      iters = 2, sample = 100)
    val shuffled = vecs.orderBy(col("vec_id").desc).repartition(7)
    val again = Pq.fit(shuffled, "vec_id", "embedding", m = 2, ksub = 4,
      iters = 2, sample = 100)
    assert(base.centroids === again.centroids)
  }

  test("encode is deterministic across evaluations") {
    val vecs = planted()
    val model = Pq.fit(vecs, "vec_id", "embedding", m = 2, ksub = 4, iters = 2,
      sample = 100)
    val twice = vecs.select(
        Pq.encode(col("embedding"), model).as("a"),
        Pq.encode(col("embedding"), model).as("b"))
      .filter(not(col("a") === col("b"))).count()
    assert(twice === 0)
  }
}
