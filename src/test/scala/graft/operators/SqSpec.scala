package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization: code range, reconstruction error bound,
  * null propagation, and ranking fidelity vs exact. */
class SqSpec extends SparkSpec {

  import spark.implicits._

  private def fixture = {
    val rnd = new scala.util.Random(7)
    (0L until 200L).map(i =>
      (i, Seq.fill(16)((rnd.nextDouble() * 4 - 2).toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("codes are in [0,255] and reconstruction error ≤ half a step") {
    val df = fixture
    val model = Sq.fit(df, "vec_id", "embedding", dim = 16)
    assert(model.dim === 16)
    assert(model.ranges.forall(_ > 0))
    val enc = df.select(col("vec_id"), col("embedding"),
      Sq.encode(col("embedding"), model).as("codes"))
    val bad = enc.filter(exists(col("codes"),
      c => c < 0 || c > 255 || c.isNull)).count()
    assert(bad === 0L)
    // |decoded − x| ≤ step/2 + eps for in-range x (clamped dims excluded:
    // the fit saw every value here, so nothing clamps)
    val err = enc.select(col("vec_id"),
      Sq.decode(col("codes"), model).as("dv"), col("embedding"))
      .select(aggregate(
        zip_with(col("dv"), col("embedding"),
          (d, x) => abs(d - x.cast("double"))),
        lit(0.0), (acc, e) => greatest(acc, e)).as("maxerr"))
      .agg(max("maxerr")).head().getDouble(0)
    val maxStep = model.scales.max
    assert(err <= maxStep / 2 + 1e-9,
      s"reconstruction error $err exceeds half-step ${maxStep / 2}")
  }

  test("out-of-range values clamp to the end codes") {
    val df = fixture
    val model = Sq.fit(df, "vec_id", "embedding", dim = 16)
    val wild = Seq((0L, Seq.fill(16)(99f)), (1L, Seq.fill(16)(-99f)))
      .toDF("vec_id", "embedding")
    val codes = wild.orderBy("vec_id")
      .select(Sq.encode(col("embedding"), model))
      .as[Seq[Int]].collect()
    assert(codes(0).forall(_ == 255))
    assert(codes(1).forall(_ == 0))
  }

  test("null elements code to null and rank last, not to a clamped 255") {
    val df = fixture
    val model = Sq.fit(df, "vec_id", "embedding", dim = 16)
    val withNull = Seq((500L, (0 until 16).map(i =>
      if (i == 3) null else java.lang.Float.valueOf(0.5f)).toSeq))
      .toDF("vec_id", "embedding")
    val codes = withNull
      .select(Sq.encode(col("embedding"), model).as("c"))
      .head().getSeq[Any](0)
    assert(codes(3) == null, "null element must stay null through encode")
    assert(codes.count(_ != null) === 15)
    // a null-coded corpus row scores null → desc_nulls_last puts it
    // behind every real candidate
    val corpus = df.unionByName(withNull)
    val top = Sq.adcTopK(df.filter(col("vec_id") < 2), corpus,
      "vec_id", "embedding", model, k = 300)
    assert(top.filter(col("neighbor_id") === 500L)
      .agg(min("rnk")).head().getInt(0) > 190,
      "the null-coded row must rank behind every real candidate")
  }

  test("SQ8 ranking reproduces the exact top-3 on a spread-out fixture") {
    val df = fixture
    val model = Sq.fit(df, "vec_id", "embedding", dim = 16)
    val q = df.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(q, df, "vec_id", "embedding", 3)
    val sq = Sq.adcTopK(q, df, "vec_id", "embedding", model, 3)
    val recall = graft.queries.SimilarityQueries.recallAtK(exact, sq, 3)
    assert(recall >= 0.8, s"SQ8 recall@3 $recall on a 16-dim fixture")
  }
}
