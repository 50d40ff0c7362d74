package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization — the third member of the vector-compression
  * family next to sign-LSH buckets ([[Similarity]]) and product codes
  * ([[Pq]]): each dimension is linearly quantized to an 8-bit code
  * against a per-dimension [min, max] range fitted on a sample. 4×
  * smaller than float32 at far higher fidelity than PQ (64 codes for a
  * 64-dim vector vs PQ's 8), which is why serving stacks keep SQ8 as
  * the "almost lossless" tier: compression bounds scan bytes, not
  * candidate count, so it composes with any pruner (IVF cells, LSH
  * buckets) rather than replacing one.
  *
  * Asymmetric scoring, the standard recipe: the query stays exact
  * float, the corpus is decoded from codes — decode is MAP-ONLY and
  * runs once per corpus row before any join, so the ranking join sees
  * plain double arrays and reuses the codegen'd [[Similarity.dot]]
  * kernel. At 100 TB the codes column (64 bytes/vector) is what sits
  * in the table; the decode pass is a projection inside the scan stage.
  *
  * Determinism: per-dimension min/max are exact order-independent
  * aggregates over the hash-prefix sample ([[Ivf.hashSample]] — no
  * file-order bias); `range` and `scale = range/255` are computed ONCE
  * in the driver and planted as literals, so both engines evaluate
  * `mn + clamp(floor((x−mn)/range·255 + 0.5))·scale` over identical
  * double constants. Codes are exact integers; the only float-fold
  * noise is the cosine sum, under the same round-to-4 contract as
  * every other ANN oracle.
  */
object Sq {

  /** Per-dimension quantization range. `ranges`/`scales` are derived in
    * the driver and frozen with the model so the SQL twin inlines the
    * exact same doubles. */
  final case class Model(mins: IndexedSeq[Double],
                         maxs: IndexedSeq[Double]) {
    def dim: Int = mins.length
    def ranges: IndexedSeq[Double] =
      mins.indices.map(i => maxs(i) - mins(i))
    def scales: IndexedSeq[Double] = ranges.map(_ / 255.0)
  }

  /** Fit per-dimension [min, max] on (a hash-prefix sample of) `vecs`.
    * min/max are exact and order-independent, so the fit is
    * deterministic with no rounding step; values outside the sampled
    * range at encode time clamp to the nearest code. */
  def fit(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
          sample: Int = 10000): Model = {
    val rows = Ivf.hashSample(vecs, idCol, vecCol, sample)
      .select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .filter(col("pos") < dim)
      .groupBy("pos")
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .collect() // ≤ dim rows — model-sized, like Ivf.fit's centroids
    val mn = Array.fill(dim)(0.0)
    val mx = Array.fill(dim)(0.0)
    rows.foreach { r =>
      mn(r.getInt(0)) = r.getDouble(1); mx(r.getInt(0)) = r.getDouble(2)
    }
    Model(mn.toIndexedSeq, mx.toIndexedSeq)
  }

  /** 8-bit codes for a vector (map-only): per dimension,
    * `clamp₀₂₅₅(floor((x − mn)/range·255 + 0.5))`; a degenerate
    * dimension (range 0 in the sample) codes to 0 and decodes to its
    * min. Null/short vectors yield null elements, which propagate to a
    * null score ranked last — the family-wide ragged-vector contract. */
  def encode(v: Column, model: Model): Column = {
    val mnL = typedlit[Seq[Double]](model.mins.toSeq)
    val rgL = typedlit[Seq[Double]](model.ranges.toSeq)
    transform(slice(v, 1, model.dim), (x, i) => {
      val mn = element_at(mnL, i + 1)
      val rg = element_at(rgL, i + 1)
      val code = greatest(lit(0L), least(lit(255L),
        floor((x.cast("double") - mn) / rg * 255.0 + 0.5)))
      // x.isNotNull OUTSIDE the clamp: Spark's least/greatest SKIP null
      // children (a null element would clamp to a real 255), while SQL's
      // propagate — guard first so both engines code a null element null
      when(x.isNotNull,
        when(rg > 0.0, code.cast("int")).otherwise(lit(0)))
    })
  }

  /** Decoded (approximate) vector from codes: `mn + code·scale`. */
  def decode(codes: Column, model: Model): Column = {
    val mnL = typedlit[Seq[Double]](model.mins.toSeq)
    val scL = typedlit[Seq[Double]](model.scales.toSeq)
    transform(codes, (c, i) =>
      element_at(mnL, i + 1) + c.cast("double") * element_at(scL, i + 1))
  }

  /** Asymmetric top-k: exact query vs decoded corpus. The corpus decode
    * is a projection inside its scan stage (encode∘decode fused here —
    * a stored-codes table skips the encode half); candidate bounding is
    * the caller's concern (compose with [[Ivf.topK]]'s cell join at
    * scale — this gate query scans all candidates to isolate what
    * quantization alone does to the ranking). */
  def adcTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, model: Model, k: Int): DataFrame = {
    import Similarity.{dot, norm2}
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm2(col(vecCol)).as("nq"))
    val c = Partitioning.spread(corpus)
      .select(col(idCol).as("neighbor_id"),
        decode(encode(col(vecCol), model), model).as("dv"))
      .select(col("neighbor_id"), col("dv"), norm2(col("dv")).as("nc"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("dv")) /
          sqrt(col("nq") * col("nc")), 4).as("sim"))
    Similarity.rankTopK(scored, col("sim").desc_nulls_last, k)
  }
}
