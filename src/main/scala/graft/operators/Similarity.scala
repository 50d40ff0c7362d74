package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths, mirroring how a 100 TB corpus is actually searched:
  *  - `bruteForceTopK` — exact cosine against every corpus vector. The
  *    correctness baseline; cost O(|Q|·|C|·d). Fine when |Q| is small
  *    (the query side broadcasts) — never run all-pairs at scale.
  *  - `lshTopK` — sign-LSH bucketing (one deterministic hyperplane per
  *    sampled dimension): vectors are assigned a `b`-bit bucket key, the
  *    probe joins only its own bucket. The bucket join replaces the
  *    cross product: cost O(|Q|·|C|/2^b·d) expected. This is the IVF-ish
  *    scale path; recall is tunable by `b` and multi-probing.
  *
  * All arithmetic is done in double with sequential fold order
  * (`aggregate` over zip_with), so results are deterministic and match
  * the SQL oracle bit-for-bit before rounding.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double, sequential (deterministic) fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) =>
      acc + x.cast("double") * x.cast("double"))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** `b`-bit sign bucket from the first `b` dimensions (deterministic
    * axis-aligned hyperplane family). */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits).map(i =>
      when(element_at(v, i + 1) >= 0, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)

  /** Exact top-k neighbors for each query vector. `queries` and `corpus`
    * both need (idCol, vecCol); self-matches dropped. The query side is
    * expected to be small → broadcast hash join, no shuffle of the corpus.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 4).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
  }

  /** LSH-bucketed approximate top-k: probe only the query's sign bucket. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, bits: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 4).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
  }

  /** Embedding near-dup pairs above `threshold`, candidate-bounded by
    * sharing a sign bucket (cosine-LSH property: near vectors agree on
    * most sign bits). */
  def nearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, bits: Int = 4): DataFrame = {
    val v = vecs.select(col(idCol), col(vecCol),
      signBucket(col(vecCol), bits).as("bucket"))
    val a = v.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("bucket"))
    val b = v.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")), 4).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
