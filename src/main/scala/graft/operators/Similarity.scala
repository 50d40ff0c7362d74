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

  import Partitioning.spread

  /** Σ aᵢ·bᵢ in double, sequential (deterministic) fold — the codegen'd
    * [[graft.functions.VecDot]], exactly equivalent to
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` but a primitive loop. */
  def dot(a: Column, b: Column): Column =
    call_function("graft_vec_dot", a, b)

  def norm2(a: Column): Column =
    call_function("graft_vec_norm2", a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Deterministic Rademacher (±1) hyperplanes from a seeded xorshift —
    * reproducible across engines (the SQL oracle embeds the identical
    * literals). Random-sign hyperplanes de-correlate bucket bits from
    * individual embedding dimensions: real embeddings have correlated
    * leading dims (often sharing sign corpus-wide), so axis-aligned
    * buckets go hot and a hot bucket re-creates the cross product at
    * scale; a ±1 projection mixes all `dim` dimensions into every bit. */
  def hyperplaneSigns(bits: Int, dim: Int): IndexedSeq[IndexedSeq[Double]] = {
    var state = 0x9E3779B97F4A7C15L // fixed seed (golden-ratio constant)
    def next(): Long = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17; state
    }
    IndexedSeq.fill(bits, dim)(if (next() >= 0) 1.0 else -1.0)
  }

  /** `bits`-bit sign bucket: bit i = sign(hᵢ · v) for the i-th seeded
    * Rademacher hyperplane. Same sequential fold order as [[dot]], so the
    * oracle's left-to-right sum matches bit-for-bit. Vectors shorter than
    * `dim` project over their available dimensions (the hyperplane is
    * sliced to match) — a length mismatch must not silently collapse
    * every vector into bucket 0 via a null dot product. */
  def signBucket(v: Column, bits: Int, dim: Int): Column =
    hyperplaneSigns(bits, dim).zipWithIndex.map { case (h, i) =>
      val hArr = array(h.map(lit): _*)
      val proj = dot(slice(v, 1, dim),
        slice(hArr, lit(1), least(size(v), lit(dim))))
      when(proj >= 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)


  /** Per-query top-k over a scored pair frame: rank on `order`, then
    * `neighbor_id`. NULLS LAST explicitly — Spark's bare `.asc` is
    * NULLS FIRST, so ONE null/ragged vector's null score would occupy
    * rank 1 for EVERY query (the ADC path scores a null-coded row as
    * null); DuckDB defaults to NULLS LAST, so the explicit ordering
    * also keeps the frozen-model oracles rank-identical. Shared by
    * every ANN path (brute/LSH/IVF/PQ). */
  private[operators] def rankTopK(scored: DataFrame, order: Column,
                                  k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(order, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
  }

  /** Exact top-k neighbors for each query vector. `queries` and `corpus`
    * both need (idCol, vecCol); self-matches dropped. The query side must
    * be small — it broadcasts against every corpus vector (O(|Q|·|C|·d));
    * never feed a large query side, use [[lshTopK]] instead. Norms are
    * computed once per side before the join, so the per-pair work is one
    * dot product, not three folds. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm2(col(vecCol)).as("nq"))
    val c = spread(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        norm2(col(vecCol)).as("nc"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")) /
          sqrt(col("nq") * col("nc")), 4).as("sim"))
    rankTopK(scored, col("sim").desc_nulls_last, k)
  }

  /** LSH-bucketed approximate top-k: probe only the query's sign bucket. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, bits: Int = 4,
              dim: Int = 64): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm2(col(vecCol)).as("nq"),
      signBucket(col(vecCol), bits, dim).as("bucket"))
    val c = spread(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        norm2(col(vecCol)).as("nc"),
        signBucket(col(vecCol), bits, dim).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")) /
          sqrt(col("nq") * col("nc")), 4).as("sim"))
    rankTopK(scored, col("sim").desc_nulls_last, k)
  }

  /** [[lshTopK]] with multi-probe: each query also probes the `bits`
    * buckets at Hamming distance 1 from its own (flip one sign bit) —
    * the standard recall lever for sign-LSH. Cost grows by ×(bits+1) on
    * the probe side only; the corpus is still bucketed once, so at scale
    * this is (bits+1) bucket lookups per query, not a wider scan. */
  def lshTopKMultiProbe(queries: DataFrame, corpus: DataFrame, idCol: String,
                        vecCol: String, k: Int, bits: Int = 4,
                        dim: Int = 64): DataFrame = {
    val masks = array((0L +: (0 until bits).map(i => 1L << i)).map(lit): _*)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm2(col(vecCol)).as("nq"),
      signBucket(col(vecCol), bits, dim).as("b0"))
      .select(col("query_id"), col("qv"), col("nq"),
        explode(transform(masks, m => col("b0").bitwiseXOR(m))).as("bucket"))
    val c = spread(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        norm2(col(vecCol)).as("nc"),
        signBucket(col(vecCol), bits, dim).as("bucket"))
    // a corpus vector lives in exactly one bucket and probe buckets are
    // distinct, so no (query, neighbor) pair can appear twice
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")) /
          sqrt(col("nq") * col("nc")), 4).as("sim"))
    rankTopK(scored, col("sim").desc_nulls_last, k)
  }

  /** Embedding near-dup pairs above `threshold`, candidate-bounded by
    * sharing a sign bucket (cosine-LSH property: near vectors agree on
    * most sign bits).
    *
    * The self-join is SALTED: a bare join on `bucket` hash-partitions
    * both sides over only 2^bits distinct keys, capping the quadratic
    * within-bucket scoring at 2^bits tasks (16 at the default) — one
    * hot task per bucket at scale. Side `a` carries an id-derived salt,
    * side `b` replicates ×`salt`, and the join runs on (bucket, salt):
    * every pair still meets exactly once, parallelism becomes
    * 2^bits·salt, and the cost is a salt× replication of one side's
    * shuffle (vectors — bounded, and small next to the pair scoring the
    * salt exists to spread). Raise `bits` first at 100 TB (more buckets
    * = fewer candidates AND more parallelism); salt covers the residual
    * per-bucket skew. */
  def nearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, bits: Int = 4,
                   dim: Int = 64, salt: Int = 4): DataFrame = {
    val v = spread(vecs).select(col(idCol), col(vecCol),
      norm2(col(vecCol)).as("nn"),
      signBucket(col(vecCol), bits, dim).as("bucket"))
    val a = v.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      col("nn").as("na"), col("bucket"),
      pmod(hash(col(idCol)), lit(salt)).cast("int").as("_salt"))
    val b = v.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      col("nn").as("nb"), col("bucket"),
      explode(sequence(lit(0), lit(salt - 1))).as("_salt"))
    a.join(b, Seq("bucket", "_salt"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) /
          sqrt(col("na") * col("nb")), 4).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** SemDeDup (Abbas et al. 2023 — public): semantic deduplication by
    * coarse k-means cell. Within each cell, a vector with a LOWER-id
    * neighbor at cosine ≥ `threshold` is dropped; its keeper is the
    * lowest such neighbor (the paper keeps one representative per
    * ε-group — lowest id is the deterministic choice, the d_exact_dups
    * convention). Unlike [[nearDupPairs]]' sign buckets, the cells come
    * from a FITTED quantizer, so "same cell" already means "same
    * semantic neighborhood" and the within-cell quadratic is the real
    * SemDeDup cost model: k caps candidate set size, salt spreads a hot
    * cell's scoring across `salt` tasks.
    *
    * Returns every input id with its cell, `dropped` flag, and
    * `kept_by` (null for survivors) — the audit-friendly shape; filter
    * `!dropped` for the surviving corpus. */
  def semDedup(vecs: DataFrame, idCol: String, vecCol: String,
               model: Ivf.Model, threshold: Double,
               salt: Int = 4): DataFrame = {
    val v = spread(vecs).select(col(idCol), col(vecCol),
      norm2(col(vecCol)).as("nn"),
      Ivf.assign(col(vecCol), model).as("cell"))
    val a = v.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      col("nn").as("na"), col("cell"),
      pmod(hash(col(idCol)), lit(salt)).cast("int").as("_salt"))
    val b = v.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      col("nn").as("nb"), col("cell"),
      explode(sequence(lit(0), lit(salt - 1))).as("_salt"))
    val keepers = a.join(b, Seq("cell", "_salt"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(dot(col("va"), col("vb")) /
        sqrt(col("na") * col("nb")), 4) >= threshold)
      .groupBy(col("id_b").as(idCol))
      .agg(min(col("id_a")).as("kept_by"))
    v.select(col(idCol), col("cell"))
      .join(keepers, Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        col("kept_by").isNotNull.as("dropped"), col("kept_by"))
  }
}
