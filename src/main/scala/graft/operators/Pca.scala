package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component projection for embedding columns — the standard
  * pre-processing tier of a vector pipeline: decorrelate dimensions,
  * concentrate variance in a short prefix (dimensionality reduction for
  * cheaper ANN / clustering), and optionally whiten so downstream cosine
  * or Euclidean geometry isn't dominated by a few high-variance axes
  * (whitening is also the first half of the public OPQ recipe for PQ
  * codebooks).
  *
  * Production shape at 100 TB:
  *  - [[fit]] estimates the d×d second-moment matrix on a bounded
  *    order-independent sample ([[Ivf.hashSample]] — same contract as
  *    the IVF/PQ codebooks: identical model on any cluster size, file
  *    layout, or ingest order). The only exchange is the partially
  *    aggregated (position, partial-sum) table — d + d(d+1)/2 rows
  *    reach the driver (≈2 KB·doubles at d = 64), never the sample.
  *    The eigensolve is a driver-side Jacobi over a 64×64 symmetric
  *    matrix — microseconds, no distributed linear algebra needed
  *    (covariance PCA is exact here, not an iterative sketch).
  *  - [[component]]/[[projection]] are map-only codegen'd expressions
  *    (the frozen eigenvector is a literal array under the native
  *    [[graft.functions.VecDot]] kernel), so projecting the full corpus
  *    runs at scan speed and inherits input partitioning — the same
  *    "driver-fitted model, literal-array scan" recipe as [[Ivf.assign]].
  *
  * Determinism contract (mirrors [[Ivf.fit]]): hash-prefix sample, fixed
  * cyclic-Jacobi pivot order, eigenpairs sorted by (−λ, index) with a
  * first-max-positive sign convention, mean/eigenvector/centering
  * literals rounded to 6/6/9 decimals. The fitted model freezes into a
  * SQL oracle that replays the projection bit-for-bit (left-to-right
  * double folds, `Double.toString` round-trip literals).
  */
object Pca {

  /** `components` are unit-norm eigenvector rows (q × d), eigenvalue
    * order descending; `centerDot(j)` = mean·components(j), the
    * projection's centering constant (precomputed so the scan never
    * materializes a subtraction per element — project(v) = v·e_j − c_j).
    */
  final case class Model(mean: IndexedSeq[Double],
                         eigenvalues: IndexedSeq[Double],
                         components: IndexedSeq[IndexedSeq[Double]],
                         centerDot: IndexedSeq[Double]) {
    def d: Int = mean.length
    def q: Int = components.length
  }

  import Similarity.dot

  /** The j-th (0-based) centered principal score of a vector column:
    * round((v − mean)·e_j, 4) in the distributed form v·e_j − (mean·e_j)
    * — one literal-array dot (codegen'd) and one literal subtract, no
    * per-element centering in the scan. */
  def component(v: Column, model: Model, j: Int): Column =
    round(dot(v, typedlit[Seq[Double]](model.components(j).toSeq)) -
      lit(model.centerDot(j)), 4)

  /** All q scores as columns pc1..pcq (append to a select). */
  def projection(v: Column, model: Model): Seq[Column] =
    model.components.indices.map(j => component(v, model, j).as(s"pc${j + 1}"))

  /** Whitened score: component / sqrt(λ_j) — unit variance per axis on
    * the training distribution. Guarded for degenerate axes (λ ≤ ε ⇒
    * the axis carries no signal; emit 0 rather than amplifying noise). */
  def whitened(v: Column, model: Model, j: Int, eps: Double = 1e-9): Column =
    if (model.eigenvalues(j) <= eps) lit(0.0)
    else round((dot(v, typedlit[Seq[Double]](model.components(j).toSeq)) -
      lit(model.centerDot(j))) / lit(math.sqrt(model.eigenvalues(j))), 4)

  /** Unaliased projection scores packed into one double array — the
    * reduced-space representation [[rerankTopK]] scans. Unrounded: the
    * rounding happens once, on the final distance. */
  private def packed(v: Column, model: Model): Column =
    array(model.components.indices.map(j =>
      dot(v, typedlit[Seq[Double]](model.components(j).toSeq)) -
        lit(model.centerDot(j))): _*)

  /** ANN via PCA shortlist + exact re-rank — the "coarse search in low
    * dimensions" recipe: candidates are scored by squared L2 distance in
    * the p-dim projected space (p/d of the brute-force flops per pair —
    * PCA minimizes the L2 distortion of that approximation among all
    * rank-p projections, and for unit-norm embeddings L2 order IS cosine
    * order), and only the per-query `shortlist` survivors fetch float
    * vectors for the exact cosine re-rank. Same scan shapes as the PQ
    * rerank: the corpus side carries p doubles per row (projected
    * map-side, inherits partitioning), the query side broadcasts, and
    * the shortlist broadcasts INTO the full-vector corpus scan — floats
    * surface only for |Q|·shortlist rows. Compose with [[Ivf]] cells
    * when |corpus| makes even the reduced scan too wide. */
  def rerankTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                 vecCol: String, model: Model, k: Int,
                 shortlist: Int): DataFrame = {
    import Similarity.{norm2, rankTopK}
    val q = queries.select(col(idCol).as("query_id"),
        packed(col(vecCol), model).as("pq"))
      .select(col("query_id"), col("pq"), norm2(col("pq")).as("nq"))
    val c = Partitioning.spread(corpus)
      .select(col(idCol).as("neighbor_id"),
        packed(col(vecCol), model).as("pc"))
      .select(col("neighbor_id"), col("pc"), norm2(col("pc")).as("nc"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(col("nq") + col("nc") -
          lit(2.0) * dot(col("pq"), col("pc")), 4).as("pdist"))
    val short = rankTopK(scored, col("pdist").asc_nulls_last, shortlist)
      .select("query_id", "neighbor_id")
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm2(col(vecCol)).as("nqv"))
    val cv = Partitioning.spread(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        norm2(col(vecCol)).as("ncv"))
    val exact = cv.join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")) /
          sqrt(col("nqv") * col("ncv")), 4).as("sim"))
    rankTopK(exact, col("sim").desc_nulls_last, k)
  }

  /** Fit mean + top-`p` principal axes on a hash-prefix sample.
    *
    * One distributed pass: each sampled row expands to its d mean terms
    * plus the d(d+1)/2 upper-triangle products (higher-order transforms,
    * interpreted — fine for a bounded sample; the full-corpus scan path
    * is the codegen'd projection, not this), position-exploded and
    * partially aggregated, so the exchange and the driver collect are
    * moment-table-sized regardless of sample or corpus size.
    */
  def fit(vecs: DataFrame, idCol: String, vecCol: String, p: Int,
          sample: Int = 10000): Model = {
    // dim probe from the minimum-id row — limit(1) on an unordered frame
    // would pick a partition-layout-dependent row, and on a
    // mixed-dimension corpus THAT would decide which rows train the
    // model (breaking the any-layout determinism the frozen oracle needs)
    val dimRow = vecs.filter(col(vecCol).isNotNull)
      .orderBy(col(idCol)).select(size(col(vecCol))).limit(1).collect()
    require(dimRow.nonEmpty, "Pca.fit: no non-null vectors to train on")
    val d = dimRow.head.getInt(0)
    require(p >= 1 && p <= d, s"Pca.fit: p $p out of range 1..$d")
    val sampled = Ivf.hashSample(vecs, idCol, vecCol, sample)
      .filter(size(col(vecCol)) === d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = sampled.count()
      require(n > 1, s"Pca.fit: need at least 2 vectors, got $n")
      val vd = transform(col(vecCol), x => x.cast("double"))
      // [v_0..v_{d-1}, v_0v_0..v_0v_{d-1}, v_1v_1.., .., v_{d-1}v_{d-1}]
      val terms = concat(vd,
        flatten(transform(sequence(lit(0), lit(d - 1)), i =>
          transform(sequence(i, lit(d - 1)), j =>
            element_at(vd, i + 1) * element_at(vd, j + 1)))))
      val sums = sampled.select(posexplode(terms).as(Seq("pos", "x")))
        .groupBy("pos").agg(sum("x").as("s"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val mean = (0 until d)
        .map(i => math.rint(sums(i) / n * 1e6) / 1e6)
      // covariance from raw moments, low-bit drift absorbed at 1e-9
      val cov = Array.ofDim[Double](d, d)
      var pos = d
      for (i <- 0 until d; j <- i until d) {
        val c = math.rint(
          (sums(pos) / n - mean(i) * mean(j)) * 1e9) / 1e9
        cov(i)(j) = c; cov(j)(i) = c
        pos += 1
      }
      val (eig, vects) = jacobiEig(cov)
      val order = eig.indices.sortBy(i => (-eig(i), i)).take(p)
      val components = order.map { k =>
        val raw = (0 until d).map(i => vects(i)(k))
        // sign: the largest-|entry| coordinate (first wins) is positive
        val pivot = raw.indices.maxBy(i => (math.abs(raw(i)), -i))
        val s = if (raw(pivot) < 0) -1.0 else 1.0
        raw.map(x => math.rint(x * s * 1e6) / 1e6)
      }.toIndexedSeq
      val eigenvalues = order.map(k =>
        math.max(0.0, math.rint(eig(k) * 1e6) / 1e6)).toIndexedSeq
      val centerDot = components.map { e =>
        var acc = 0.0
        var i = 0
        while (i < d) { acc += mean(i) * e(i); i += 1 }
        math.rint(acc * 1e9) / 1e9
      }
      Model(mean, eigenvalues, components, centerDot)
    } finally sampled.unpersist(blocking = false)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: sweeps in
    * fixed (p, q) order, rotations zero one off-diagonal pair at a time,
    * eigenvectors accumulate in the columns of `v`. Deterministic for a
    * given input; converges quadratically — 64×64 needs ~6 sweeps. */
  private[operators] def jacobiEig(a0: Array[Array[Double]])
      : (IndexedSeq[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < 30 && off > 1e-18) {
      for (p <- 0 until d - 1; q <- p + 1 until d) {
        if (math.abs(a(p)(q)) > 1e-15) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = math.signum(theta) /
            (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case x => x
            }
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (i <- 0 until d) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = c * aip - s * aiq
            a(i)(q) = s * aip + c * aiq
          }
          for (i <- 0 until d) {
            val api = a(p)(i); val aqi = a(q)(i)
            a(p)(i) = c * api - s * aqi
            a(q)(i) = s * api + c * aqi
          }
          for (i <- 0 until d) {
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - s * viq
            v(i)(q) = s * vip + c * viq
          }
        }
      }
      off = offDiag(a)
      sweep += 1
    }
    ((0 until d).map(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }
}
