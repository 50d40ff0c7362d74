package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * k-means sibling of the sign-LSH path in [[Similarity]].
  *
  * Production shape at 100 TB:
  *  - `fit` trains a coarse quantizer on a driver-side sample (the
  *    standard IVF recipe — centroids are a few KB; training on a
  *    bounded sample is O(sample·k·iters·d), never a corpus pass);
  *  - `assign` plants the centroids as literal arrays in a codegen'd
  *    expression, so partitioning the corpus into cells is one map-only
  *    pass (`vec_dot` per centroid, argmax — no shuffle, no UDF);
  *  - `topK` probes the query's `nProbe` nearest cells only: the
  *    cell-key equi-join replaces the cross product, cost
  *    O(|Q|·nProbe/k·|C|·d) expected.
  *
  * Determinism: the training sample is an order-independent hash-prefix
  * filter (not `limit`, see [[hashSample]]), init = greedy
  * farthest-point seeds over the smallest-hash pool, fixed iteration
  * count, centroid components rounded to 6 decimals after every
  * update — reproducible across runs, cluster sizes and file layouts
  * up to float-sum noise far below the rounding grain.
  */
object Ivf {

  final case class Model(centroids: IndexedSeq[IndexedSeq[Double]]) {
    def k: Int = centroids.length
  }

  import Similarity.{dot, norm2}

  /** The centroid matrix as ONE typed literal (k × d ArrayData constant).
    * Inlining each component as its own literal would make every new
    * model a distinct k·d-node expression tree — a fresh multi-second
    * Janino compile per trained model; a single reference object keeps
    * the generated code size independent of k and d. */
  private def centroidLit(model: Model) =
    typedlit[Seq[Seq[Double]]](model.centroids.map(_.toSeq))

  /** Argmin-equivalent scores for all cells: score_i = |cᵢ|² − 2·v·cᵢ
    * (the |v|² term is constant per row and dropped). Shared with the
    * IVF-PQ composition, whose cross-cell ADC ranking re-adds exactly
    * this term (see [[Pq.ivfAdcTopK]]).
    *
    * Two bodies, one arithmetic: small k unrolls the k scores into a
    * codegen'd array (fastest — stays inside whole-stage codegen);
    * large k switches to a `zip_with` over the centroid literal, ONE
    * expression whose size is independent of k — the unrolled form
    * past k ≈ 100 blows Janino's method-size limit (measured: an
    * InternalCompilerException + slow interpreted fallback at k = 141,
    * the √n cell count a 20 k-vector corpus wants), while the HOF form
    * interprets the same sequential-fold doubles, so the scores — and
    * every assignment and gate derived from them — are bit-identical
    * on either path. */
  private[operators] def cellScores(v: Column, model: Model): Column =
    if (model.k <= 64) {
      val cents = centroidLit(model)
      val norms = array(model.centroids.map(c =>
        lit(c.map(x => x * x).sum)): _*)
      array((0 until model.k).map(i =>
        element_at(norms, i + 1) -
          lit(2.0) * dot(v, element_at(cents, i + 1))): _*)
    } else {
      val cents = centroidLit(model)
      val norms =
        typedlit[Seq[Double]](model.centroids.map(_.map(x => x * x).sum))
      zip_with(cents, norms, (c, n2) => n2 - lit(2.0) * dot(v, c))
    }

  /** Nearest-centroid index for a vector column (map-only, codegen'd).
    * An array of k scores + array_min/array_position — NOT a fold of
    * `when`s, whose otherwise-branches would duplicate the accumulated
    * expression tree exponentially in k. First index wins ties. */
  def assign(v: Column, model: Model): Column = {
    val scores = cellScores(v, model)
    (array_position(scores, array_min(scores)) - 1).cast("int")
  }

  /** `v − centroid(assign(v))` as a double array — the residual a PQ
    * codebook is trained on in the classic IVFADC composition (Jégou et
    * al. 2011): within a coarse cell the residual carries the signal the
    * cell centroid doesn't, so codes spend their dynamic range on it
    * instead of re-describing the centroid. Ragged or null vectors map
    * to null (mirrors [[assign]]'s null propagation). Interpreted HOF —
    * used only on bounded training samples, never a corpus scan (the
    * scan-side encode uses the distributed-dot form, see
    * [[Pq.encodeResidual]]). */
  def residual(v: Column, model: Model): Column = {
    val d = model.centroids.head.length
    when(size(v) === lit(d),
      zip_with(v, element_at(centroidLit(model), assign(v, model) + 1),
        (a, b) => a.cast("double") - b))
  }

  /** Order-independent uniform training sample of ≈`target` rows: keep
    * ids whose md5 prefix falls below target/total (the
    * [[Sampling.weightedSample]] primitive). One column-pruned map-only
    * pass plus a metadata-cheap count — unlike `limit(n)`, the kept set
    * does not follow file-listing order, which at 100 TB correlates
    * with source/time: a first-rows sample trains the codebook on ONE
    * source's embeddings and degrades cell balance corpus-wide. */
  private[operators] def hashSample(vecs: DataFrame, idCol: String,
                                    vecCol: String, target: Int): DataFrame = {
    // count the rows the sample actually draws from — deriving the
    // fraction from the raw count would undershoot the target on any
    // corpus with null vectors (frac applied to fewer rows)
    val nonNull = vecs.filter(col(vecCol).isNotNull)
    val total = nonNull.count()
    val frac = if (total <= target) 1.0 else target.toDouble / total
    nonNull
      .select(Sampling.idHash(col(idCol)).as("_h"), col(vecCol))
      .filter(col("_h") < lit(Sampling.weightHex(frac)))
  }

  /** Greedy farthest-point k-means seeds over the `poolSize`
    * smallest-hash sample rows (collected — bounded, a few hundred
    * vectors). Deterministic AND mode-spanning: a "first k rows" init
    * can hand k-means several seeds inside one cluster and stunt the
    * partition permanently (empty cells keep stale centroids). */
  private[operators] def seedVectors(sampled: DataFrame, vecCol: String,
                                     k: Int, poolSize: Int = 256)
      : IndexedSeq[IndexedSeq[Double]] = {
    val pool = sampled.orderBy(col("_h")).limit(math.max(k, poolSize))
      .select(col(vecCol)).collect()
      .map(_.getSeq[Number](0).map(_.doubleValue()).toIndexedSeq)
      .toIndexedSeq
    if (pool.isEmpty) return IndexedSeq.empty
    def d2(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
      val n = math.min(a.length, b.length)
      var s = 0.0; var i = 0
      while (i < n) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    val seeds = scala.collection.mutable.ArrayBuffer(pool.head)
    while (seeds.size < math.min(k, pool.size))
      seeds += pool.maxBy(v => seeds.map(d2(v, _)).min) // first max wins ties
    seeds.toIndexedSeq
  }

  /** Train the coarse quantizer on (a hash-prefix sample of) `vecs`. */
  def fit(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
          iters: Int = 5, sample: Int = 10000): Model = {
    val sampled = hashSample(vecs, idCol, vecCol, sample).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids: IndexedSeq[IndexedSeq[Double]] =
        seedVectors(sampled, vecCol, k)
      for (_ <- 0 until iters) {
        val assigned = sampled.select(col(vecCol).as("v"),
          assign(col(vecCol), Model(centroids)).as("cell"))
          // a ragged/null vector yields a null cell — skip it rather
          // than NPE in the driver-side centroid update
          .filter(col("cell").isNotNull)
        // element-wise mean per cell: explode to (cell, pos, x) → avg —
        // k·d result rows, collected to the driver (a few KB)
        val means = assigned
          .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("cell", "pos")
          .agg(avg(col("x").cast("double")).as("m"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (cell, rows) =>
            cell -> rows.sortBy(_.getInt(1))
              .map(r => math.rint(r.getDouble(2) * 1e6) / 1e6).toIndexedSeq
          }
        // empty cells keep their previous centroid
        centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i)))
      }
      Model(centroids)
    } finally sampled.unpersist(blocking = false)
  }

  /** The `nProbe` nearest cell ids for a vector — the query-side coarse
    * probe, shared by [[topK]] and the IVF-PQ composition. */
  def probeCells(v: Column, model: Model, nProbe: Int): Column =
    transform(
      slice(array_sort(transform(cellScores(v, model),
        (s, i) => struct(s.as("d"), i.cast("int").as("cell")))), 1, nProbe),
      p => p("cell"))

  /** Hard-negative mining for contrastive training: for each labeled
    * query, the `k` most-similar corpus vectors carrying a DIFFERENT
    * label — the examples a retrieval/embedding model is most likely to
    * confuse, and exactly what a triplet/InfoNCE batch wants as
    * negatives. Label inequality uses the null-propagating `<>`: an
    * unlabeled corpus row is never nominated (it cannot be verified as a
    * true negative), matching SQL `<>` so the oracle is clause-identical.
    *
    * Same candidate bounding as [[topK]] — the fitted coarse quantizer's
    * cell equi-join replaces the cross product, queries broadcast with
    * their `nProbe` probe cells — so at 100 TB the cost is
    * O(|Q|·nProbe/k·|C|·d), and the label filter prunes BEFORE the
    * ranking window, map-side of its shuffle. The mined pairs are tiny
    * (ids + labels + a rounded score); nothing vector-width crosses the
    * ranking exchange. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, model: Model, k: Int,
                    nProbe: Int = 2): DataFrame = {
    val probes = array_sort(
      transform(cellScores(col(vecCol), model),
        (s, i) => struct(s.as("d"), i.cast("int").as("cell"))))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("q_label"), norm2(col(vecCol)).as("nq"),
      explode(slice(probes, 1, nProbe)).as("p"))
      .select(col("query_id"), col("qv"), col("q_label"), col("nq"),
        col("p.cell").as("cell"))
    val c = Partitioning.spread(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col(labelCol).as("n_label"), norm2(col(vecCol)).as("nc"),
        assign(col(vecCol), model).as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .filter(col("n_label") =!= col("q_label"))
      .select(col("query_id"), col("q_label"), col("neighbor_id"),
        col("n_label"),
        round(dot(col("qv"), col("cv")) /
          sqrt(col("nq") * col("nc")), 4).as("sim"))
    Similarity.rankTopK(scored, col("sim").desc_nulls_last, k)
  }

  /** Approximate top-k: probe the `nProbe` cells nearest to each query. */
  def topK(queries: DataFrame, corpus: DataFrame, idCol: String,
           vecCol: String, model: Model, k: Int,
           nProbe: Int = 2): DataFrame =
    Similarity.rankTopK(
      cellScored(queries, corpus, idCol, vecCol, model, nProbe,
        broadcastQueries = true),
      col("sim").desc_nulls_last, k)

  /** The shared probe/assign/score core of the cell-bounded family:
    * queries exploded over their nProbe nearest cells, corpus assigned
    * map-side, one cell equi join, exact cosine per surviving pair.
    * `broadcastQueries = true` is the probe-set shape (tiny query side
    * ships to every task); `false` shuffles BOTH sides on cell into a
    * co-partitioned hash join — mandatory when the query side is the
    * corpus itself. One body so the scoring contract (rounding grain,
    * null handling, self-exclusion) cannot drift between the gates
    * built on it. */
  private def cellScored(queries: DataFrame, corpus: DataFrame,
                         idCol: String, vecCol: String, model: Model,
                         nProbe: Int,
                         broadcastQueries: Boolean): DataFrame = {
    // query → its nProbe nearest cells (tiny cross with k literal cells)
    val probes = array_sort(
      transform(cellScores(col(vecCol), model),
        (s, i) => struct(s.as("d"), i.cast("int").as("cell"))))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm2(col(vecCol)).as("nq"),
      explode(slice(probes, 1, nProbe)).as("p"))
      .select(col("query_id"), col("qv"), col("nq"), col("p.cell").as("cell"))
    val c = Partitioning.spread(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        norm2(col(vecCol)).as("nc"),
        assign(col(vecCol), model).as("cell"))
    val joined =
      if (broadcastQueries) c.join(broadcast(q), Seq("cell"))
      else c.hint("shuffle_hash").join(q.hint("shuffle_hash"), Seq("cell"))
    joined
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")) /
          sqrt(col("nq") * col("nc")), 4).as("sim"))
  }

  /** Corpus×corpus k-NN JOIN: every vector is a query against the same
    * corpus, candidates bounded by the probed coarse cells — the
    * all-pairs neighbor-graph builder behind SemDeDup-style curation
    * and mutual-kNN clustering. Identical scoring contract to [[topK]],
    * but the query side is corpus-sized so it must NOT broadcast (topK
    * forces a query-side broadcast, correct only for small probe sets):
    * both sides shuffle on `cell` into a co-partitioned equi join, and
    * per-cell work is |cell|·nProbe·|cell| — the quantizer's k controls
    * the skew (at 100 TB, thousands of cells; fit k to keep cells
    * ~10⁴-10⁵ vectors). */
  def knnJoin(corpus: DataFrame, idCol: String, vecCol: String,
              model: Model, k: Int, nProbe: Int = 2): DataFrame =
    Similarity.rankTopK(
      cellScored(corpus, corpus, idCol, vecCol, model, nProbe,
        broadcastQueries = false),
      col("sim").desc_nulls_last, k)

  /** Mutual-kNN graph edges from [[knnJoin]]'s ranked list: (a, b) kept
    * iff each appears in the other's top-k — the symmetric neighbor
    * graph cluster curation builds on. The self-join runs over |C|·k
    * edge rows, never vectors. */
  def mutualKnn(corpus: DataFrame, idCol: String, vecCol: String,
                model: Model, k: Int, nProbe: Int = 2): DataFrame =
    mutualKnnOf(knnJoin(corpus, idCol, vecCol, model, k, nProbe)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** The mutuality self-join over an ALREADY-BUILT [[knnJoin]] ranked
    * list — split out so callers that compute the neighbor graph once
    * and feed several consumers (the graph itself, the mutual edges,
    * their connected components) can share one cached edge relation
    * instead of re-running the corpus×corpus join per consumer. The
    * caller owns `ranked`'s persistence: both sides of the self-join
    * scan it, so an unpersisted input computes the knn join twice. */
  def mutualKnnOf(ranked: DataFrame): DataFrame = {
    val e = ranked.select(col("query_id"), col("neighbor_id"))
    e.as("a").join(e.as("b"),
        col("a.query_id") === col("b.neighbor_id") &&
        col("a.neighbor_id") === col("b.query_id"))
      .filter(col("a.query_id") < col("a.neighbor_id"))
      .select(col("a.query_id").as("id_a"),
        col("a.neighbor_id").as("id_b"))
  }
}
