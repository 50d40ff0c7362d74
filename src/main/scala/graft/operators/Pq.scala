package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Product quantization — the code-compression half of the IVF-PQ ANN
  * recipe, and the piece that makes billion-vector search tractable: a
  * d-dim float vector (256 B at d=64) becomes `m` small codes (m bytes),
  * so the scored corpus fits in a fraction of the memory and the
  * per-candidate cost is `m` table lookups instead of a d-term dot.
  *
  * Production shape at 100 TB:
  *  - [[fit]] trains an independent k-means per subspace on a bounded
  *    sample (same driver-side recipe as [[Ivf.fit]] — the codebook is
  *    m·ksub·dsub doubles, a few KB);
  *  - [[encode]] is one map-only codegen'd pass (argmin per subspace
  *    over literal centroids — no shuffle, no UDF), run once at ingest
  *    and persisted next to the vectors;
  *  - [[adcTopK]] scores queries against CODES only (asymmetric distance
  *    computation): each query computes one m×ksub lookup table against
  *    the literal codebook, broadcasts it, and every candidate costs m
  *    array lookups + an (m−1)-add fold. The corpus-side scan never
  *    touches a float vector.
  *
  * Determinism mirrors [[Ivf]]: frozen sampled init, fixed iterations,
  * 6-decimal centroid rounding, and every dot/fold evaluated
  * left-to-right — so the fitted codebook can be frozen into a SQL
  * oracle that replays encode + ADC bit-for-bit.
  */
object Pq {

  /** centroids(s)(j) = the j-th codeword of subspace `s` (dsub dims). */
  final case class Model(dsub: Int,
                         centroids: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]) {
    def m: Int = centroids.length
    def ksub: Int = centroids.head.length
  }

  import Similarity.dot

  /** Model literals for the native [[graft.functions.PqKernel]]
    * scoring expressions: flattened codebook
    * (cents((s·ksub + j)·dsub + i)) and the per-codeword ‖cw‖² table
    * (norms(s·ksub + j)), the latter summed with the EXACT fold the
    * old per-branch `lit(….map(x => x*x).sum)` literals used — the SQL
    * oracle embeds the same values. */
  private def centsLit(model: Model): Column =
    typedlit[Seq[Double]](for {
      s <- 0 until model.m; j <- 0 until model.ksub
      i <- 0 until model.dsub
    } yield model.centroids(s)(j)(i))
  private def normsLit(model: Model): Column =
    typedlit[Seq[Double]](for { s <- 0 until model.m; j <- 0 until model.ksub }
      yield model.centroids(s)(j).map(x => x * x).sum)
  private def dccLit(dcc: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
                     model: Model, k: Int): Column =
    typedlit[Seq[Double]](for {
      s <- 0 until model.m; cell <- 0 until k; j <- 0 until model.ksub
    } yield dcc(s)(cell)(j))

  /** Distance scores of a vector's subspace `s` against that subspace's
    * codebook: score_j = |c_j|² − 2·v_s·c_j (the |v_s|² term is constant
    * per row/subspace and drops from both argmin and ranking SUMS —
    * constant per query across candidates). One native kernel node —
    * the expression-tree form built m·ksub dot branches whose plan
    * weight dominated the gates' runtime (see PqKernel doc). */
  private def subScores(v: Column, s: Int, model: Model): Column =
    call_function("graft_pq_lut", v, centsLit(model), normsLit(model),
      lit(s), lit(model.m), lit(model.dsub), lit(model.ksub))

  /** PQ code array (m small ints) for a vector column — map-only,
    * one native kernel node, first index wins ties. */
  def encode(v: Column, model: Model): Column =
    call_function("graft_pq_codes", v, centsLit(model), normsLit(model),
      lit(model.m), lit(model.dsub), lit(model.ksub))

  /** Distance scores of the RESIDUAL `(v − coarseCentroid(cell))`'s
    * subspace `s` against the codebook, without materializing the
    * residual array: distribute the dot —
    * `(v−c)_s·cw = v_s·cw − c_s·cw` — and precompute every `c_s·cw`
    * driver-side into one (k × ksub) literal table per subspace. The
    * scan stays codegen'd (slice + VecDot + two element_at), and the
    * SQL oracle mirrors the exact double ops term for term (an
    * elementwise-subtract-then-dot would be a DIFFERENT float fold).
    * Score_j = |cw_j|² − 2·((v_s·cw_j) − dcc[cell][j]); the
    * |(v−c)_s|² term is constant per (row, cell) and drops from both
    * the encode argmin and — once [[ivfAdcTopK]] re-adds the coarse
    * ‖q−c‖² term — the cross-cell ranking. */
  private def residSubScores(v: Column, cellCol: Column, s: Int,
                             dcc: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
                             model: Model): Column =
    call_function("graft_pq_lut_resid", v, cellCol.cast("int"),
      centsLit(model), normsLit(model), dccLit(dcc, model, dcc(0).length),
      lit(s), lit(model.m), lit(model.dsub), lit(model.ksub),
      lit(dcc(0).length))

  /** Driver-side twin of [[residSubScores]]'s dcc table, shared with the
    * SQL-oracle generator so both engines embed the same literals. */
  def dccTable(coarse: Ivf.Model, model: Model): IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
    (0 until model.m).map { s =>
      val base = s * model.dsub
      coarse.centroids.map { cc =>
        model.centroids(s).map { cw =>
          var acc = 0.0
          var i = 0
          while (i < model.dsub) { acc += cc(base + i) * cw(i); i += 1 }
          math.rint(acc * 1e9) / 1e9
        }
      }
    }

  /** Residual PQ codes for a vector already assigned to `cellCol` —
    * map-only and codegen'd like [[encode]], but quantizing
    * `v − coarseCentroid(cell)` (via the distributed-dot form, no
    * residual array in the scan). */
  def encodeResidual(v: Column, cellCol: Column, coarse: Ivf.Model,
                     model: Model): Column = {
    // dcc computed ONCE for all m subspaces — per-subspace recomputation
    // is O(m²) driver work at plan-build time (m·k·ksub·dsub each)
    val dcc = dccTable(coarse, model)
    call_function("graft_pq_codes_resid", v, cellCol.cast("int"),
      centsLit(model), normsLit(model), dccLit(dcc, model, coarse.k),
      lit(model.m), lit(model.dsub), lit(model.ksub), lit(coarse.k))
  }

  /** Train one k-means codebook per subspace — all `m` subspaces JOINTLY,
    * one Spark job per iteration. Running [[Ivf.fit]] per subspace is
    * semantically identical but launches m·(iters+1) small jobs whose
    * fixed scheduling cost dominates at any scale; here the exploded
    * (subspace, subvector) table carries every subspace through the same
    * assignment pass, and one (s, cell, pos) aggregation updates all
    * codebooks (m·ksub·dsub rows to the driver — a few KB).
    * Same determinism contract as [[Ivf.fit]]: hash-prefix sample
    * ([[Ivf.hashSample]] — order-independent, unlike first-rows), init =
    * subvectors of the farthest-point seeds over the same sample, fixed
    * iterations, 6-decimal centroid rounding. */
  def fit(vecs: DataFrame, idCol: String, vecCol: String, m: Int, ksub: Int,
          iters: Int = 3, sample: Int = 10000): Model = {
    // dim probe over non-null vectors only: a null first row would NPE
    // before training starts, and an empty corpus should say so. From
    // the minimum-id row — an unordered limit(1) is partition-layout-
    // dependent, and on a mixed-dimension corpus the probed dim decides
    // which rows train (the any-layout determinism contract)
    val dimRow = vecs.filter(col(vecCol).isNotNull)
      .orderBy(col(idCol)).select(size(col(vecCol))).limit(1).collect()
    require(dimRow.nonEmpty, "Pq.fit: no non-null vectors to train on")
    val dim = dimRow.head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val sampled = Ivf.hashSample(vecs, idCol, vecCol, sample)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // derived per iteration from the cached sample — the explode is a
    // cheap map over cached rows, not a second corpus scan
    val sub = sampled
      .select(explode(array((0 until m).map(s =>
        struct(lit(s).as("s"),
          slice(col(vecCol), s * dsub + 1, dsub).as("sv"))): _*)).as("e"))
      .select(col("e.s").as("s"), col("e.sv").as("sv"))
      // drop ragged/null subvectors here, like Ivf.fit's null-cell skip
      .filter(col("sv").isNotNull && size(col("sv")) === dsub)
    try {
      val initRows = Ivf.seedVectors(sampled, vecCol, ksub)
      var centroids: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
        (0 until m).map(s => initRows.map(v =>
          v.slice(s * dsub, (s + 1) * dsub)))
      for (_ <- 0 until iters) {
        val cents = typedlit[Seq[Seq[Seq[Double]]]](
          centroids.map(_.map(_.toSeq).toSeq).toSeq)
        val norms = typedlit[Seq[Seq[Double]]](
          centroids.map(_.map(_.map(x => x * x).sum).toSeq).toSeq)
        val scores = array((0 until ksub).map(j =>
          element_at(element_at(norms, col("s") + 1), j + 1) -
            lit(2.0) * dot(col("sv"),
              element_at(element_at(cents, col("s") + 1), j + 1))): _*)
        val means = sub
          .select(col("s"),
            (array_position(scores, array_min(scores)) - 1).cast("int")
              .as("cell"),
            posexplode(col("sv")).as(Seq("pos", "x")))
          .groupBy("s", "cell", "pos")
          .agg(avg(col("x").cast("double")).as("mn"))
          .collect()
          .groupBy(r => (r.getInt(0), r.getInt(1)))
          .map { case (key, rows) =>
            key -> rows.sortBy(_.getInt(2))
              .map(r => math.rint(r.getDouble(3) * 1e6) / 1e6).toIndexedSeq
          }
        centroids = centroids.indices.map(s =>
          centroids(s).indices.map(j =>
            means.getOrElse((s, j), centroids(s)(j))))
      }
      Model(dsub, centroids)
    } finally sampled.unpersist(blocking = false)
  }

  /** Train the PQ codebook on coarse-cell RESIDUALS — the classic IVFADC
    * recipe (Jégou et al., "Product quantization for nearest neighbor
    * search", TPAMI 2011): within a cell, raw vectors all sit near the
    * cell centroid, so a codebook trained on raw vectors spends its
    * dynamic range re-describing the centroid (measured here: recall@3
    * of the raw-ADC ranking was 0.033 before this change). Training on
    * `v − centroid(assign(v))` centers every cell's population at the
    * origin and the codes describe only the within-cell offset.
    * Same determinism contract as [[fit]] (the residual transform is a
    * deterministic function of the frozen coarse model). */
  def fitResidual(vecs: DataFrame, idCol: String, vecCol: String,
                  coarse: Ivf.Model, m: Int, ksub: Int,
                  iters: Int = 3, sample: Int = 10000): Model =
    fit(vecs.select(col(idCol),
        Ivf.residual(col(vecCol), coarse).as(vecCol)),
      idCol, vecCol, m, ksub, iters, sample)

  /** IVF-PQ (IVFADC): the production billion-vector composition — the
    * coarse quantizer restricts candidates to the query's `nProbe` cells
    * (an EQUI join on the cell id, no nested loop), and within a cell
    * the ranking is the codes-only ADC sum over RESIDUAL codes (`model`
    * must come from [[fitResidual]] with the same `coarse`).
    *
    * Residual scoring changes two things vs the naive composition:
    *  - the query LUTs are per (query, PROBED CELL) — they score
    *    `q − c_cell` against the codebook, so they're computed after the
    *    probe explode (×nProbe work on the broadcast side only);
    *  - the ADC sum alone is no longer comparable ACROSS cells (each
    *    cell's LUTs dropped a different `‖q−c_cell‖²`), so the score
    *    re-adds the coarse term `‖c‖² − 2·q·c` — exactly the probe
    *    ordering score already computed, carried through the explode as
    *    `ct`. (`‖q‖²` is constant per query and still drops.)
    *
    * The corpus representation is (cell, m codes) per vector: both
    * assignments remain one map-only codegen'd pass at ingest. */
  def ivfAdcTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                 vecCol: String, coarse: Ivf.Model, model: Model, k: Int,
                 nProbe: Int = 2): DataFrame = {
    val codes = Partitioning.spread(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("v"),
        Ivf.assign(col(vecCol), coarse).as("cell"))
      .select(col("neighbor_id"), col("cell"),
        encodeResidual(col("v"), col("cell"), coarse, model).as("codes"))
    val probes = array_sort(
      transform(Ivf.cellScores(col(vecCol), coarse),
        (s, i) => struct(s.as("d"), i.cast("int").as("cell"))))
    val dcc = dccTable(coarse, model) // once, not once per subspace
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        explode(slice(probes, 1, nProbe)).as("p"))
      .select(col("query_id") +: col("p.cell").as("cell") +:
        col("p.d").as("ct") +:
        (0 until model.m).map(s =>
          residSubScores(col("qv"), col("p.cell"), s, dcc, model)
            .as(s"l$s")): _*)
    // ((ct + l0[..]) + l1[..]) + … — the SQL oracle's left-assoc sum
    val score = (col("ct") +: (0 until model.m).map(s =>
      element_at(col(s"l$s"), element_at(col("codes"), s + 1) + 1)))
      .reduce(_ + _)
    val scored = codes.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(score, 4).as("adist"))
    Similarity.rankTopK(scored, col("adist").asc_nulls_last, k)
  }

  /** IVF-PQ with exact re-rank — the production billion-vector recipe
    * completed: the ADC cell scan (codes only, m bytes/vector) nominates
    * a per-query `shortlist`, and ONLY those (query, candidate) pairs
    * fetch float vectors for an exact cosine re-rank. The corpus scan
    * stays code-compressed and never shuffles — the tiny shortlist
    * (|Q|·shortlist ids) broadcasts INTO the corpus scan to surface
    * vectors — so recall becomes shortlist-limited instead of
    * quantization-limited at the cost of one broadcast join. With
    * residual (IVFADC) codes the shortlist absorbs far less error than
    * it did over raw-vector codes — the raw ADC ranking is already
    * probe-bound — but the exact re-rank still fixes the within-
    * shortlist order for free. */
  def ivfAdcRerankTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                       vecCol: String, coarse: Ivf.Model, model: Model,
                       k: Int, nProbe: Int = 2,
                       shortlist: Int = 10): DataFrame = {
    import Similarity.norm2
    val short = ivfAdcTopK(queries, corpus, idCol, vecCol, coarse, model,
      shortlist, nProbe).select("query_id", "neighbor_id")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm2(col(vecCol)).as("nq"))
    val c = Partitioning.spread(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        norm2(col(vecCol)).as("nc"))
    val scored = c.join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")) /
          sqrt(col("nq") * col("nc")), 4).as("sim"))
    Similarity.rankTopK(scored, col("sim").desc_nulls_last, k)
  }

  /** Asymmetric-distance top-k: rank candidates by Σ_s lut_s[code_s]
    * (smaller = nearer). The per-query LUTs broadcast (m·ksub doubles
    * per query); the candidate side carries only (id, codes), so the
    * scan is the PQ-compressed corpus — the whole point. The join is a
    * broadcast nested loop BY DESIGN: ADC scores every code row against
    * every query, and the work per pair is m lookups, not a d-dot. */
  def adcTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, model: Model, k: Int): DataFrame = {
    val codes = Partitioning.spread(corpus)
      .select(col(idCol).as("neighbor_id"), encode(col(vecCol), model).as("codes"))
    val lutCols = (0 until model.m).map(s =>
      subScores(col(vecCol), s, model).as(s"l$s"))
    val q = queries.select(col(idCol).as("query_id") +: lutCols: _*)
    // left-assoc (+) fold, mirrored term-for-term by the SQL oracle
    val score = (0 until model.m).map(s =>
      element_at(col(s"l$s"), element_at(col("codes"), s + 1) + 1))
      .reduce(_ + _)
    val scored = codes.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(score, 4).as("adist"))
    Similarity.rankTopK(scored, col("adist").asc_nulls_last, k)
  }
}
