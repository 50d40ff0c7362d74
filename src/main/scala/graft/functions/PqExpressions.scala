package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization kernels.
  *
  * The expression-tree formulation of PQ scoring (one
  * `lit(‖cw‖²) − 2·vec_dot(slice(v,…), element_at(codebook, j))` branch
  * per (subspace, codeword)) is arithmetically right but builds
  * m·ksub ≈ 128 branches of ~12 nodes each — a ~700 KB physical plan
  * whose ANALYSIS is cheap but whose per-stage task binaries reach
  * 2+ MiB and whose generated code saturates JIT method limits; the
  * r13 optimization round measured the IVF-PQ gates spending ~3× the
  * runtime of the structurally identical IVF gate purely on that tree
  * (PlanTime: s_ann_ivf exec 0.26 s vs s_ann_ivfpq 1.1–1.5 s on a
  * 2 000-row corpus). These expressions collapse each scoring pass to
  * ONE node over the same doubles in the same order:
  *
  *  - score_j = ‖cw_j‖² − 2.0·(v_s·cw_j)                       (plain)
  *  - score_j = ‖cw_j‖² − 2.0·((v_s·cw_j) − (c_cell,s·cw_j))   (residual)
  *
  * with ‖cw‖² and the (cell × codeword) dot table `dcc` precomputed
  * driver-side EXACTLY as before (the SQL oracle embeds the identical
  * literals), and every fold running index-ascending from 0.0 — the
  * `vec_dot` contract — so results are bit-identical to the tree form.
  *
  * Null semantics replicate the tree form per subspace: a vector too
  * short for the subspace slice, a null element inside the slice, a
  * null vector, or a null cell id make that SUBSPACE's output element
  * null (the tree's `slice`/`vec_dot`/`element_at` null propagation);
  * the output array itself is never null.
  *
  * Model layout (flattened driver-side by [[graft.operators.Pq]]):
  *  - cents((s·ksub + j)·dsub + i) = codeword j of subspace s, dim i
  *  - norms(s·ksub + j)            = ‖cw_j‖² of subspace s (exact
  *    left-fold sum, as the tree's driver-side literal was)
  *  - dcc((s·kCoarse + cell)·ksub + j) = c_cell,s · cw_j (residual only)
  */
private[graft] final case class PqKernel(
    vec: Expression, cell: Option[Expression], lutSubspace: Option[Int],
    cents: Array[Double], norms: Array[Double], dcc: Array[Double],
    m: Int, dsub: Int, ksub: Int, kCoarse: Int)
    extends Expression with CodegenFallback with VecElementAccess {

  override def children: Seq[Expression] = vec +: cell.toSeq
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqKernel =
    copy(vec = newChildren.head, cell = cell.map(_ => newChildren(1)))

  override def prettyName: String =
    (if (lutSubspace.isDefined) "pq_lut" else "pq_codes") +
      (if (cell.isDefined) "_resid" else "")

  override def nullable: Boolean = false
  override def dataType: DataType =
    if (lutSubspace.isDefined) ArrayType(DoubleType, containsNull = true)
    else ArrayType(IntegerType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(vec.dataType, "vector") match {
      case TypeCheckResult.TypeCheckSuccess =>
        if (cell.forall(_.dataType == IntegerType))
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName: cell must be INT, got ${cell.get.dataType.sql}")
      case fail => fail
    }

  /** scores for subspace `s` into `out` (len ksub); false = the
    * subspace is null (short/null slice or null cell). */
  private def subspaceScores(v: ArrayData, n: Int, elem: DataType,
                             cellId: Int, s: Int,
                             out: Array[Double]): Boolean = {
    val base = s * dsub
    if (base + dsub > n) return false
    var i = 0
    while (i < dsub) {
      if (v.isNullAt(base + i)) return false
      i += 1
    }
    var j = 0
    while (j < ksub) {
      var acc = 0.0
      var i2 = 0
      val cb = (s * ksub + j) * dsub
      while (i2 < dsub) {
        acc += get(v, base + i2, elem) * cents(cb + i2)
        i2 += 1
      }
      out(j) =
        if (cell.isEmpty) norms(s * ksub + j) - 2.0 * acc
        else norms(s * ksub + j) -
          2.0 * (acc - dcc((s * kCoarse + cellId) * ksub + j))
      j += 1
    }
    true
  }

  override def eval(input: InternalRow): Any = {
    val vAny = vec.eval(input)
    val cellAny = cell.map(_.eval(input))
    val elem = elemKind(vec.dataType)
    val scores = new Array[Double](ksub)
    def nullsOf(k: Int) = new GenericArrayData(new Array[Any](k))
    lutSubspace match {
      case Some(s) =>
        if (vAny == null || cellAny.contains(null)) return nullsOf(ksub)
        val v = vAny.asInstanceOf[ArrayData]
        val cellId = cellAny.fold(0)(_.asInstanceOf[Int])
        if (!subspaceScores(v, v.numElements(), elem, cellId, s, scores))
          return nullsOf(ksub)
        val boxed = new Array[Any](ksub)
        var j = 0
        while (j < ksub) { boxed(j) = scores(j); j += 1 }
        new GenericArrayData(boxed)
      case None =>
        if (vAny == null || cellAny.contains(null)) return nullsOf(m)
        val v = vAny.asInstanceOf[ArrayData]
        val n = v.numElements()
        val cellId = cellAny.fold(0)(_.asInstanceOf[Int])
        val codes = new Array[Any](m)
        var s = 0
        while (s < m) {
          if (subspaceScores(v, n, elem, cellId, s, scores)) {
            // argmin, first index wins — array_position(sc, array_min(sc)).
            // Spark's double ordering ranks NaN above every value, so a
            // NaN best must yield to any non-NaN later score (plain `<`
            // is always false against NaN and would stick at the NaN).
            var best = scores(0)
            var bi = 0
            var j = 1
            while (j < ksub) {
              val sj = scores(j)
              if (sj < best || (best != best && sj == sj)) {
                best = sj; bi = j
              }
              j += 1
            }
            codes(s) = bi
          } // else: stays null, the tree form's null subspace element
          s += 1
        }
        new GenericArrayData(codes)
    }
  }
}

object PqKernel {

  /** Extract a flat double array from a foldable literal argument (the
    * registration-side twin of `typedlit[Seq[Double]]`). */
  private def doubles(e: Expression, what: String): Array[Double] = {
    require(e.foldable, s"graft_pq: $what must be a literal")
    e.eval(null) match {
      case a: ArrayData => a.toDoubleArray()
      case other => throw new IllegalArgumentException(
        s"graft_pq: $what must be array<double>, got $other")
    }
  }
  private def int(e: Expression, what: String): Int = {
    require(e.foldable, s"graft_pq: $what must be a literal")
    e.eval(null).asInstanceOf[Int]
  }

  /** graft_pq_codes(vec, cents, norms, m, dsub, ksub) */
  def codes(args: Seq[Expression]): Expression = {
    require(args.length == 6, "graft_pq_codes expects 6 arguments")
    PqKernel(args(0), None, None, doubles(args(1), "cents"),
      doubles(args(2), "norms"), Array.emptyDoubleArray,
      int(args(3), "m"), int(args(4), "dsub"), int(args(5), "ksub"), 0)
  }

  /** graft_pq_codes_resid(vec, cell, cents, norms, dcc, m, dsub, ksub, k) */
  def codesResid(args: Seq[Expression]): Expression = {
    require(args.length == 9, "graft_pq_codes_resid expects 9 arguments")
    PqKernel(args(0), Some(args(1)), None, doubles(args(2), "cents"),
      doubles(args(3), "norms"), doubles(args(4), "dcc"),
      int(args(5), "m"), int(args(6), "dsub"), int(args(7), "ksub"),
      int(args(8), "k"))
  }

  /** graft_pq_lut(vec, cents, norms, s, m, dsub, ksub) */
  def lut(args: Seq[Expression]): Expression = {
    require(args.length == 7, "graft_pq_lut expects 7 arguments")
    PqKernel(args(0), None, Some(int(args(3), "s")),
      doubles(args(1), "cents"), doubles(args(2), "norms"),
      Array.emptyDoubleArray,
      int(args(4), "m"), int(args(5), "dsub"), int(args(6), "ksub"), 0)
  }

  /** graft_pq_lut_resid(vec, cell, cents, norms, dcc, s, m, dsub, ksub, k) */
  def lutResid(args: Seq[Expression]): Expression = {
    require(args.length == 10, "graft_pq_lut_resid expects 10 arguments")
    PqKernel(args(0), Some(args(1)), Some(int(args(5), "s")),
      doubles(args(2), "cents"), doubles(args(3), "norms"),
      doubles(args(4), "dcc"),
      int(args(6), "m"), int(args(7), "dsub"), int(args(8), "ksub"),
      int(args(9), "k"))
  }
}
