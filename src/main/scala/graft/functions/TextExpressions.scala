package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-shingling primitives for the dedup operators.
  *
  * `Shingles` replaces the composable form
  * `array_distinct(filter(transform(sequence(...), i =>
  * array_join(slice(split(text), i, n))), _ != ''))` — six interpreted
  * higher-order passes allocating per position — with one pass over the
  * token array. Output is identical on any text with ≥ n tokens: distinct
  * word-n-grams joined by single spaces, first-occurrence order, empty
  * shingles dropped. (For texts with < n tokens this returns an empty
  * array, which also matches the DuckDB oracle's `len(t) >= n` guard.)
  *
  * `SortedIntersectCount` is `size(array_intersect(a, b))` for arrays
  * that are sorted and distinct (our per-doc shingle arrays): a merge
  * walk with zero allocation instead of building a hash set per pair —
  * the per-candidate-pair hot path of Jaccard verification. Both use
  * `UTF8String.compareTo` (binary order), the same ordering `array_sort`
  * applies to strings, so the walk agrees with the sort.
  */
final case class Shingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${other.sql}")
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any = {
    // same tokenization as split(text, " "): Java regex, trailing empties kept
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val out = new java.util.LinkedHashSet[UTF8String]
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      if (sb.length > 0) out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out.toArray(Array.empty[AnyRef]))
  }
}

/** 32-bit SimHash over distinct whitespace tokens, one pass per doc.
  *
  * Replaces the composable formulation — explode distinct tokens, md5,
  * 32 `sum(when(ascii(substring(h,i,1)) % 2 = 1, 1).otherwise(-1))`
  * aggregates, repack — with a per-row loop: no token explode through
  * the aggregate, no shuffle at all (the caller's projection is the
  * whole plan). Bit math is identical to the SQL oracle: bit i is set
  * when Σ over distinct tokens of ±1 (parity of hex digit i of
  * md5(token)) is > 0. Distinctness matches `array_distinct(split)`,
  * empty tokens included.
  */
final case class SimHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${other.sql}")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)

  @transient private lazy val digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val seen = new java.util.HashSet[String]
    val sums = new Array[Int](32)
    val md = digest.get()
    var t = 0
    while (t < toks.length) {
      if (seen.add(toks(t))) {
        md.reset()
        val h = md.digest(toks(t).getBytes(StandardCharsets.UTF_8))
        var i = 0
        while (i < 16) {
          val hi = hexChars((h(i) >> 4) & 0xf)
          val lo = hexChars(h(i) & 0xf)
          sums(2 * i) += (if ((hi.toInt & 1) == 1) 1 else -1)
          sums(2 * i + 1) += (if ((lo.toInt & 1) == 1) 1 else -1)
          i += 1
        }
      }
      t += 1
    }
    var acc = 0L
    var i = 0
    while (i < 32) {
      if (sums(i) > 0) acc |= 1L << i
      i += 1
    }
    acc
  }
}

/** |a ∩ b| for two sorted, distinct string arrays — a merge walk. Fully
  * codegen'd: this sits in the Jaccard join condition, where a
  * CodegenFallback would knock the whole join stage off codegen. */
final case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<string>, got ${l.sql}, ${r.sql}")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (av, bv) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (na, nb) = (av.numElements(), bv.numElements())
    var i = 0
    var j = 0
    var c = 0
    // null elements are skipped (an inferred array<string> schema often
    // carries containsNull=true even when no null ever appears; a null
    // here must not NPE the task)
    while (i < na && j < nb) {
      if (av.isNullAt(i)) i += 1
      else if (bv.isNullAt(j)) j += 1
      else {
        val cmp = av.getUTF8String(i).compareTo(bv.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, j, c, cmp) = (ctx.freshName("i"), ctx.freshName("j"),
        ctx.freshName("c"), ctx.freshName("cmp"))
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |    if ($cmp == 0) { $c++; $i++; $j++; }
         |    else if ($cmp < 0) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
}
