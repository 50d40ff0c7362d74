package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector arithmetic for embedding columns.
  *
  * The composable formulation — `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * — is correct but interpreted: Spark's higher-order functions are
  * CodegenFallback, so an ANN scan paying one dot product per
  * (query, candidate) pair allocates a boxed lambda frame per element.
  * These expressions generate a tight primitive loop instead (the hot
  * path of `Similarity.bruteForceTopK` / `lshTopK` / `nearDupPairs`) and
  * keep the exact semantics of the HOF form:
  *
  *  - double arithmetic, sequential fold in index order starting at 0.0
  *    (bit-for-bit identical to the SQL oracle's left-to-right sum);
  *  - mismatched lengths or a null element → null (zip_with pads the
  *    shorter side with null and `null * x` poisons the sum);
  *  - float or double element types, independently per side.
  */
trait VecElementAccess { self: Expression =>

  protected def elemKind(t: DataType): DataType =
    t.asInstanceOf[ArrayType].elementType

  protected def checkVec(t: DataType, side: String): TypeCheckResult = t match {
    case ArrayType(FloatType | DoubleType | ByteType | ShortType |
                   IntegerType | LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: $side must be an array of numeric primitives, " +
        s"got ${other.sql}")
  }

  protected def get(arr: ArrayData, i: Int, elem: DataType): Double =
    elem match {
      case FloatType => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case ByteType => arr.getByte(i).toDouble
      case ShortType => arr.getShort(i).toDouble
      case IntegerType => arr.getInt(i).toDouble
      case LongType => arr.getLong(i).toDouble
      case t => throw new IllegalStateException(s"unexpected element type $t")
    }

  protected def getCode(arr: String, i: String, elem: DataType): String =
    elem match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case ByteType => s"(double) $arr.getByte($i)"
      case ShortType => s"(double) $arr.getShort($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case LongType => s"(double) $arr.getLong($i)"
      case _ => s"$arr.getDouble($i)"
    }
}

/** Σᵢ aᵢ·bᵢ in double, sequential. */
final case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with VecElementAccess {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(left.dataType, "left") match {
      case TypeCheckResult.TypeCheckSuccess => checkVec(right.dataType, "right")
      case fail => fail
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (av, bv) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = av.numElements()
    if (bv.numElements() != n) return null
    val (le, re) = (elemKind(left.dataType), elemKind(right.dataType))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (av.isNullAt(i) || bv.isNullAt(i)) return null
      acc += get(av, i, le) * get(bv, i, re)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, acc) = (ctx.freshName("i"), ctx.freshName("acc"))
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${getCode(a, i, elemKind(left.dataType))}
         |          * ${getCode(b, i, elemKind(right.dataType))};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** Σᵢ aᵢ² in double, sequential. */
final case class VecNorm2(child: Expression)
    extends UnaryExpression with VecElementAccess {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_norm2"

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child.dataType, "input")

  override protected def withNewChildInternal(newChild: Expression): VecNorm2 =
    copy(child = newChild)

  override def nullSafeEval(a: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val elem = elemKind(child.dataType)
    var acc = 0.0
    var i = 0
    val n = av.numElements()
    while (i < n) {
      if (av.isNullAt(i)) return null
      val x = get(av, i, elem)
      acc += x * x
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (i, acc, x) =
        (ctx.freshName("i"), ctx.freshName("acc"), ctx.freshName("x"))
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $x = ${getCode(a, i, elemKind(child.dataType))};
         |  $acc += $x * $x;
         |}
         |if (!${ev.isNull}) ${ev.value} = $acc;
       """.stripMargin
    })
}
