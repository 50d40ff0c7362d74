package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** `collect_set` with a hard size cap: the buffer never holds more than
  * `cap + 1` distinct values — one past the cap is kept only as the
  * saturation marker — and a saturated group evaluates to NULL.
  *
  * This is the aggregation-side half of a document-frequency guard
  * (Dedup.ngramJaccardPairs): filtering `size(collect_set(id)) <= maxDf`
  * AFTER the aggregate builds a |corpus|-sized array in a single
  * aggregation buffer for a boilerplate shingle (one hot task / executor
  * OOM at 100 TB) before dropping it; a second count-pass + semi-join
  * bounds the buffers but pays an extra shuffle and join. This keeps the
  * single-shuffle plan of the naive aggregate with the O(cap) buffers of
  * the two-pass plan.
  *
  * Order-independent by construction: a group saturates iff it has more
  * than `cap` distinct values, regardless of which `cap + 1` of them the
  * partial buffers happened to retain; an unsaturated group retains ALL
  * its values exactly. The result array is sorted ascending (what the
  * downstream pair generator expects).
  */
final case class CappedCollectSet(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashSet[Any]]
  with UnaryLike[Expression] {

  require(cap >= 1, s"capped_collect_set: cap must be >= 1, got $cap")

  override def prettyName: String = "graft_capped_collect_set"
  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | DateType | TimestampType |
         (_: DecimalType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: needs an orderable atomic input type, got ${other.sql}")
  }

  override def createAggregationBuffer(): mutable.HashSet[Any] =
    mutable.HashSet.empty

  override def update(buffer: mutable.HashSet[Any],
                      input: InternalRow): mutable.HashSet[Any] = {
    // size == cap + 1 ⇒ already saturated: skip the eval entirely
    if (buffer.size <= cap) {
      val v = child.eval(input)
      // copy: unsafe-row-backed values (UTF8String) are reused per row
      if (v != null) buffer += InternalRow.copyValue(v)
    }
    buffer
  }

  override def merge(buffer: mutable.HashSet[Any],
                     other: mutable.HashSet[Any]): mutable.HashSet[Any] = {
    val it = other.iterator
    while (buffer.size <= cap && it.hasNext) buffer += it.next()
    buffer
  }

  // hoisted: eval runs once per group — millions of shingle groups —
  // and the interpreted ordering is immutable for the expression
  @transient private lazy val ord =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def eval(buffer: mutable.HashSet[Any]): Any =
    if (buffer.size > cap) null
    else new GenericArrayData(buffer.toArray.sortWith(ord.lt))

  // partial→final shipping uses UnsafeArrayData bytes (the same compact
  // scheme Spark's own Collect aggregates use) — with millions of
  // shingle groups per partition, ObjectOutputStream per buffer was a
  // measurable fraction of the whole aggregation
  @transient private lazy val bufferProjection = UnsafeProjection.create(
    Array[DataType](ArrayType(child.dataType, containsNull = false)))
  @transient private lazy val row = new UnsafeRow(1)

  override def serialize(buffer: mutable.HashSet[Any]): Array[Byte] =
    bufferProjection(InternalRow(new GenericArrayData(buffer.toArray)))
      .getBytes

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Any] = {
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val out = mutable.HashSet.empty[Any]
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      out += InternalRow.copyValue(arr.get(i, child.dataType))
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(n: Int): CappedCollectSet =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CappedCollectSet =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(
      newChild: Expression): CappedCollectSet = copy(child = newChild)
}
