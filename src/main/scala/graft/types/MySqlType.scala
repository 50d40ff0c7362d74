package graft.types

import org.apache.spark.sql.types._

/** The MySQL column-type algebra and its mapping onto Spark types.
  *
  * Re-expresses the reference's type-conversion switch
  * (reference: mysql_ch_replicator/converter.py:384-544) as an ADT +
  * total mapping function instead of string rewriting. The *target* here
  * is Spark's type system, so ClickHouse-specific encodings become their
  * Spark equivalents (SURVEY.md §1.2 table):
  *
  *  - unsigned ints widen one step (UInt32 → LongType, UInt64 →
  *    DecimalType(20,0)) instead of having unsigned variants,
  *  - enum/set decode to StringType with the value list kept in column
  *    Metadata,
  *  - geometry decodes to real struct/array types rather than WKB blobs,
  *  - MySQL `datetime` (zoneless) is TimestampNTZType, `timestamp`
  *    (UTC-normalized) is TimestampType.
  */
sealed trait MySqlType

object MySqlType {
  /** bytes ∈ {1,2,3,4,8} for tinyint/smallint/mediumint/int/bigint. */
  final case class MInt(bytes: Int, unsigned: Boolean) extends MySqlType
  case object MBool extends MySqlType
  final case class MDecimal(precision: Int, scale: Int) extends MySqlType
  /** Bare `decimal`/`numeric` keyword with no (p,s): the reference maps it
    * to Float64 (converter.py:502-503) — kept lossy for parity; the
    * fidelity decision is pinned in TypesSpec. */
  case object MDecimalBare extends MySqlType
  case object MFloat extends MySqlType
  case object MDouble extends MySqlType
  case object MDate extends MySqlType
  final case class MDateTime(fsp: Int) extends MySqlType
  final case class MTimestamp(fsp: Int) extends MySqlType
  case object MTime extends MySqlType
  case object MYear extends MySqlType
  /** includes char/varchar/tinytext/text/mediumtext/longtext */
  final case class MString(charset: Option[String]) extends MySqlType
  /** binary/varbinary/blob family. `fixedLength` is set for `binary(n)`,
    * whose values MySQL right-pads with NUL bytes to exactly n
    * (reference keeps the padding: tests/test_data_types.py:240-259). */
  final case class MBinary(fixedLength: Option[Int] = None) extends MySqlType
  final case class MBit(bits: Int) extends MySqlType
  case object MJson extends MySqlType
  final case class MEnum(values: Seq[String]) extends MySqlType
  final case class MSet(values: Seq[String]) extends MySqlType
  case object MPoint extends MySqlType
  case object MPolygon extends MySqlType
  case object MMultiPolygon extends MySqlType
  /** via user types_mapping, e.g. char(36) → UUID (canonical text). */
  case object MUuid extends MySqlType

  val pointStruct: StructType = StructType(Seq(
    StructField("x", FloatType, nullable = false),
    StructField("y", FloatType, nullable = false)))

  /** MySQL type → Spark type (SURVEY.md §1.2, converter.py:384-533). */
  def toSpark(t: MySqlType): DataType = t match {
    case MInt(1, false) => ByteType
    case MInt(1, true)  => ShortType
    case MInt(2, false) => ShortType
    case MInt(2, true)  => IntegerType
    case MInt(3, _)     => IntegerType // mediumint fits int32 even unsigned
    case MInt(4, false) => IntegerType
    case MInt(4, true)  => LongType
    case MInt(8, false) => LongType
    case MInt(8, true)  => DecimalType(20, 0) // UInt64 exceeds long
    case MInt(b, _)     => throw new IllegalArgumentException(s"int bytes $b")
    case MBool          => BooleanType
    case MDecimal(p, 0) if p <= 9  => IntegerType  // converter.py:401-436
    case MDecimal(p, 0) if p <= 18 => LongType
    case MDecimal(p, s) =>
      // MySQL DECIMAL precision reaches 65; Spark caps at 38. Keep the
      // integer digits (losing those corrupts magnitudes silently) and
      // sacrifice scale — the same policy Spark's JDBC dialects apply.
      if (p <= 38) DecimalType(p, s)
      else DecimalType(38, math.min(s, math.max(0, 38 - (p - s))))
    case MDecimalBare   => DoubleType
    case MFloat         => FloatType
    case MDouble        => DoubleType
    case MDate          => DateType
    case MDateTime(_)   => TimestampNTZType
    case MTimestamp(_)  => TimestampType
    case MTime          => StringType // stringified interval, converter.py:588
    case MYear          => ShortType  // clamped [1901,2155], converter.py:613
    case MString(_)     => StringType
    case MBinary(_)     => BinaryType
    case MBit(1)        => BooleanType
    case MBit(_)        => LongType
    case MJson          => StringType
    case MEnum(_)       => StringType
    case MSet(_)        => StringType
    case MPoint         => pointStruct
    case MPolygon       => ArrayType(pointStruct, containsNull = false)
    case MMultiPolygon  => ArrayType(ArrayType(pointStruct, containsNull = false), containsNull = false)
    case MUuid          => StringType
  }

  /** Column Metadata carrying what Spark's type lattice can't: the source
    * MySQL type text, enum/set value lists (1-based order!), charset.
    */
  def metadata(t: MySqlType, sourceType: String): Metadata = {
    val b = new MetadataBuilder().putString("mysqlType", sourceType)
    t match {
      case MEnum(vs) => b.putStringArray("enumValues", vs.toArray)
      case MSet(vs)  => b.putStringArray("setValues", vs.toArray)
      case MString(Some(cs)) => b.putString("charset", cs)
      case _ => ()
    }
    b.build()
  }
}
