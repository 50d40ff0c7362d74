package graft.types

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import MySqlType._

/** Type-mapping parity cases from SURVEY.md §1.2 (converter.py:384-544). */
class TypeParserSpec extends AnyFunSuite {

  private def spark(t: String): DataType =
    MySqlType.toSpark(TypeParser.parse(t).tpe)

  test("integer family, signed and unsigned") {
    assert(spark("tinyint") === ByteType)
    assert(spark("tinyint unsigned") === ShortType)
    assert(spark("smallint") === ShortType)
    assert(spark("smallint unsigned") === IntegerType)
    assert(spark("mediumint") === IntegerType)
    assert(spark("mediumint unsigned") === IntegerType)
    assert(spark("int") === IntegerType)
    assert(spark("int(11)") === IntegerType)
    assert(spark("INT(10) UNSIGNED") === LongType)
    assert(spark("integer") === IntegerType)
    assert(spark("bigint") === LongType)
    assert(spark("bigint unsigned") === DecimalType(20, 0))
  }

  test("boolean forms: tinyint(1), bit(1), bool") {
    assert(spark("tinyint(1)") === BooleanType)
    assert(spark("bit(1)") === BooleanType)
    assert(spark("bool") === BooleanType)
    assert(spark("boolean") === BooleanType)
    assert(spark("bit(17)") === LongType)
  }

  test("numeric/decimal rules (converter.py:401-436)") {
    assert(spark("numeric(8,0)") === IntegerType)
    assert(spark("numeric(18,0)") === LongType)
    assert(spark("numeric(19,0)") === DecimalType(19, 0))
    assert(spark("decimal(10,2)") === DecimalType(10, 2))
    assert(spark("decimal(10)") === LongType)
    // bare `decimal` keyword is lossy Float64 in the reference
    // (converter.py:502-503) — parity decision: keep DoubleType.
    assert(spark("decimal") === DoubleType)
  }

  test("float/double/real") {
    assert(spark("float") === FloatType)
    assert(spark("float(10,2)") === FloatType)
    assert(spark("double") === DoubleType)
    assert(spark("double precision") === DoubleType)
    assert(spark("real") === DoubleType)
  }

  test("temporal types") {
    assert(spark("date") === DateType)
    assert(spark("datetime") === TimestampNTZType)
    assert(spark("datetime(6)") === TimestampNTZType)
    assert(spark("timestamp") === TimestampType)
    assert(spark("timestamp(3)") === TimestampType)
    assert(spark("time") === StringType)
    assert(spark("year") === ShortType)
  }

  test("strings, binary, json") {
    assert(spark("char(36)") === StringType)
    assert(spark("varchar(255)") === StringType)
    assert(spark("longtext") === StringType)
    assert(spark("binary(16)") === BinaryType)
    assert(spark("varbinary(32)") === BinaryType)
    assert(spark("blob") === BinaryType)
    assert(spark("mediumblob") === BinaryType)
    assert(spark("json") === StringType)
  }

  test("enum/set with quote-aware values (enum/parser.py cases)") {
    val e = TypeParser.parse("enum('Low','MEDIUM','high')").tpe
    assert(e === MEnum(Seq("low", "medium", "high"))) // lowercased
    val withComma = TypeParser.parse("enum('a,b','c')").tpe
    assert(withComma === MEnum(Seq("a,b", "c")))
    val escaped = TypeParser.parse("enum('it''s','back\\'slash')").tpe
    assert(escaped === MEnum(Seq("it's", "back'slash")))
    val s = TypeParser.parse("set('x','y','z')").tpe
    assert(s === MSet(Seq("x", "y", "z")))
    assert(spark("enum('a','b')") === StringType)
  }

  test("geometry") {
    assert(spark("point") === MySqlType.pointStruct)
    assert(spark("polygon") === ArrayType(MySqlType.pointStruct, containsNull = false))
    assert(spark("multipolygon") ===
      ArrayType(ArrayType(MySqlType.pointStruct, containsNull = false), containsNull = false))
  }

  test("types_mapping override wins (converter.py:387-389)") {
    val p = TypeParser.parse("char(36)", Map("char(36)" -> MUuid))
    assert(p.tpe === MUuid)
    assert(MySqlType.toSpark(p.tpe) === StringType)
  }

  test("unknown type errors") {
    assertThrows[IllegalArgumentException](TypeParser.parse("frobnicate"))
  }
}
