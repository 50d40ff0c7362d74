package graft.operators

import graft.SparkSpec
import graft.ddl.{DdlOp, DdlParser}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Value-conversion parity cases (reference tests/test_data_types.py,
  * tests/test_null_value_handling.py shapes, run against our column
  * expressions instead of a live MySQL→CH pipeline).
  */
class RecordConversionSpec extends SparkSpec {
  import spark.implicits._

  private def schemaOf(ddl: String,
                       overrides: Map[String, graft.types.MySqlType] = Map.empty) = {
    val DdlOp.CreateTable(_, s) = DdlParser.parse(ddl, overrides): @unchecked
    s
  }

  test("X1: unsigned fixup, all widths") {
    val df = Seq((-1L, -1L, -1L, -1L)).toDF("t", "s", "i", "b")
    val out = df.select(
      RecordConversion.unsignedFixup($"t", 1).as("t"),
      RecordConversion.unsignedFixup($"s", 2).as("s"),
      RecordConversion.unsignedFixup($"i", 4).as("i"),
      RecordConversion.unsignedFixup($"b", 8).as("b")).head()
    assert(out.getLong(0) === 255L)
    assert(out.getLong(1) === 65535L)
    assert(out.getLong(2) === 4294967295L)
    assert(out.getDecimal(3) === new java.math.BigDecimal("18446744073709551615"))
  }

  test("X4: enum decode — 1-based index, 0 empty, string passthrough") {
    val df = Seq("1", "3", "0", "HIGH", null).toDF("e")
    val vals = Seq("low", "medium", "high")
    val got = df.select(RecordConversion.enumDecode($"e", vals).as("v"))
      .collect().map(r => Option(r.getString(0)))
    assert(got === Array(Some("low"), Some("high"), Some(""), Some("high"), None))
  }

  test("X5: set decode — bitmask and string forms") {
    val df = Seq("5", "0", "a,c", null).toDF("s")
    val vals = Seq("a", "b", "c")
    val got = df.select(RecordConversion.setDecode($"s", vals).as("v"))
      .collect().map(r => Option(r.getString(0)))
    assert(got === Array(Some("a,c"), Some(""), Some("a,c"), None))
  }

  test("X3: latin1 decodes as cp1252, not ISO-8859-1 (converter.py:45)") {
    // 0x93/0x94 are curly quotes in Windows-1252 but C1 controls in true
    // ISO-8859-1 — MySQL's 'latin1' is cp1252, so the quotes must win;
    // 0xE9 is é in both. cp1251 maps 0xC0-0xFF to Cyrillic.
    val df = Seq(
      Tuple1(Array[Byte](0x93.toByte, 'h'.toByte, 'i'.toByte, 0x94.toByte,
        0xE9.toByte))).toDF("b")
    val got = df.select(
      RecordConversion.charsetDecode($"b", Some("latin1"), None).as("l1"),
      RecordConversion.charsetDecode($"b", None, Some("latin1")).as("tbl"),
      RecordConversion.charsetDecode(
        lit(Array[Byte](0xC4.toByte, 0xEE.toByte)), Some("cp1251"), None)
        .as("ru")).head()
    assert(got.getString(0) === "“hi”é")
    assert(got.getString(1) === "“hi”é") // table charset fallback
    assert(got.getString(2) === "До")         // cp1251 Cyrillic "До"
  }

  test("X9: year clamp [1901, 2155], 0 passes (converter.py:613-623)") {
    val df = Seq(1800, 1999, 2200, 0).toDF("y")
    val got = df.select(RecordConversion.yearClamp($"y").as("v"))
      .collect().map(_.getShort(0))
    assert(got === Array(1901.toShort, 1999.toShort, 2155.toShort, 0.toShort))
  }

  test("X2/X11: null defaults + zero-date sanitization for NOT NULL columns") {
    val schema = schemaOf(
      """CREATE TABLE t (id int NOT NULL, n int NOT NULL, s varchar(10) NOT NULL,
        |  d datetime NOT NULL, e enum('a','b') NOT NULL, PRIMARY KEY(id))""".stripMargin)
    val wire = Seq(("1", null, null, "0000-00-00 00:00:00", null))
      .toDF("id", "n", "s", "d", "e")
    val out = RecordConversion.convert(wire, schema).head()
    assert(out.getInt(1) === 0)              // int default
    assert(out.getString(2) === "")          // string default
    assert(out.getAs[java.time.LocalDateTime](3) ===
      java.time.LocalDateTime.of(1970, 1, 1, 0, 0, 0)) // zero-date → epoch
    assert(out.getString(4) === "a")         // first enum value
  }

  test("convert: aligns missing and extra columns by name (schema evolution)") {
    val schema = schemaOf(
      "CREATE TABLE t (id int NOT NULL, added varchar(5), PRIMARY KEY(id))")
    val wire = Seq(("7", "gone")).toDF("id", "dropped")
    val out = RecordConversion.convert(wire, schema)
    assert(out.columns.toSeq === Seq("id", "added"))
    val r = out.head()
    assert(r.getInt(0) === 7 && r.isNullAt(1))
  }

  test("X12: timestamp timezone attachment (mysql_api.py:144-154)") {
    val df = Seq("2023-06-01 12:00:00").toDF("ts")
    val got = df.select(RecordConversion.timestampToUtc(
      $"ts".cast(TimestampType), "Europe/Berlin").as("utc")).head()
    // 12:00 Berlin summer = 10:00 UTC (session tz is UTC)
    assert(got.getTimestamp(0) ===
      java.sql.Timestamp.valueOf("2023-06-01 10:00:00"))
  }

  test("full typed row through convert()") {
    // char(36) → UUID via types_mapping, like tests/tests_config.yaml
    val schema = schemaOf(
      """CREATE TABLE t (id bigint unsigned NOT NULL, price decimal(10,2),
        |  flag tinyint(1), tags set('x','y'), yr year, u char(36),
        |  PRIMARY KEY(id))""".stripMargin,
      Map("char(36)" -> graft.types.MySqlType.MUuid))
    val wire = Seq(("-1", "12.50", "1", "3", "2300", "ABC-DEF"))
      .toDF("id", "price", "flag", "tags", "yr", "u")
    val out = RecordConversion.convert(wire, schema)
    assert(out.schema("id").dataType === DecimalType(20, 0))
    val r = out.head()
    assert(r.getDecimal(0).toString === "18446744073709551615")
    assert(r.getDecimal(1) === new java.math.BigDecimal("12.50"))
    assert(r.getBoolean(2) === true)
    assert(r.getString(3) === "x,y")
    assert(r.getShort(4) === 2155.toShort)
    assert(r.getString(5) === "abc-def")
  }
}
