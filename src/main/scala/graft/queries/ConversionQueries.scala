package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Wkb
import graft.operators.RecordConversion

/** The scalar conversion layer (SURVEY.md §2.8, X1-X12) exercised through
  * the DuckDB gate: each X-function applied to columns derived from the
  * fixtures, with an exact SQL twin. (The full wire-row path, including
  * non-SQL-expressible pieces, is covered in ScalaTest —
  * RecordConversionSpec.)
  */
object ConversionQueries {

  val defs: Map[String, QueryFn] = Map(
    // X1 unsigned fixup, X4 enum decode, X5 set decode, X9 year clamp,
    // X10 uuid canonicalization — one scan, all codegen'd expressions.
    "conv_scalar_suite" -> { (s, dir) =>
      val enumVals = Seq("low", "medium", "high")
      val setVals = Seq("a", "b", "c")
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (pmod(col("l_partkey"), lit(200)) - 100).as("signed"),
          pmod(col("l_linenumber"), lit(4)).cast("string").as("eidx"),
          pmod(col("l_suppkey"), lit(8)).cast("string").as("mask"),
          (lit(1880) + pmod(col("l_partkey"), lit(300))).as("rawyr"),
          col("l_returnflag"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          RecordConversion.unsignedFixup(col("signed"), 4).cast("long").as("unsigned_fixed"),
          RecordConversion.enumDecode(col("eidx"), enumVals).as("enum_label"),
          RecordConversion.setDecode(col("mask"), setVals).as("set_labels"),
          RecordConversion.yearClamp(col("rawyr")).cast("int").as("yr"),
          RecordConversion.uuidCanonical(col("l_returnflag")).as("uuid_canon"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // X6 WKB geometry decode — the one custom Catalyst expression family,
    // under the oracle gate via deterministic hex fixtures (MySQL's
    // internal SRID-prefixed layout and bare WKB, both endiannesses;
    // holes skipped per converter.py:138-271). The oracle is the
    // literal expected geometry.
    "conv_wkb_decode" -> { (s, _) =>
      import s.implicits._
      def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
      val outer3 = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0))
      val hole3 = Seq((1.0, 1.0), (2.0, 1.0), (1.0, 1.0))
      val p40 = Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0))
      val p41 = Seq((5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 5.0))
      val h41 = Seq((5.25, 5.25), (5.5, 5.25), (5.25, 5.25))
      val rows = Seq(
        (1, "point", hex(Wkb.encodePoint(1.5, 2.5))), // bare little-endian
        (2, "point", hex(Wkb.encodePoint(-3.25, 7.0, little = false,
          srid = Some(0)))), // big-endian, MySQL SRID header
        (3, "polygon", hex(Wkb.encodePolygon(Seq(outer3, hole3),
          srid = Some(0)))),
        (4, "multipolygon", hex(Wkb.encodeMultiPolygon(
          Seq(Seq(p40), Seq(p41, h41)), srid = Some(0)))))
      val df = rows.toDF("gid", "kind", "hexwkb")
        .withColumn("wkb", unhex(col("hexwkb")))
      val pts = df.filter(col("kind") === "point").select(
        col("gid"), lit(0).as("poly"), lit(0).as("idx"),
        Wkb.decodePoint(col("wkb")).getField("x").cast("double").as("x"),
        Wkb.decodePoint(col("wkb")).getField("y").cast("double").as("y"))
      val poly = df.filter(col("kind") === "polygon")
        .select(col("gid"),
          posexplode(Wkb.decodePolygon(col("wkb"))).as(Seq("idx", "pt")))
        .select(col("gid"), lit(0).as("poly"), col("idx"),
          col("pt.x").cast("double").as("x"),
          col("pt.y").cast("double").as("y"))
      val multi = df.filter(col("kind") === "multipolygon")
        .select(col("gid"),
          posexplode(Wkb.decodeMultiPolygon(col("wkb")))
            .as(Seq("poly", "ring")))
        .select(col("gid"), col("poly"),
          posexplode(col("ring")).as(Seq("idx", "pt")))
        .select(col("gid"), col("poly"), col("idx"),
          col("pt.x").cast("double").as("x"),
          col("pt.y").cast("double").as("y"))
      pts.unionByName(poly).unionByName(multi)
        .orderBy("gid", "poly", "idx")
    },

    // S6 — REAL MySQL binary-JSON (JSONB) decode under the gate: per
    // document a JSONB tree with every scalar type (auto-sized
    // int16/int32/int64, uint64 above Long.MaxValue, double, literals,
    // 2-byte-varlen strings), a nested object/array, and — every 20th
    // id — a filler array forcing the 4-byte LARGE container layout.
    // Encoded to real JSONB bytes, decoded back through the tree walk,
    // rendered canonical; the oracle rebuilds the exact text by string
    // arithmetic (HUGEINT for the unsigned 64-bit tail) and compares
    // its md5, so an offset slip, an inline/offset confusion, or a
    // small/large misselection diverges the hash. `was_large` pins the
    // format-selection rule itself.
    "conv_jsonb_decode" -> { (s, _2) =>
      import s.implicits._
      t(s, _2, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val (text, wasLarge) = graft.sources.BinlogFixture.jsonbGateDoc(id)
          (id, text, wasLarge)
        }
        .toDF("doc_id", "js_text", "was_large")
        .select(col("doc_id"), length(col("js_text")).as("text_len"),
          md5(col("js_text").cast("binary")).as("text_md5"),
          col("was_large"))
        .orderBy("doc_id")
    })

  val oracles: Map[String, String] = Map(
    // rebuilds the canonical JSONB text per document and hashes it:
    // keys in MySQL storage order (length, then bytes), doubles as
    // halves (shortest-round-trip-stable in both engines), u64 via
    // HUGEINT arithmetic
    "conv_jsonb_decode" ->
      """WITH j AS (SELECT doc_id, '{' ||
        |  CASE WHEN doc_id % 20 = 0 THEN '"big":[' ||
        |    array_to_string(list_transform(range(230), i -> '"' ||
        |      array_to_string(list_transform(range(300),
        |        j2 -> chr(CAST(97 + (doc_id + i + j2) % 26 AS INT))), '')
        |      || '"'), ',') || '],' ELSE '' END ||
        |  '"dbl":' || CAST((doc_id % 1000) / 2.0 AS VARCHAR) ||
        |  ',"i16":' || (doc_id % 30000 - 15000) ||
        |  ',"i32":' || ((doc_id * 98765) % 2000000000 - 1000000000) ||
        |  ',"i64":' || (doc_id * 1000000007 + 3000000000) ||
        |  ',"lit":' || (CASE doc_id % 3 WHEN 0 THEN 'true'
        |    WHEN 1 THEN 'false' ELSE 'null' END) ||
        |  ',"obj":{"k":' || (doc_id % 10) || ',"m":[' || (doc_id % 4) ||
        |    ',"z' || (doc_id % 6) || '"]}' ||
        |  ',"str":"' || array_to_string(list_transform(
        |    range(100 + doc_id % 200),
        |    j2 -> chr(CAST(97 + (doc_id + 2*j2) % 26 AS INT))), '') || '"' ||
        |  ',"u64":' || CAST(CAST(9223372036854775807 AS HUGEINT) + 1
        |    + doc_id % 100 AS VARCHAR) ||
        |  '}' AS text FROM documents)
        |SELECT doc_id, CAST(length(text) AS INT) AS text_len,
        |  md5(text) AS text_md5,
        |  doc_id % 20 = 0 AS was_large
        |FROM j ORDER BY doc_id""".stripMargin,
    "conv_scalar_suite" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CASE WHEN signed < 0 THEN signed + 4294967296 ELSE signed END AS BIGINT)
        |    AS unsigned_fixed,
        |  CASE WHEN eidx = 0 THEN ''
        |       ELSE (['low','medium','high'])[eidx] END AS enum_label,
        |  concat_ws(',',
        |    CASE WHEN mask & 1 <> 0 THEN 'a' END,
        |    CASE WHEN mask & 2 <> 0 THEN 'b' END,
        |    CASE WHEN mask & 4 <> 0 THEN 'c' END) AS set_labels,
        |  CAST(CASE WHEN rawyr = 0 THEN 0
        |       ELSE GREATEST(LEAST(rawyr, 2155), 1901) END AS INT) AS yr,
        |  lower(trim(l_returnflag)) AS uuid_canon
        |FROM (
        |  SELECT l_orderkey, l_linenumber, l_returnflag,
        |    (l_partkey % 200) - 100 AS signed,
        |    l_linenumber % 4 AS eidx,
        |    l_suppkey % 8 AS mask,
        |    1880 + (l_partkey % 300) AS rawyr
        |  FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "conv_wkb_decode" ->
      """SELECT CAST(c1 AS INT) AS gid, CAST(c2 AS INT) AS poly,
        |  CAST(c3 AS INT) AS idx, CAST(c4 AS DOUBLE) AS x,
        |  CAST(c5 AS DOUBLE) AS y
        |FROM (VALUES
        |  (1, 0, 0, 1.5, 2.5),
        |  (2, 0, 0, -3.25, 7.0),
        |  (3, 0, 0, 0.0, 0.0), (3, 0, 1, 4.0, 0.0),
        |  (3, 0, 2, 4.0, 4.0), (3, 0, 3, 0.0, 0.0),
        |  (4, 0, 0, 0.0, 0.0), (4, 0, 1, 1.0, 0.0),
        |  (4, 0, 2, 1.0, 1.0), (4, 0, 3, 0.0, 0.0),
        |  (4, 1, 0, 5.0, 5.0), (4, 1, 1, 6.0, 5.0),
        |  (4, 1, 2, 6.0, 6.0), (4, 1, 3, 5.0, 5.0)) AS t(c1, c2, c3, c4, c5)
        |ORDER BY gid, poly, idx""".stripMargin)
}
