package graft.queries

import org.apache.spark.sql.functions._
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
    })

  val oracles: Map[String, String] = Map(
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
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
}
