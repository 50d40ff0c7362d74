package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join: for every left row, the single right row with the
  * greatest time ≤ the left row's time, within the same key group — the
  * canonical event-enrichment operator (trades against quotes, purchases
  * against the click that preceded them) that Spark has no native form
  * of.
  *
  * Spark-first shape: tag both sides, union, and take a running
  * `last(_, ignoreNulls)` over `(key) ORDER BY (time, side)` with right
  * rows sorting before left rows at equal times (ties inclusive, i.e.
  * `l.t >= r.t`). That is ONE shuffle on the key and ONE sort — exactly
  * the I/O of a single sort-merge join — with no range-condition
  * explosion: a naive `l JOIN r ON key AND r.t <= l.t` + max-per-group
  * materializes every (left, earlier-right) combination before pruning
  * (quadratic per key group), while the running window is linear. At
  * 100 TB both sides shuffle once by key and stream through the sort;
  * AQE handles skewed keys the same way it does any window partition.
  *
  * The right side must be unique per (keys, time) — true of any
  * event-sourced feed with a total order — or ties are broken by the
  * right row with the highest `tiebreak` (defaults to the time column).
  */
object AsOfJoin {

  /** `right`'s non-key, non-time columns are appended to every left row
    * as a struct column `asOfCol` (null when no right row is at or
    * before the left time). */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               asOfCol: String = "asof",
               tiebreak: Option[String] = None): DataFrame = {
    val payload = right.columns.filterNot(keys.contains)
    val lType = StructType(left.schema.fields)
    val rType = StructType(payload.map(right.schema(_)))
    val lhs = left.select(keys.map(col) ++ Seq(
      col(leftTime).as("_t"), lit(1).as("_side"),
      struct(left.columns.map(col): _*).as("_l"),
      lit(null).cast(rType).as("_r")): _*)
    val rhs = right.select(keys.map(col) ++ Seq(
      col(rightTime).as("_t"), lit(0).as("_side"),
      lit(null).cast(lType).as("_l"),
      struct(payload.map(col): _*).as("_r")): _*)
    val order: Seq[Column] = Seq(col("_t"), col("_side")) ++
      Seq(col(s"_r.${tiebreak.getOrElse(rightTime)}").asc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lhs.unionByName(rhs)
      .withColumn(asOfCol, last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_l.*"), col(asOfCol))
  }
}
