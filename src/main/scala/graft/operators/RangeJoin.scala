package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Banded range join: all (left, right) pairs within the same key group
  * whose times satisfy `right.t - left.t ∈ [lowerNs, upperNs]` — the
  * interval-enrichment operator ("clicks in the hour before each
  * purchase", "readings within ±5 min of each alarm") that a naive
  * `l JOIN r ON key AND r.t BETWEEN ...` plans as a per-key cartesian
  * with a post-filter: every key group materializes |L|·|R| candidate
  * pairs, quadratic in group size.
  *
  * Spark-first shape: bucket time by the window span `S = upper−lower`.
  * A right row at time `t` lands in bucket `t div S`; any matching left
  * row's window `[l+lower, l+upper]` spans at most TWO buckets, so the
  * left side explodes into its (≤2 distinct) candidate buckets and the
  * join becomes an EQUI join on `(keys…, bucket)` + an exact range
  * filter. Output volume is the true match count plus at most one
  * discarded probe per left row — linear, shuffle-partitioned by
  * (key, bucket) so a hot key spreads across its time range instead of
  * pinning one task.
  */
object RangeJoin {

  /** Inner-join form: one row per matching pair, left columns flat plus
    * `right`'s non-key columns as struct `matchCol`. Times are longs
    * (exact ns); `lowerNs < upperNs` required. */
  def within(left: DataFrame, right: DataFrame, keys: Seq[String],
             leftTime: String, rightTime: String,
             lowerNs: Long, upperNs: Long,
             matchCol: String = "matched"): DataFrame = {
    require(lowerNs < upperNs, "lowerNs must be < upperNs")
    val span = upperNs - lowerNs
    val payload = right.columns.filterNot(keys.contains)
    // `div` (integral division) — a double divide would shear the low
    // bits of ns epochs; times are non-negative so trunc == floor
    // identifiers backtick-quoted into expr (a bare interpolation breaks
    // on names with spaces/dots/reserved words); struct access via
    // getField for the same reason
    val lhs = left.withColumn("_bucket", explode(array_distinct(array(
      expr(s"(`$leftTime` + $lowerNs) div $span"),
      expr(s"(`$leftTime` + $upperNs) div $span")))))
    val rhs = right.select(keys.map(col) ++ Seq(
      expr(s"`$rightTime` div $span").as("_bucket"),
      struct(payload.map(col): _*).as(matchCol)): _*)
    lhs.join(rhs, keys :+ "_bucket")
      .filter(col(matchCol).getField(rightTime)
        .between(col(leftTime) + lowerNs, col(leftTime) + upperNs))
      .drop("_bucket")
  }
}
