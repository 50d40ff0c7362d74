package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Reads are plain
  * `spark.read.parquet` so Catalyst's datasource V2 path gives us column
  * pruning + filter pushdown + row-group min/max skipping for free — at
  * 100 TB these scans are the dominant cost and the plan must show
  * `PushedFilters`/`ReadSchema` doing the trimming.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables small enough to broadcast at any scale factor (dimension-like).
    * At 100 TB, region/nation stay tiny; customer/supplier/part grow but the
    * *filtered* dim side of our queries stays broadcastable — we still mark
    * only the always-tiny ones and let AQE decide for the rest.
    */
  val tiny: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is nanosecond-precision parquet, which Spark only reads as
    // a long (spark.sql.legacy.parquet.nanosAsLong=true — set by
    // GraftSession). Keep the exact ns value for ordering (`ts_ns`) and
    // derive a µs TimestampType `ts` for calendar functions. `div` is
    // integer division — going through double would shear the low bits of
    // an ~1.7e18 ns epoch.
    if (name == "events")
      df.withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    else df
  }
}
