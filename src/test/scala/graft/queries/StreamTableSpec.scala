package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

/** `queries.streamTable` must stream a fixture table in BOTH physical
  * layouts: `<dir>/<name>.parquet` as a single file (the driver's
  * pyarrow fixtures) and as a Spark-written directory of part files
  * (the ScaleFixture sf1/sf10 replicas). The directory case regressed
  * silently to an EMPTY stream until the first full-surface sf1 bench
  * caught t_stream_route reading back a route store no micro-batch
  * had created — this spec pins both layouts by row count and sum.
  */
class StreamTableSpec extends SparkSpec {

  private def drain(df: org.apache.spark.sql.DataFrame,
                    sink: String): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(sink)
  }

  test("directory layout (Spark-written table) streams all rows") {
    import spark.implicits._
    val dir = tmpDir("stream_tbl_dir_")
    val n = 1000
    // multiple part files, like any Spark-written fixture
    (1 to n).toDF("v").repartition(4)
      .write.parquet(s"$dir/things.parquet")
    val got = drain(streamTable(spark, dir, "things"), "st_dir_sink")
    assert(got.count() === n.toLong)
    assert(got.agg(org.apache.spark.sql.functions.sum("v"))
      .head.getLong(0) === n.toLong * (n + 1) / 2)
  }

  test("single-file layout (driver-style fixture) streams all rows") {
    import spark.implicits._
    val dir = tmpDir("stream_tbl_file_")
    val n = 500
    // write via Spark then promote the lone part file to
    // <dir>/things.parquet — the driver's pyarrow single-file shape
    val staging = tmpDir("stream_tbl_staging_")
    (1 to n).toDF("v").coalesce(1).write.parquet(s"$staging/out")
    val part = new java.io.File(s"$staging/out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/things.parquet"))
    val got = drain(streamTable(spark, dir, "things"), "st_file_sink")
    assert(got.count() === n.toLong)
    assert(got.agg(org.apache.spark.sql.functions.sum("v"))
      .head.getLong(0) === n.toLong * (n + 1) / 2)
    // and the glob filter really is doing the narrowing in this
    // layout: an unrelated sibling file must not leak into the stream
    val extra = tmpDir("stream_tbl_staging2_")
    (1 to 7).toDF("v").coalesce(1).write.parquet(s"$extra/out")
    val part2 = new java.io.File(s"$extra/out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part2.toPath,
      java.nio.file.Paths.get(s"$dir/other.parquet"))
    val again = drain(streamTable(spark, dir, "things"), "st_file_sink2")
    assert(again.count() === n.toLong)
  }
}
