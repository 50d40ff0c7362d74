package graft.streaming

import graft.SparkSpec
import graft.operators.GraftTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The streaming-materialized-view pattern across REAL micro-batch
  * boundaries (the gated query drives one AvailableNow batch; here
  * MemoryStream forces several): update-mode re-emissions of a group
  * must supersede the earlier image in the FINAL view, never duplicate
  * it, and untouched groups must survive unchanged.
  */
class StreamMatviewSpec extends SparkSpec {
  import spark.implicits._

  test("update-mode matview converges across micro-batches") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val table = GraftTable(spark, tmpDir("mv-spec"), Seq("k"),
      StructType(Seq(StructField("k", StringType),
        StructField("n", LongType), StructField("s", DoubleType))))
    val agg = input.toDF().toDF("k", "v")
      .groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val q = agg.writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        table.append(b, id + 1)
      }
      .start()
    try {
      input.addData(("a", 1.0), ("a", 3.0), ("b", 2.0))
      q.processAllAvailable()
      // batch 2 touches only "a" — its re-emitted image must supersede
      input.addData(("a", 5.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = table.read.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set(("a", 3L, 9.0), ("b", 1L, 2.0)),
      s"matview diverged: $got")
    // the log holds both images of "a"; the view keeps the newest only
    assert(table.log.filter(col("k") === "a").count() === 2)
  }
}
