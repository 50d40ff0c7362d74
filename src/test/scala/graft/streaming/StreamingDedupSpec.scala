package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Cross-batch first-seen dedup: a fingerprint emitted in batch 1 must
  * suppress every later copy, including in later micro-batches (state
  * survives batches via the state store).
  */
class StreamingDedupSpec extends SparkSpec {

  private def writeJson(dir: String, name: String, lines: Seq[String]): Unit =
    graft.sources.EventSpool.writeFile(dir, name, lines)

  test("emit once per fingerprint, across micro-batches, min-seq wins") {
    val in = tmpDir("sdedup-in")
    val ckpt = tmpDir("sdedup-ckpt")
    writeJson(in, "000001.json", Seq(
      """{"fp":"a","seq":2,"text":"A-late"}""",
      """{"fp":"a","seq":1,"text":"A-first"}""",
      """{"fp":"b","seq":3,"text":"B"}"""))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("fp",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("seq",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).json(in)
    val deduped = StreamingDedup.firstSeen(stream, "fp", "seq")
    val q = deduped.writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      q.processAllAvailable()
      // batch 2: duplicate of a + new c
      writeJson(in, "000002.json", Seq(
        """{"fp":"a","seq":9,"text":"A-dup-later-batch"}""",
        """{"fp":"c","seq":4,"text":"C"}"""))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sdedup_out")
      .select("fp", "text").collect().map(r => (r.getString(0), r.getString(1)))
      .toSet
    assert(got === Set(("a", "A-first"), ("b", "B"), ("c", "C")))
  }
}
