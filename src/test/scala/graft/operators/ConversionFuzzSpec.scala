package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded-random differential test for the unsigned reinterpretation
  * (X1) and the year clamp (X9): 500 values per width in ONE Spark job,
  * compared against driver-side BigInt arithmetic — the whole signed
  * range gets sampled, not just the handful of fixture values.
  */
class ConversionFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("unsignedFixup matches BigInt reinterpretation across widths") {
    val rnd = new scala.util.Random(42424242L)
    for (bytes <- Seq(1, 2, 3, 4, 8)) {
      val bits = 8 * bytes
      // random signed values of the width, edges included
      val edge = Seq(0L, -1L, (1L << (bits - 1)) - 1, -(1L << (bits - 1)))
      val vals = (edge ++ Seq.fill(500) {
        val v = rnd.nextLong()
        // wrap into the signed width
        (v << (64 - bits)) >> (64 - bits)
      }).distinct
      val want = vals.map { v =>
        val b = BigInt(v)
        v -> (if (b < 0) b + (BigInt(1) << bits) else b)
      }.toMap
      val got = vals.toDF("v")
        .select(col("v"),
          RecordConversion.unsignedFixup(col("v"), bytes).cast("string"))
        .collect().map(r => r.getLong(0) -> BigInt(r.getString(1))).toMap
      assert(got === want, s"width $bytes bytes diverged")
    }
  }

  test("yearClamp matches the reference rule on random shorts") {
    val rnd = new scala.util.Random(777L)
    val vals = (Seq(0, 1900, 1901, 2155, 2156, 69, 70, 99) ++
      Seq.fill(300)(rnd.nextInt(4000))).distinct.map(_.toLong)
    // reference converter.py:613-623: 0 passes, else clamp to [1901,2155]
    val want = vals.map(v =>
      v -> (if (v == 0) 0L else math.max(1901L, math.min(2155L, v)))).toMap
    val got = vals.toDF("v")
      .select(col("v"), RecordConversion.yearClamp(col("v")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }
}
