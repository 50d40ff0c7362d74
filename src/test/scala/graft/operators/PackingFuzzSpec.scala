package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential fuzz for [[Packing.packChunks]]: random corpora /
  * capacities / group counts vs a naive driver-side reference that
  * replays the contract literally — group by pmod, sort by (md5, id),
  * sequentially concatenate and cut. Seeded, so failures replay.
  */
class PackingFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("random corpora: packChunks equals the sequential reference") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 5).foreach { round =>
      val n = 50 + rnd.nextInt(300)
      val capacity = 10 + rnd.nextInt(400)
      val groups = 1 + rnd.nextInt(9)
      // sparse, shuffled, non-contiguous ids; token counts incl. 1s
      val docs = new scala.util.Random(round).shuffle(
        (1 to n).map(i => (i * 7L + rnd.nextInt(3), 1 + rnd.nextInt(37))))
        .distinctBy(_._1)
      val df = docs.toDF("id", "toks").repartition(5)
      val got = Packing.packChunks(df, "id", col("toks"), capacity, groups)
        .collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getLong(3),
          r.getInt(4), r.getBoolean(5)))).toMap
      // naive reference: per group, sequential concat-and-chunk
      val expected = docs.groupBy { case (id, _) =>
        (id % groups + groups) % groups
      }.flatMap { case (g, members) =>
        var cum = 0L
        members.sortBy { case (id, _) => (md5hex(id.toString), id) }
          .map { case (id, t) =>
            val start = cum
            cum += t
            id -> (g.toInt, t, start / capacity,
              (start % capacity).toInt,
              (cum - 1) / capacity > start / capacity)
          }
      }
      assert(got === expected,
        s"round $round mismatch (n=$n capacity=$capacity groups=$groups)")
    }
  }
}
