package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized differential test for [[Dedup.sharedWindowPairs]] against
  * a naive in-memory reference (all windows, hash sets, quadratic pair
  * scan), and for [[Packing.ragChunks]] against a direct sliding-window
  * reconstruction. Seeded, so failures replay.
  */
class SharedWindowFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("sharedWindowPairs matches a naive reference on random corpora") {
    val rnd = new scala.util.Random(0x5eed1L)
    (1 to 3).foreach { round =>
      val w = 4 + rnd.nextInt(5) // small windows so overlaps happen
      val vocab = (1 to 6).map(i => s"w$i")
      // random docs + planted shared spans at random offsets
      val span = Seq.fill(w + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
      def doc(): Seq[String] = {
        val base = Seq.fill(5 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
        if (rnd.nextBoolean()) {
          val at = rnd.nextInt(base.size + 1)
          base.take(at) ++ span ++ base.drop(at)
        } else base
      }
      val docs = (1L to 20L).map(i => (i, doc().mkString(" ")))
      val keepBelow = Seq("4", "8", "g")(rnd.nextInt(3))
      val maxDf = 3 + rnd.nextInt(18)

      // naive reference: per doc the SET of kept window hashes; pairs by
      // quadratic scan over hashes under the df cap
      val winsByDoc = docs.map { case (id, text) =>
        val t = text.split(" ")
        id -> (if (t.length < w) Set.empty[String]
               else t.sliding(w).map(win => md5hex(win.mkString(" ")))
                 .filter(_ < keepBelow).toSet)
      }.toMap
      val df = winsByDoc.values.flatten
        .groupBy(identity).map { case (h, g) => h -> g.size }
      val expected = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        shared = (winsByDoc(a) intersect winsByDoc(b)).count(df(_) <= maxDf)
        if shared > 0
      } yield (a, b, shared.toLong)).toSet

      val got = Dedup.sharedWindowPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", w = w, keepBelow = keepBelow, maxDf = maxDf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected,
        s"round $round (w=$w keep=$keepBelow maxDf=$maxDf): " +
          s"missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("ragChunks matches a direct sliding reconstruction on random docs") {
    val rnd = new scala.util.Random(0x5eed2L)
    (1 to 3).foreach { round =>
      val window = 3 + rnd.nextInt(20)
      val overlap = rnd.nextInt(window)
      val stride = window - overlap
      val docs = (1L to 25L).map(i =>
        (i, Seq.fill(1 + rnd.nextInt(80))(s"t${rnd.nextInt(50)}")
          .mkString(" ")))
      val expected = docs.flatMap { case (id, text) =>
        val t = text.split(" ").toSeq
        val nc = (math.max(t.size - window, 0) + stride - 1) / stride + 1
        (0 until nc).map { c =>
          val ct = t.slice(c * stride, c * stride + window)
          (id, c, ct.size, ct.mkString(" "))
        }
      }.toSet
      val got = Packing.ragChunks(docs.toDF("doc_id", "text"),
        "doc_id", "text", window, overlap)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
        .toSet
      assert(got === expected,
        s"round $round (window=$window overlap=$overlap)")
      // invariant: chunk starts cover every token exactly (no token in
      // no chunk), and consecutive chunks overlap by exactly `overlap`
      // except at the tail
      docs.foreach { case (id, text) =>
        val n = text.split(" ").length
        val covered = got.filter(_._1 == id).toSeq.sortBy(_._2)
          .flatMap { case (_, c, len, _) =>
            (c * stride) until (c * stride + len) }
        assert(covered.toSet === (0 until n).toSet, s"doc $id coverage")
      }
    }
  }
}
