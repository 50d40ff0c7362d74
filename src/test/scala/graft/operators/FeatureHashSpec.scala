package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeatureHashSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("differential fuzz vs a local md5 reference") {
    val rnd = new scala.util.Random(19)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x1", "Ω", "a-b")
    val docs = (0 until 40).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(30))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dim = 8
    val got = TextAnalysis.featureHash(
        docs.toDF("doc_id", "text"), "doc_id", "text", dim)
      .collect()
      .map(r => r.getLong(0) ->
        (0 until dim).map(j => r.getInt(j + 1)))
      .toMap
    docs.foreach { case (id, text) =>
      val expected = Array.fill(dim)(0)
      text.split(" ", -1).foreach { w =>
        val b = (java.lang.Long.parseLong(
          md5hex("b|" + w).substring(0, 8), 16) % dim).toInt
        val sgn = if (md5hex("s|" + w).charAt(0) < '8') 1 else -1
        expected(b) += sgn
      }
      assert(got(id) == expected.toSeq, s"doc $id")
    }
  }

  test("vector width is dim regardless of vocabulary") {
    val out = TextAnalysis.featureHash(
      Seq((1L, "a b c d e f g h i j k l m n o p"))
        .toDF("doc_id", "text"), "doc_id", "text", dim = 4)
    assert(out.columns.toSeq == Seq("doc_id", "f0", "f1", "f2", "f3"))
  }
}
