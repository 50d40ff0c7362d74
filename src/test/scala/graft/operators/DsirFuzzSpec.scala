package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential fuzz for [[Sampling.dsirWeights]]: random corpora vs a
  * naive driver-side reference that replays the model literally —
  * unigram+bigram occurrences, md5 2-hex buckets, Laplace-smoothed
  * target/corpus log-likelihood ratio rounded to 6 decimals, per-doc
  * sum rounded to 6 (see dsirWeights: coarser grids land on HALF_UP
  * boundaries). Seeded, so failures replay. The fold-order caveat
  * (Spark sums a doc's llr terms in partition order, the reference in
  * a fixed order) is absorbed the same way the gate absorbs it: the
  * per-term values are identical 6-decimal-rounded doubles whose sums
  * differ at ~1e-13, far inside the comparison tolerance.
  */
class DsirFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def round(x: Double, p: Int): Double = {
    // Spark/DuckDB round = HALF_UP on the decimal string, not IEEE
    // nearest-even — BigDecimal replays it exactly
    BigDecimal(x).setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("random corpora: dsirWeights equals the literal reference") {
    val rnd = new scala.util.Random(20260813L)
    val vocab = Vector("spark", "sql", "row", "scan", "agg", "join",
      "the", "a", "fast", "slow", "table", "key", "hash", "sort")
    (1 to 5).foreach { round0 =>
      val n = 20 + rnd.nextInt(80)
      val docs = (1 to n).map { i =>
        val len = 1 + rnd.nextInt(12)
        val text = Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
        (i.toLong, text, rnd.nextBoolean())
      }
      val df = docs.toDF("doc_id", "text", "is_t").repartition(5)
      val got = Sampling.dsirWeights(df, "doc_id", "text", col("is_t"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

      // reference: literal replay of the documented model
      val terms = docs.map { case (id, text, t) =>
        val toks = text.split(" ", -1).toSeq
        val bi = if (toks.size >= 2)
          toks.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty
        (id, t, (toks ++ bi).filter(_.nonEmpty))
      }
      val occ = terms.flatMap { case (id, t, ts) =>
        ts.map(term => (id, t, md5hex(term).take(2)))
      }
      val cr = occ.groupBy(_._3).map { case (b, g) => b -> g.size.toLong }
      val ct = occ.filter(_._2).groupBy(_._3)
        .map { case (b, g) => b -> g.size.toLong }
      val rTot = cr.values.sum.toDouble
      val tTot = ct.values.sum.toDouble
      val llr = (0 until 256).map(i => f"$i%02x").map { b =>
        b -> round(
          math.log((ct.getOrElse(b, 0L) + 1.0) / (tTot + 256.0)) -
            math.log((cr.getOrElse(b, 0L) + 1.0) / (rTot + 256.0)), 6)
      }.toMap
      val expected = terms.filter(_._3.nonEmpty).map { case (id, _, ts) =>
        id -> (ts.size.toLong,
          round(ts.map(t => llr(md5hex(t).take(2))).sum, 6))
      }.toMap
      assert(got.keySet === expected.keySet,
        s"round $round0: doc sets differ (n=$n)")
      expected.foreach { case (id, (nt, lw)) =>
        val (gnt, glw) = got(id)
        assert(gnt === nt, s"round $round0 doc $id n_terms")
        assert(math.abs(glw - lw) <= 1e-6 + 1e-12,
          s"round $round0 doc $id logw: got $glw expected $lw")
      }
    }
  }
}
