package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al. 2016) — the
  * tokenizer-training pass of an LLM data pipeline, shaped for scale:
  *
  *  - the ONE corpus-scale operation is the word-count aggregate
  *    (partial-aggregated shuffle on the token), capped to the top
  *    `maxVocab` words via TakeOrderedAndProject — the collected model
  *    input is bounded by the VOCABULARY, never the corpus, exactly
  *    like [[Ivf.fit]]'s k·d centroid rows;
  *  - the merge loop itself runs driver-side over that bounded word
  *    table (the standard BPE trainer shape — HuggingFace tokenizers
  *    does the same over in-memory word counts);
  *  - everything is integer counts and string equality — no floats —
  *    so the learned merge table is deterministic on any cluster and
  *    exactly replayable by a SQL oracle that unrolls the same loop
  *    (pair positions counted per occurrence, ties broken by
  *    (count DESC, lhs, rhs), merges applied left-to-right
  *    non-overlapping).
  */
object Bpe {

  final case class Merge(rank: Int, lhs: String, rhs: String, count: Long)

  /** Learn up to `k` merges from (word, frequency) pairs. Initial units
    * are the word's characters; each round counts adjacent unit pairs
    * at every position (weighted by word frequency), picks the
    * (count DESC, lhs, rhs) maximum, and rewrites every word's unit
    * sequence left-to-right non-overlapping. Stops early when no pair
    * remains. */
  def fit(wordCounts: Seq[(String, Long)], k: Int): Seq[Merge] = {
    var segs: Seq[(Vector[String], Long)] =
      wordCounts.map { case (w, n) => (w.map(_.toString).toVector, n) }
    val out = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= k && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      segs.foreach { case (u, n) =>
        var i = 0
        while (i < u.length - 1) {
          counts.updateWith((u(i), u(i + 1)))(c => Some(c.getOrElse(0L) + n))
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += Merge(rank, l, r, c)
        segs = segs.map { case (u, n) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < u.length) {
            if (i < u.length - 1 && u(i) == l && u(i + 1) == r) {
              b += l + r; i += 2
            } else { b += u(i); i += 1 }
          }
          (b.result(), n)
        }
        rank += 1
      }
    }
    out.result()
  }

  /** Top-`maxVocab` word counts of a text column (deterministic:
    * count DESC, word) — the bounded trainer input. */
  def wordCounts(docs: DataFrame, textCol: String,
                 maxVocab: Int = 10000): Seq[(String, Long)] =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Learn merges from a text column: [[wordCounts]] → [[fit]]. */
  def fitOn(docs: DataFrame, textCol: String, k: Int,
            maxVocab: Int = 10000): Seq[Merge] =
    fit(wordCounts(docs, textCol, maxVocab), k)

  /** Apply learned merges (in rank order, the same greedy
    * left-to-right rewrite the trainer uses) to each word → its final
    * unit count. The tokenize-side model: a vocab-bounded
    * (word, n_units) table that broadcasts into the token stream. */
  def segmentCounts(wordCounts: Seq[(String, Long)],
                    merges: Seq[Merge]): Seq[(String, Int)] =
    wordCounts.map { case (w, _) =>
      var u = w.map(_.toString).toVector
      merges.foreach { m =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < u.length) {
          if (i < u.length - 1 && u(i) == m.lhs && u(i + 1) == m.rhs) {
            b += m.lhs + m.rhs; i += 2
          } else { b += u(i); i += 1 }
        }
        u = b.result()
      }
      (w, u.length)
    }

  /** The learned merge table as a DataFrame (rnk, lhs, rhs,
    * pair_count) — the gate-facing shape. */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.lhs, m.rhs, m.count))
      .toDF("rnk", "lhs", "rhs", "pair_count")
  }

  /** The DuckDB twin of [[fitOn]]: the same loop UNROLLED as `k` CTE
    * stages — segmentations ride a double-delimited string
    * (`|s||p||a||r||k|`, so `replace('|l||r|' → '|lr|')` is exactly
    * the left-to-right non-overlapping merge), pair positions unnest
    * from the unit list, and each stage's winner is
    * ORDER BY count DESC, lhs, rhs LIMIT 1. */
  def oracleSql(k: Int, maxVocab: Int = 10000): String = {
    val union = (1 to k).map(i =>
      s"SELECT $i AS rnk, l AS lhs, r AS rhs, c AS pair_count FROM m$i")
      .mkString("\nUNION ALL ")
    s"""WITH ${oracleCte(k, maxVocab)}
       |$union
       |ORDER BY rnk""".stripMargin
  }

  /** DuckDB twin of the tokenize side: the unrolled learner's final
    * segmentation table `s_k` joins back into the token stream —
    * per-doc whitespace word count vs BPE unit count under the learned
    * merges. Words beyond the top-`maxVocab` cap drop from both
    * engines identically (the Spark side tokenizes through the same
    * capped vocab table). */
  def tokenizeOracleSql(k: Int, maxVocab: Int = 10000): String =
    s"""WITH ${oracleCte(k, maxVocab)},
       |doctok AS (SELECT doc_id, unnest(str_split(text, ' ')) AS word
       |  FROM documents)
       |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(len(str_split(trim(s.seg, '|'), '||'))) AS BIGINT)
       |    AS n_bpe_tokens
       |FROM doctok t JOIN s$k s USING (word)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** The shared unrolled-loop CTE chain: word counts → s0 (char
    * segmentation) → k rounds of (pair counts, winner, rewrite). */
  private def oracleCte(k: Int, maxVocab: Int): String = {
    val stages = (1 to k).map { i =>
      s"""p$i AS (SELECT u[j] AS l, u[j+1] AS r,
         |    CAST(SUM(n) AS BIGINT) AS c
         |  FROM (SELECT n, str_split(trim(seg, '|'), '||') AS u FROM s${i - 1}),
         |       LATERAL (SELECT unnest(range(1, len(u))) AS j)
         |  GROUP BY 1, 2),
         |m$i AS (SELECT l, r, c FROM p$i ORDER BY c DESC, l, r LIMIT 1),
         |s$i AS (SELECT word, n,
         |    CASE WHEN m.l IS NULL THEN seg ELSE
         |      replace(seg, '|' || m.l || '||' || m.r || '|',
         |              '|' || m.l || m.r || '|') END AS seg
         |  FROM s${i - 1} LEFT JOIN m$i m ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""tok AS (SELECT unnest(str_split(text, ' ')) AS word
       |  FROM documents),
       |wc AS (SELECT word, COUNT(*) AS n FROM tok GROUP BY 1
       |  ORDER BY n DESC, word LIMIT $maxVocab),
       |s0 AS (SELECT word, n,
       |    regexp_replace(word, '(.)', '|\\1|', 'g') AS seg FROM wc),
       |$stages""".stripMargin
  }
}
