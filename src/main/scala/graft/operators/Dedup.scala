package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, all designed as
  * shuffle-on-key aggregations / joins so they scale horizontally:
  *
  *  - exact: hash-groupBy on a content fingerprint — one shuffle keyed by
  *    digest; at 100 TB the map side emits (digest, id) pairs only.
  *  - MinHash + LSH: shingle → k minhashes → b band keys → candidate
  *    pairs via self-join on band key → verify exact Jaccard only on
  *    candidates. The join never materializes the n² pair space.
  *  - SimHash: 32-bit sign-of-sums signature; near-dup candidates share
  *    the signature (or a band of it).
  *  - n-gram Jaccard: candidate pairs = docs sharing a (rare) shingle;
  *    a document-frequency cap on shingles bounds the worst-case join
  *    fan-out (the classic hot-key guard — a shingle appearing in 10⁶
  *    docs would otherwise emit 10¹² pairs).
  *
  * Hash functions are md5-based so every stage is reproducible and has an
  * exact SQL twin for the oracle gate (no engine-specific hash).
  */
object Dedup {

  /** Word n-gram shingles, distinct per doc. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    array_distinct(
      filter(
        transform(sequence(lit(1), greatest(size(toks) - (n - 1), lit(0))),
          i => array_join(slice(toks, i, lit(n)), " ")),
        s => length(s) > 0))
  }

  /** Exact duplicate groups: fingerprint → (canonical id, members). */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_dups"))
      .filter(col("n_dups") > 1)

  /** k deterministic minhashes per doc over word-`n`-gram shingles.
    * minhash_i = min over shingles of md5(i || shingle) — md5 as the
    * hash family, min over hex strings (total order, engine-agnostic). */
  def minhashes(docs: DataFrame, idCol: String, textCol: String,
                n: Int, k: Int): DataFrame = {
    val sh = docs.select(col(idCol),
      explode(shingles(col(textCol), n)).as("s"))
    val aggs = (0 until k).map(i =>
      min(md5(concat(lit(i.toString), lit("|"), col("s")))).as(s"h$i"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash-LSH candidate pairs: `b` bands of `r` rows; a pair is a
    * candidate if any band key matches. Returns (id_a, id_b) with a < b,
    * distinct. */
  def lshCandidates(mh: DataFrame, idCol: String, b: Int, r: Int): DataFrame = {
    val banded = mh.select(col(idCol) +:
      (0 until b).map(band => md5(concat_ws("|",
        (0 until r).map(row => col(s"h${band * r + row}")): _*)).as(s"band$band")): _*)
    val pairs = (0 until b).map { band =>
      val l = banded.select(col(idCol).as("id_a"), col(s"band$band").as("bk"))
      val rgt = banded.select(col(idCol).as("id_b"), col(s"band$band").as("bk"))
      l.join(rgt, "bk").filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
    }
    pairs.reduce(_ unionByName _).distinct()
  }

  /** Exact Jaccard over word-n-gram shingles for given candidate pairs. */
  def verifyJaccard(docs: DataFrame, candidates: DataFrame, idCol: String,
                    textCol: String, n: Int): DataFrame = {
    val withSh = docs.select(col(idCol), shingles(col(textCol), n).as("sh"))
    val a = withSh.select(col(idCol).as("id_a"), col("sh").as("sh_a"))
    val bb = withSh.select(col(idCol).as("id_b"), col("sh").as("sh_b"))
    candidates.join(a, "id_a").join(bb, "id_b")
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6).as("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: candidates → verified pairs ≥
    * `threshold`. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, k: Int = 6, b: Int = 3, r: Int = 2,
                      threshold: Double = 0.5): DataFrame = {
    val mh = minhashes(docs, idCol, textCol, n, k)
    val cand = lshCandidates(mh, idCol, b, r)
    verifyJaccard(docs, cand, idCol, textCol, n)
      .filter(col("jaccard") >= threshold)
  }

  /** 32-bit SimHash over distinct tokens: bit i = sign of Σ_tokens
    * (2·parity(md5(token)[i]) − 1). Near-identical docs agree on most
    * bits; grouping by the signature finds clusters in one shuffle. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(array_distinct(split(col(textCol), " "))).as("w"))
      .withColumn("h", md5(col("w")))
    val bitSums = (0 until 32).map(i =>
      sum(when(ascii(substring(col("h"), i + 1, 1)) % 2 === 1, 1)
        .otherwise(-1)).as(s"s$i"))
    tok.groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        (0 until 32).map(i =>
          when(col(s"s$i") > 0, lit(1L << i)).otherwise(0L)).reduce(_ + _)
          .as("simhash"))
  }

  /** n-gram Jaccard near-dups without minhash: candidates = pairs sharing
    * at least one shingle with document frequency ≤ `maxDf`. The df cap
    * is the scale guard (drops boilerplate shingles that would explode
    * the join). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, maxDf: Int = 20,
                        threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      explode(shingles(col(textCol), n)).as("s"))
    val rare = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf && col("df") > 1)
    val candidates = sh.join(rare.select("s"), "s")
      .select(col("id").as("id_a"), col("s"))
      .join(sh.join(rare.select("s"), "s")
        .select(col("id").as("id_b"), col("s")), "s")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    verifyJaccard(docs, candidates, idCol, textCol, n)
      .filter(col("jaccard") >= threshold)
  }
}
