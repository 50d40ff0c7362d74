package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token statistics, quality scoring, language ID, fingerprinting.
  *
  * All pure Column expressions over a `text` column — single scan, no
  * UDFs, no shuffle except the caller's own aggregation. At 100 TB the
  * whole module is a map-only pass that pipelines into whatever
  * filter/dedup stage follows.
  */
object TextAnalysis {

  /** Whitespace tokens. The fixtures are single-space separated; for raw
    * corpora use `tokensRegex`. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish token-count estimate: whitespace words + punctuation splits,
    * the usual `len/4` fallback blended in. Deterministic, no vocab. */
  def tokenCountEstimate(text: Column): Column =
    greatest(size(tokens(text)), ceil(length(text) / 4).cast("int"))

  /** BPE pre-tokenizer pattern: letter runs, digit runs, single other
    * non-space — the GPT-2-style pre-split a real BPE applies before
    * merges. Kept to constructs Java regex and RE2 agree on so the SQL
    * oracle counts identically. */
  val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Vocab-free BPE token count: pre-split matches (each merges into ≥ 1
    * BPE token, so this is the standard cheap lower-bound count). */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(bpePattern)).cast("int")

  def typeTokenRatio(text: Column): Column = {
    val t = tokens(text)
    round(size(array_distinct(t)).cast("double") / size(t), 6)
  }

  /** Quality score ∈ [0,1]: length band + lexical diversity + stopword
    * presence — the standard cheap pre-filter heuristics (C4/Gopher
    * style) as one expression. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    val nTok = size(t).cast("double")
    val lengthScore = least(nTok / 64.0, lit(1.0))
    val diversity = size(array_distinct(t)).cast("double") / nTok
    val stopHits = size(array_intersect(t,
      array(stopwords.map(lit): _*))).cast("double")
    val stopScore = least(stopHits / 4.0, lit(1.0))
    round((lengthScore + diversity + stopScore) / 3.0, 6)
  }

  /** Stopword profiles for the language-ID heuristic. Function-word hit
    * counting over distinct tokens — the classic cheap langid. Profiles
    * are tiny and inlined as literals (broadcast-free). */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "les", "des", "est", "pour"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "you3", "he2", "wo3", "ni3", "ta1", "men5"))

  /** Predicted language: argmax of profile hits over distinct tokens;
    * deterministic tie-break by profile order; no hits → 'und'; null
    * text → null (without the explicit guard, the null score falls
    * through both `when` branches into `otherwise(best.lang)` and every
    * null-text row comes back "en" — the first profile). */
  def langId(text: Column): Column = {
    val distinctToks = array_distinct(tokens(text))
    // argmax via array_position(scores, max): each profile's intersect
    // is evaluated ONCE. The previous when-fold referenced the
    // accumulator twice per level (condition + otherwise), doubling the
    // intersect subtrees per profile — 2⁴ copies of the score
    // expressions survived to the physical plan and dominated the
    // per-row cost of every langId consumer. array_position returns the
    // FIRST index of the max, which is exactly the old fold's
    // earlier-profile-wins tie-break.
    val scores = array(langProfiles.map { case (_, words) =>
      size(array_intersect(distinctToks, array(words.map(lit): _*)))
    }: _*)
    val names = array(langProfiles.map { case (lang, _) => lit(lang) }: _*)
    val mx = array_max(scores)
    when(text.isNull, lit(null).cast("string"))
      .when(mx === 0, lit("und"))
      .otherwise(element_at(names, array_position(scores, mx).cast("int")))
  }

  /** TF-IDF keyword extraction: the `k` highest-scoring terms per
    * document, `score = tf · ln(N / df)` rounded to 6 decimals,
    * deterministic tie-break by term.
    *
    * Plan shape at 100 TB: `N` is a parquet metadata count (no scan);
    * the exploded token table is computed once and persisted; term
    * frequencies partial-aggregate map-side before the (doc, term)
    * shuffle; the document-frequency side is |vocab| rows (broadcasts
    * under AQE when small, shuffles on term otherwise); the final top-k
    * is a bounded per-document window. Three shuffles total — the
    * irreducible shape of corpus-relative term weighting. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val n = docs.count().toDouble
    val toks = Partitioning.spread(docs)
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
    // tf has exactly one row per (doc, term) — the df count folds over
    // it instead of re-aggregating (and re-shuffling) the raw token
    // table through a distinct
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      // cached because the returned plan reads it twice (tf side + df
      // side); lives until storage pressure evicts it (unified memory —
      // not a hard leak) or the caller clearCache()s
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dft, "term")
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(lit(n) / col("df")), 6).as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
  }

  /** Non-distinct word-2-gram array — the input to repetition stats
    * (distinct shingles would erase exactly the signal measured). */
  def wordBigrams(text: Column): Column = {
    val t = tokens(text)
    transform(slice(t, lit(1), size(t) - 1),
      (x, i) => concat_ws(" ", x, element_at(t, (i + lit(2)).cast("int"))))
  }

  /** Gopher-style intra-document repetition statistics: the duplicate
    * and top-2-gram mass fractions that flag looped/templated text. One
    * explode + two keyed aggregations; every ratio divides exact
    * integer counts, so the doubles are engine-identical.
    *
    * Plan shape at 100 TB: the (doc, gram) partial aggregate collapses
    * repeats map-side, so the shuffle carries one row per distinct gram
    * per doc; the second aggregate is keyed by doc alone. */
  def repetitionStats(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    Partitioning.spread(docs)
      .select(col(idCol).as("doc_id"),
        explode(wordBigrams(col(textCol))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_2grams"),
        count(lit(1)).as("n_distinct"),
        max("c").as("top_c"))
      .select(col("doc_id"), col("n_2grams"),
        round(lit(1.0) - col("n_distinct") / col("n_2grams"), 6)
          .as("dup_2gram_frac"),
        round(col("top_c") / col("n_2grams"), 6).as("top_2gram_frac"))

  /** Feature hashing (the "hashing trick", Weinberger et al. 2009,
    * public): token counts folded into a FIXED-dim signed integer
    * vector — bucket and sign both md5-derived, so an unbounded
    * vocabulary needs no dictionary, no fit, and no driver state; the
    * classic featurizer in front of a linear classifier (compose with
    * [[QualityClassifier]]).
    *
    * All-integer arithmetic (±1 signs summed per bucket), so the
    * result is engine-exact with no rounding convention. Scale shape:
    * map-only hashing + ONE partial-agg shuffle keyed on the doc id;
    * output width is `dim` ints per document regardless of vocabulary.
    */
  def featureHash(docs: DataFrame, idCol: String, textCol: String,
                  dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val bucket = pmod(
      conv(substring(md5(concat(lit("b|"), col("w"))), 1, 8), 16, 10)
        .cast("long"), lit(dim.toLong)).cast("int")
    val sign = when(
      substring(md5(concat(lit("s|"), col("w"))), 1, 1) < "8", 1)
      .otherwise(-1)
    val fCols = (0 until dim).map(j =>
      sum(when(col("b") === j, col("sgn")).otherwise(0)).cast("int")
        .as(s"f$j"))
    docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .select(col(idCol), bucket.as("b"), sign.as("sgn"))
      .groupBy(idCol)
      .agg(fCols.head, fCols.tail: _*)
  }

  /** Corpus-level collocation mining: top-k word bigrams by the PMI
    * RATIO c(ab)·N / (c(a)·c(b)) — monotone in pointwise mutual
    * information, so the ranking is the classic collocation ranking
    * without a transcendental touching the result (exact IEEE
    * multiply/divide on integer-derived doubles; engine-identical).
    * `minCount` is the standard low-frequency guard (PMI explodes on
    * hapax pairs).
    *
    * Scale shape: two partial-agg counts (bigrams, unigrams), the
    * scalar bigram total broadcast via a 1-row cross join, two
    * key-equi joins of count relations (counts only — text never
    * re-shuffles), and a top-k TakeOrdered. Skewed common words fan
    * into at most |vocab| join rows per key. */
  def pmiBigrams(docs: DataFrame, textCol: String, minCount: Long,
                 k: Int): DataFrame = {
    val d = Partitioning.spread(docs.select(col(textCol)))
    val bc = d.select(explode(wordBigrams(col(textCol))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c_ab"))
    val uc = d.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_w"))
    val total = bc.agg(sum("c_ab").as("nb"))
    bc.filter(col("c_ab") >= minCount)
      .crossJoin(broadcast(total))
      .join(uc.select(col("w").as("wa"), col("c_w").as("c_a")),
        element_at(split(col("g"), " "), 1) === col("wa"))
      .join(uc.select(col("w").as("wb"), col("c_w").as("c_b")),
        element_at(split(col("g"), " "), 2) === col("wb"))
      .select(col("g"), col("c_ab"),
        round(col("c_ab").cast("double") * col("nb") /
          (col("c_a").cast("double") * col("c_b")), 6).as("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("g")).limit(k)
  }

  /** Per-source Zipf-law slope — the corpus-health statistic that flags
    * unnatural text at a glance: natural language sits near slope −1 on
    * the log-log rank/frequency line, while template spam, boilerplate
    * floods and synthetic word-soup bend it (flatter = suspiciously
    * uniform vocabulary use, steeper = a few tokens dominating). Slope
    * is the closed-form OLS fit over (ln rank, ln freq) per source.
    *
    * Scale shape: the only corpus-sized work is the (source, term)
    * count aggregate (partial map-side); the rank window and the moment
    * sums run over VOCABULARY rows — bounded, never documents.
    * Determinism: ranks break ties by term (total order both engines);
    * ln(rank)/ln(freq) of exact integers lean on the cross-engine ln
    * contract, round to 6, and the moment sums carry 6-decimal products
    * in exact decimal (order-free, the quality_corr convention); the
    * final slope is one fixed double chain. Sources with fewer than two
    * distinct vocabulary rows have no regression line and emit NULL. */
  def zipfSlope(docs: DataFrame, sourceCol: String,
                textCol: String): DataFrame = {
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(col("c").desc, col("term"))
    val xy = docs
      .select(col(sourceCol), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(sourceCol, "term").agg(count(lit(1)).as("c"))
      .withColumn("rnk", row_number().over(w))
      .select(col(sourceCol),
        round(log(col("rnk").cast("double")), 6).as("x"),
        round(log(col("c").cast("double")), 6).as("y"))
    val agg = xy.groupBy(sourceCol).agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(18,6)")).as("sx"),
      sum(col("y").cast("decimal(18,6)")).as("sy"),
      sum(round(col("x") * col("y"), 6).cast("decimal(18,6)")).as("sxy"),
      sum(round(col("x") * col("x"), 6).cast("decimal(18,6)")).as("sx2"))
    val nD = col("n").cast("double")
    val num = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val den = nD * col("sx2").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    agg.select(col(sourceCol), col("n").cast("int").as("n_vocab"),
      when(col("n") >= 2 && den =!= 0.0, round(num / den, 6))
        .as("zipf_slope"))
  }

  /** Character-trigram fluency proxy: a document's average corpus
    * frequency of its char 3-grams — the cheap stand-in for an n-gram
    * LM perplexity filter (rare-trigram documents are OCR garbage,
    * encoding noise, or wrong-alphabet text). Frequencies stay INTEGER
    * counts end to end (sums exact below 2⁵³), so the score is
    * engine-identical; a real pipeline would swap the self-fitted model
    * for a frozen reference-corpus table via the same join.
    *
    * Plan shape at 100 TB: the model is |alphabet|³-bounded (tiny next
    * to the corpus) — AQE broadcasts it back over the trigram stream;
    * the only wide exchange is the per-doc aggregate. */
  def charTrigramFluency(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val tri = Partitioning.spread(docs)
      .select(col(idCol).as("doc_id"), explode(expr(
        s"""CASE WHEN length(`$textCol`) >= 3
           |THEN transform(sequence(1, length(`$textCol`) - 2),
           |  i -> substr(`$textCol`, i, 3))
           |ELSE array() END""".stripMargin)).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = tri.groupBy("g").agg(count(lit(1)).as("dfc"))
    // no broadcast HINT: the model is |distinct trigrams|-bounded, which
    // is tiny on alphabetic corpora but reaches 10^8+ on CJK/multilingual
    // text — a forced broadcast there collects it to the driver and dies
    // on the broadcast limit, where AQE left to its own stats broadcasts
    // the small case and degrades the large one to a shuffle join
    tri.join(model, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"), sum("dfc").as("sum_dfc"))
      .select(col("doc_id"), col("n_trigrams"),
        round(col("sum_dfc") / col("n_trigrams"), 4).as("avg_tri_df"))
  }

  // ------------------------------------------------------------- PII

  /** PII patterns, kept to the Java-regex ∩ RE2 common subset so the
    * DuckDB oracle counts and rewrites identically. The three shapes a
    * web-corpus scrub always starts with (emails, NANP-style phone
    * numbers, IPv4 addresses); extend the seq for more. */
  val piiEmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiPhonePattern = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val piiIpPattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redaction order matters: emails first (their local parts can embed
    * digits-and-dots an IP pattern would chew on), then IPs, then
    * phones. Pure chained regexp_replace — map-only, codegen'd. */
  val piiPatterns: Seq[(String, String)] = Seq(
    piiEmailPattern -> "[EMAIL]",
    piiIpPattern -> "[IP]",
    piiPhonePattern -> "[PHONE]")

  def piiEmailCount(text: Column): Column =
    regexp_count(text, lit(piiEmailPattern)).cast("int")
  def piiPhoneCount(text: Column): Column =
    regexp_count(text, lit(piiPhonePattern)).cast("int")
  def piiIpCount(text: Column): Column =
    regexp_count(text, lit(piiIpPattern)).cast("int")

  /** All PII spans replaced by their type tags. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (t, (pat, tag)) =>
      regexp_replace(t, pat, tag)
    }

  // ---------------------------------------------------- Gopher rules

  /** Gopher-style document quality rules (Rae et al. 2021, table A1 —
    * public knowledge): the named pass/fail flags a production filter
    * reports per document, not just raw stats. Every rule is a pure
    * Column over exact integer counts, so the booleans are
    * engine-identical; the whole set is one map-only projection (mean
    * word length via chars-sans-spaces over the token count, duplicate
    * 2-gram mass via array cardinality — no explode, no shuffle).
    *
    * Rules (thresholds from the paper, word-count floor lowered to fit
    * the fixture's short synthetic docs):
    *  - `r_wordcount`: 20 ≤ words ≤ 100 000
    *  - `r_meanwordlen`: 3 ≤ mean word length ≤ 10
    *  - `r_stopwords`: ≥ 2 distinct stopword hits
    *  - `r_dup2gram`: duplicate word-2-gram mass ≤ 0.5
    *  - `pass`: all of the above
    */
  def gopherRules(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    val nWords = size(t)
    val meanWl = length(regexp_replace(text, " ", "")).cast("double") /
      nWords.cast("double")
    val nStop = size(array_intersect(array_distinct(t),
      array(stopwords.map(lit): _*)))
    val grams = wordBigrams(text)
    // single-word docs have no bigrams: 0 duplicate mass, not 0/0
    val dup2 = when(size(grams) === 0, lit(0.0)).otherwise(lit(1.0) -
      size(array_distinct(grams)).cast("double") /
        size(grams).cast("double"))
    val rWc = nWords >= 20 && nWords <= 100000
    val rMwl = meanWl >= 3.0 && meanWl <= 10.0
    val rStop = nStop >= 2
    val rDup = dup2 <= 0.5
    struct(
      nWords.as("n_words"),
      round(meanWl, 6).as("mean_word_len"),
      nStop.as("n_stopwords"),
      round(dup2, 6).as("dup_2gram_frac"),
      rWc.as("r_wordcount"),
      rMwl.as("r_meanwordlen"),
      rStop.as("r_stopwords"),
      rDup.as("r_dup2gram"),
      (rWc && rMwl && rStop && rDup).as("pass"))
  }

  // ------------------------------------------------- Filter funnel

  /** Filter-funnel audit: the per-rule drop accounting a production
    * cleaning pipeline publishes (C4, Raffel et al. 2020 §2.2, and
    * Gopher, Rae et al. 2021 A1, both report exactly this waterfall).
    * `rules` is an ORDERED list of (name, pass-predicate); a document
    * is charged to the FIRST rule it fails, so per-stage drops are
    * disjoint, sum to the total drop, and stages compose like the
    * sequential pipeline they audit. A predicate that evaluates to
    * NULL (e.g. over null text) charges no stage — the document falls
    * through to `kept`, the same three-valued-logic outcome a SQL
    * `CASE WHEN NOT(rule)` waterfall produces, so both engines agree
    * on degenerate rows by construction.
    *
    * Output, one row per rule in pipeline order: `stage_idx, stage,
    * n_in, n_dropped, n_out, drop_frac, weight_dropped,
    * cum_survival`, where `weight_dropped` sums the caller's
    * `weight` column (word count, byte size, token estimate) over the
    * stage's casualties.
    *
    * Scale shape: ONE map-only projection evaluates every rule flag
    * and the first-fail label per document — no per-rule corpus
    * passes — then one aggregation on the stage key, which is bounded
    * at |rules|+1 groups at ANY corpus size. The running-sum window
    * that turns per-stage drops into entering counts orders those
    * |rules| rows, never the corpus; the static rule relation joined
    * in (so zero-drop stages still report) is |rules| rows; the
    * totals cross-join is a one-row scalar broadcast. */
  def filterFunnel(docs: DataFrame, weight: Column,
                   rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "filterFunnel needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "filterFunnel rule names must be distinct")
    require(!rules.exists(_._1 == "kept"),
      "'kept' is the reserved survivor label")
    val spark = docs.sparkSession
    import spark.implicits._
    val firstFail = coalesce(
      rules.map { case (n, pass) => when(!pass, lit(n)) } :+
        lit("kept"): _*)
    // persisted: the |rules|+1-row aggregate feeds BOTH the totals
    // scalar and the funnel join — without it each consumer re-derives
    // the aggregate and the corpus is scanned twice (plan-asserted)
    val perStage = docs
      .select(firstFail.as("stage"), weight.cast("long").as("wt"))
      .groupBy("stage")
      .agg(count(lit(1)).as("n"), sum("wt").as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = perStage.agg(sum("n").as("total"))
    val order = rules.map(_._1).zipWithIndex
      .map { case (n, i) => (i, n) }.toDF("stage_idx", "stage")
    // everything below runs over |rules|+1 rows
    val before = Window.orderBy("stage_idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    val nIn = col("total") - col("cum_before")
    order.join(perStage, Seq("stage"), "left")
      .na.fill(0L, Seq("n", "w"))
      .crossJoin(broadcast(totals))
      .withColumn("cum_before", coalesce(sum("n").over(before), lit(0L)))
      .select(
        col("stage_idx").cast("int").as("stage_idx"),
        col("stage"),
        nIn.as("n_in"),
        col("n").as("n_dropped"),
        (nIn - col("n")).as("n_out"),
        round(when(nIn === 0, lit(0.0))
          .otherwise(col("n").cast("double") / nIn.cast("double")), 6)
          .as("drop_frac"),
        col("w").as("weight_dropped"),
        round((nIn - col("n")).cast("double") /
          col("total").cast("double"), 6).as("cum_survival"))
      .orderBy("stage_idx")
  }

  /** Content fingerprint: md5 of the normalized text — exact-dup key. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Prefix fingerprint: md5 of the first `n` tokens — catches documents
    * that share a head (boilerplate, templated spam). */
  def prefixFingerprint(text: Column, n: Int): Column =
    md5(array_join(slice(tokens(text), 1, n), " "))
}
