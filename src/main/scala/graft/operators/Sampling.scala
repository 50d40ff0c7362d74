package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Everything here is keyed on md5 of the row id rendered as a decimal
  * string — fully reproducible across runs, engines and cluster sizes
  * (no RNG state, no partition-order dependence), so splits are stable
  * under re-runs and incremental appends: a document keeps its split
  * forever, which is the property a train/val split actually needs.
  * Both Spark and the DuckDB oracle lower-hex md5 the same bytes, so
  * every operator has an exact SQL twin.
  */
object Sampling {

  /** Engine-agnostic uniform hash of an id: lower-hex md5 of the decimal
    * string. Lexicographic order on the hex IS uniform order on [0,1). */
  def idHash(id: Column): Column = md5(id.cast("string").cast("binary"))

  /** Stable split assignment. `cuts` are (label, upperHexBound) with
    * ascending bounds; ids hash below the first bound get the first
    * label, etc.; everything above the last bound gets `default`.
    * Two hex digits give 1/256 resolution — e.g.
    * `Seq("val" -> "1a", "test" -> "33")` ≈ 10% / 10% / 80% train.
    * Map-only: no shuffle, no sort, no sampling pass. */
  def hashSplit(id: Column, cuts: Seq[(String, String)],
                default: String): Column = {
    val h = idHash(id)
    cuts.foldRight(lit(default)) { case ((label, bound), rest) =>
      when(h < lit(bound), lit(label)).otherwise(rest)
    }
  }

  /** Source-mixture weighted sampling — the "dataset mixing weights"
    * pass of a training pipeline: keep each row with its source's
    * probability, deterministically. A row survives iff the first 8 hex
    * chars of its id hash fall below `floor(weight · 2³²)` rendered as
    * zero-padded hex — string order on fixed-width lowercase hex IS
    * numeric order, so the comparison needs no engine-specific hex
    * parsing and the kept set is stable under re-runs and appends
    * (re-weighting only moves the cut, so raising a weight strictly
    * grows the kept set — monotone mixtures, the property schedulers
    * rely on). Map-only: no shuffle, no RNG. */
  def weightedSample(id: Column, sourceCol: Column,
                     weights: Seq[(String, Double)]): Column = {
    val h8 = substring(idHash(id), 1, 8)
    val thr = weights.foldLeft(lit(weightHex(0.0))) { case (rest, (src, w)) =>
      when(sourceCol === src, lit(weightHex(w))).otherwise(rest)
    }
    h8 < thr
  }

  /** floor(weight · 2³²) as 8 lowercase hex chars (clamped to [0,1]).
    * Weight ≥ 1.0 returns `"g"` — lexicographically above every 8-hex
    * prefix (all hex digits sort below 'g'), so `h8 < thr` keeps EVERY
    * row: without it, 1.0 would clamp to "ffffffff" and the strict `<`
    * would drop ids hashing to exactly that prefix, and all weights in
    * [1 − 2⁻³², 1.0] would collapse to one cut, breaking the
    * strictly-monotone-mixture contract at the top edge. */
  def weightHex(w: Double): String =
    if (w >= 1.0) "g"
    else f"${math.floor(math.max(0.0, w) * 4294967296.0).toLong}%08x"

  /** Token-budget mixture sampling — rebalance a corpus to per-source
    * TOKEN budgets: each source keeps ≈ budget/total of its rows via
    * the same deterministic hash threshold as [[weightedSample]], with
    * the keep-fraction DERIVED from the measured per-source token
    * totals (one tiny aggregation, |sources| rows to the driver)
    * instead of a hand-tuned weight. Sources at or under budget keep
    * everything; sources without a budget keep nothing.
    *
    * Determinism across engines: the fraction → threshold math is
    * exact IEEE-754 (`budget / total` division, ×2³² = a pure exponent
    * shift, floor), so an engine recomputing it from the same totals
    * lands on the identical hex cut — the SQL twin re-derives the
    * thresholds rather than receiving them as literals. */
  def tokenBudgetSample(docs: DataFrame, idCol: String, sourceCol: String,
                        tokenCount: Column,
                        budgets: Map[String, Long]): DataFrame = {
    val totals = docs.groupBy(col(sourceCol))
      .agg(coalesce(sum(tokenCount.cast("long")), lit(0L)).as("t"))
      // String.valueOf(r.get(0)), not getString(0): the source column
      // may be any type (int shard keys are common); the threshold
      // lookup and the `===` predicate both compare by string form
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    val weights = budgets.toSeq.map { case (src, b) =>
      src -> (if (totals.getOrElse(src, 0L) <= 0L) 1.0
              else b.toDouble / totals(src))
    }
    docs.filter(weightedSample(col(idCol), col(sourceCol), weights))
  }

  /** DSIR importance weights (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023 — public): score
    * every document by how much more likely its hashed n-gram features
    * are under a TARGET distribution (the rows matching `targetPred` —
    * e.g. a trusted high-quality subset) than under the raw corpus, so a
    * later resampling pass can pull a target-shaped subset out of bulk
    * web data. The classic use: target = curated text, corpus = crawl.
    *
    * Model shape is the paper's: unigram+bigram occurrences hashed into
    * a FIXED 256-bucket space (first 2 hex chars of md5 — the same
    * engine-portable hash family as everything else here), bag-of-
    * buckets generative models for target and corpus with Laplace
    * smoothing, and `log w(doc) = Σ_terms [ln p̂_t(b) − ln p̂_r(b)]`.
    *
    * Scale: hashing bounds the model at 256 rows REGARDLESS of corpus
    * size (a raw-vocab model is unbounded — the same reason
    * charTrigramFluency can't broadcast its table); the llr table
    * broadcasts into the occurrence stream, so the only full-width
    * shuffle is the per-doc sum, partially aggregated map-side.
    * Determinism: counts are exact integers; per-bucket llr rounds to 6
    * decimals (the cross-engine `ln` contract t_tfidf_topterms pins),
    * and the per-doc sum rounds to 6 AS WELL — NOT coarser: the
    * summands are multiples of 1e-6, so sums land exactly on the
    * half-way points of any coarser decimal grid (x.xxxx5 for 4
    * decimals), where HALF_UP diverges across engines on last-ulp
    * noise; at the summands' own granularity the sum sits ~5e-7 from
    * every boundary, 6 orders beyond the fold-order error.
    *
    * Returns (idCol, n_terms, logw); docs with no terms drop out. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  targetPred: Column): DataFrame = {
    val B = 256 // 2 hex chars; hardwired so bucket = substr(md5, 1, 2)
    val toks = TextAnalysis.tokens(col(textCol))
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    // persisted: the occurrence stream feeds the bucket-count model AND
    // the per-doc sum — without it the tokenize+explode runs twice
    // (same pattern as charTrigramFluency's trigram table)
    val tok = Partitioning.spread(docs)
      .select(col(idCol), targetPred.as("is_t"),
        explode(concat(toks, bigrams)).as("term"))
      .filter(col("term") =!= "")
      .select(col(idCol), col("is_t"),
        substring(md5(col("term").cast("binary")), 1, 2).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bucket counts over the FULL 2-hex domain (an absent bucket still
    // contributes its smoothed prior to the llr table)
    val counts = tok.groupBy("b").agg(
      count(lit(1)).as("cr"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))
    val domain = docs.sparkSession.range(B)
      .select(format_string("%02x", col("id")).as("b"))
    val filled = domain.join(counts, Seq("b"), "left")
      .select(col("b"), coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"))
    val totals = filled.agg(sum("cr").as("r_tot"), sum("ct").as("t_tot"))
    // scalar-broadcast cross join (1 row), like the other corpus stats
    val llr = filled.crossJoin(broadcast(totals))
      .select(col("b"), round(
        log((col("ct") + lit(1.0)) / (col("t_tot") + lit(B.toDouble))) -
          log((col("cr") + lit(1.0)) / (col("r_tot") + lit(B.toDouble))),
        6).as("llr"))
    tok.join(broadcast(llr), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), round(sum("llr"), 6).as("logw"))
  }

  /** Per-source distribution drift vs the whole corpus: Jensen–Shannon
    * divergence between each source's hashed-ngram bucket distribution
    * and the corpus-wide one — the drift monitor a pipeline runs when a
    * crawl or source refresh lands (JSD is symmetric and bounded by
    * ln 2, so one alert threshold serves every source).
    *
    * Model shape is [[dsirWeights]]'s: unigram+bigram occurrences
    * hashed into the fixed 256-bucket space, Laplace-smoothed
    * bag-of-buckets distributions. The per-(source, bucket) count table
    * is the ONLY full-width aggregation (≤ |sources|·256 rows after the
    * map-side partial agg); the corpus distribution derives from that
    * table, so the corpus is scanned once. Determinism: counts are
    * exact integers, every per-bucket contribution rounds to 6 decimals
    * and sums in exact decimal over the filled 256-bucket domain
    * (order-free), leaning on the same cross-engine ln contract as the
    * llr table.
    *
    * Returns (sourceCol, n_terms, jsd). */
  def sourceDivergence(docs: DataFrame, sourceCol: String,
                       textCol: String): DataFrame = {
    val B = 256
    val toks = TextAnalysis.tokens(col(textCol))
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    // persisted: five consumers (sources, grid fill, both marginals,
    // the scalar total) hang off this aggregate — without the persist
    // the "corpus scanned once" contract would rest on ReuseExchange
    // recognizing five canonically-identical subtrees, which any later
    // edit to one branch silently breaks. The cached table is at most
    // |sources|·256 rows.
    val counts = Partitioning.spread(docs)
      .select(col(sourceCol), explode(concat(toks, bigrams)).as("term"))
      .filter(col("term") =!= "")
      .select(col(sourceCol),
        substring(md5(col("term").cast("binary")), 1, 2).as("b"))
      .groupBy(sourceCol, "b").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // fill the full (source × bucket) grid: an absent bucket still
    // carries its smoothed prior into both distributions
    val sources = counts.select(sourceCol).distinct()
    val domain = docs.sparkSession.range(B)
      .select(format_string("%02x", col("id")).as("b"))
    val filled = sources.crossJoin(domain)
      .join(counts, Seq(sourceCol, "b"), "left")
      .select(col(sourceCol), col("b"), coalesce(col("c"), lit(0L)).as("c"))
    val srcTot = filled.groupBy(sourceCol).agg(sum("c").as("n_s"))
    val bucketTot = filled.groupBy("b").agg(sum("c").as("cc"))
    val corpusTot = bucketTot.agg(sum("cc").as("n_c"))
    val joined = filled.join(broadcast(srcTot), Seq(sourceCol))
      .join(broadcast(bucketTot), Seq("b"))
      .crossJoin(broadcast(corpusTot)) // scalar row, the llr convention
    val p = (col("c") + lit(1.0)) / (col("n_s") + lit(B.toDouble))
    val q = (col("cc") + lit(1.0)) / (col("n_c") + lit(B.toDouble))
    val m = (p + q) / lit(2.0)
    val contrib = round((p * log(p / m) + q * log(q / m)) / lit(2.0), 6)
    joined
      .select(col(sourceCol), col("c"), contrib.cast("decimal(18,6)").as("j"))
      .groupBy(sourceCol)
      .agg(sum(col("c")).as("n_terms"),
        round(sum(col("j")).cast("double"), 6).as("jsd"))
  }

  /** Deterministic source-weighted interleave — the training-mix
    * ORDERING problem (a mixture spec says "2 parts web to 1 part
    * code"; the loader needs one merged stream realizing those rates
    * without a stateful merger). Each document draws an exponential
    * arrival clock `-ln(u)/w` from its id hash (u the exact
    * hash-uniform of md5 chars 9–16, the t_dsir_sample construction);
    * ascending clock order IS the interleaved stream: source arrival
    * rates are proportional to their weights (competing exponential
    * clocks), the order is reproducible across runs and cluster sizes,
    * and any prefix of the stream realizes the mixture. Weight 0 or an
    * unlisted source never arrives (clock = +∞, filtered).
    *
    * Map-only key assignment; the only wide operation is the caller's
    * sort (or top-k for a budgeted prefix) — at 100 TB that sort is the
    * write-side range exchange a training-order materialization pays
    * anyway, and a bounded prefix rides TakeOrderedAndProject. */
  def mixInterleaveKey(id: Column, sourceCol: Column,
                       weights: Seq[(String, Double)]): Column = {
    val u = (conv(substring(idHash(id), 9, 8), 16, 10).cast("double") +
      lit(0.5)) / lit(4294967296.0)
    val w = weights.foldLeft(lit(0.0)) { case (rest, (src, wt)) =>
      when(sourceCol === src, lit(wt)).otherwise(rest)
    }
    when(w > 0.0, round(-log(u) / w, 6))
  }

  /** Deterministic stratified sample: the `k` ids with the smallest
    * [[idHash]] per group — a uniform-without-replacement sample that is
    * reproducible and incrementally stable (a new doc only enters the
    * sample by displacing the current max).
    *
    * Two-stage top-k, because `Window.partitionBy(group)` alone funnels
    * the WHOLE corpus through |groups| reducers (a handful of languages
    * at 100 TB = a handful of hot tasks): stage 1 takes a local top-k
    * per (group, salt) over `salts` deterministic salt buckets — k·salts
    * survivors per group, tiny — and only stage 2 runs the global
    * per-group window over those survivors. Only (group, id, hash)
    * triples ever cross the exchange, never document payloads. */
  def stratifiedTopK(df: DataFrame, groupCol: String, idCol: String,
                     k: Int, salts: Int = 64): DataFrame = {
    val w1 = Window.partitionBy(col(groupCol), col("_salt"))
      .orderBy(col("_h"), col(idCol))
    val w2 = Window.partitionBy(col(groupCol))
      .orderBy(col("_h"), col(idCol))
    df.select(col(groupCol), col(idCol), idHash(col(idCol)).as("_h"),
        pmod(hash(col(idCol)), lit(salts)).as("_salt"))
      .withColumn("_r1", row_number().over(w1)).filter(col("_r1") <= k)
      .withColumn("rnk", row_number().over(w2)).filter(col("rnk") <= k)
      .select(col(groupCol), col(idCol), col("rnk"))
  }

  /** Deterministic epoch-salted global shuffle + shard assignment — the
    * training-data WRITER's layout pass: every epoch gets a different
    * but reproducible permutation (order key = md5 over "epoch:id"),
    * and each row lands in one of `nShards` hash-balanced output
    * shards with its within-shard write position.
    *
    * Scale shape: the order key and shard are map-only; the position is
    * a per-SHARD window — nShards parallel sorts that ARE the write
    * path (repartition by shard + sortWithinPartitions), never one
    * global-order task. Same-epoch runs are append-stable in ORDER:
    * adding rows never reorders surviving pairs (their keys don't
    * change), it only shifts positions.
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
                   nShards: Int): DataFrame = {
    val okey = md5(concat(lit(s"$epoch:"), col(idCol).cast("string"))
      .cast("binary"))
    val shard = pmod(
      conv(substring(col("okey"), 1, 8), 16, 10).cast("long"),
      lit(nShards.toLong)).cast("int")
    df.select(col(idCol), okey.as("okey"))
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("okey"), col(idCol))).cast("int"))
  }

  /** Curriculum mixture schedule — the multi-PHASE generalization of
    * [[tokenBudgetSample]]: each training phase names its own
    * per-source token budgets (warmup on curated sources, core on the
    * broad mix, anneal on a small high-quality slice), and every phase
    * draws an INDEPENDENT deterministic subset via a phase-salted hash
    * (md5 over "phase:id" — the [[epochShuffle]] salt convention), so
    * consecutive phases resample the corpus rather than nesting inside
    * one another the way a shared unsalted hash would force.
    *
    * One row out per (phase, kept doc). Scale shape: the measured
    * per-source token totals are ONE tiny aggregation (|sources| rows
    * to the driver, exactly [[tokenBudgetSample]]'s); after that the
    * pass is map-only — each row evaluates its |phases| literal hex
    * thresholds inline (an explode over a literal array, no shuffle,
    * no per-phase rescan of the corpus). Budgets a source doesn't
    * appear in keep nothing; budgets at or over the source's total
    * keep everything ([[weightHex]]'s top-edge 'g' contract).
    *
    * Determinism across engines: identical to [[tokenBudgetSample]] —
    * the fraction → threshold math is exact IEEE-754, so the SQL twin
    * re-derives the cuts from the same totals and budget literals. */
  def mixSchedule(docs: DataFrame, idCol: String, sourceCol: String,
                  tokenCount: Column,
                  phases: Seq[(String, Map[String, Long])]): DataFrame = {
    val totals = docs.groupBy(col(sourceCol))
      .agg(coalesce(sum(tokenCount.cast("long")), lit(0L)).as("t"))
      // String.valueOf(r.get(0)), not getString(0): the source column
      // may be any type (int shard keys are common); the threshold
      // lookup and the `===` predicate both compare by string form
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    val phaseStructs = phases.map { case (phase, budgets) =>
      val h8 = substring(
        md5(concat(lit(s"$phase:"), col(idCol).cast("string"))
          .cast("binary")), 1, 8)
      val thr = budgets.toSeq.sortBy(_._1)
        .foldLeft(lit(weightHex(0.0))) { case (rest, (src, b)) =>
          val w = if (totals.getOrElse(src, 0L) <= 0L) 1.0
                  else b.toDouble / totals(src)
          when(col(sourceCol) === src, lit(weightHex(w))).otherwise(rest)
        }
      struct(lit(phase).as("phase"), (h8 < thr).as("keep"))
    }
    docs.select(col(idCol), col(sourceCol),
        tokenCount.cast("long").as("n_tokens"),
        explode(array(phaseStructs: _*)).as("p"))
      .filter(col("p.keep"))
      .select(col("p.phase").as("phase"), col(idCol), col(sourceCol),
        col("n_tokens"))
  }
}
