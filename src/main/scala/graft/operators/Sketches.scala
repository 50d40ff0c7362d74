package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed cardinality sketches.
  *
  * [[hllDistinct]] is HyperLogLog (Flajolet et al. 2007) built from
  * first principles on md5 instead of Spark's engine-private
  * `approx_count_distinct` HLL++, for two reasons that matter here:
  *
  *  - **engine-exact replay**: every step — the 60-bit hash, the
  *    register split, the scaled-integer register sum, the shared
  *    α·m²·2^(F+1) literal, the linear-counting branch — is plain
  *    column arithmetic a SQL oracle (DuckDB) reproduces bit for bit,
  *    so the sketch sits under the same hash-equality gate as every
  *    exact operator;
  *  - **order-free exactness**: register sums stay in scaled integers
  *    (Σ 2^(F+1−M_j) with absent registers contributing 2^(F+1)), so
  *    no floating summation order exists to differ across engines,
  *    partitionings, or cluster sizes. The ONLY doubles are one shared
  *    numerator literal, one division, and the ln of the
  *    linear-counting branch.
  *
  * Scale shape: the register table partial-aggregates map-side, so the
  * only exchange is ≤ |groups|·2^p rows of (group, bucket, max rho)
  * no matter the corpus size — this is the estimate a 100 TB dedup
  * planner buys before paying for an exact COUNT(DISTINCT) shuffle.
  */
object Sketches {

  /** α_m from the HLL paper (m ≥ 128 uses the asymptotic form). */
  def alpha(p: Int): Double = {
    val m = 1 << p
    if (m >= 128) 0.7213 / (1.0 + 1.079 / m)
    else if (m == 64) 0.709
    else if (m == 32) 0.697
    else 0.673
  }

  /** α_m·m²·2^(F+1) folded into ONE double so the estimate is a single
    * division by the integer-exact register sum. Shared with SQL
    * oracles via interpolation — both engines embed the identical
    * literal. F = 60 − p is the rho field width. */
  def scaledAlpha(p: Int): Double = {
    val m = 1 << p
    alpha(p) * m * m * math.pow(2.0, 61 - p)
  }

  /** Per-group HLL distinct estimate of `value` (any column; hashed
    * internally with md5, so determinism is the operator's own
    * contract). p ∈ [4, 14] register bits; estimate column `outCol`
    * rounded to 4 decimals. Groups with no rows simply don't appear
    * (SQL GROUP BY semantics). */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], value: Column,
                  p: Int = 9, outCol: String = "hll_est"): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, value, p), groupCols, p, outCol)

  /** The register table alone: (group..., _hll_bucket, max rho). A
    * max-aggregate, so it runs UNCHANGED as a streaming query (complete
    * mode) with state bounded by |groups|·2^p — sketch a stream live,
    * then finalize with [[hllEstimate]] on the sink. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], value: Column,
                   p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 14, s"hllRegisters: p=$p outside [4,14]")
    val m = 1 << p
    val s = 61 - p // F + 1, the max rho (all F field bits zero)
    // 60-bit hash: 15 md5 hex chars — fits BIGINT in Spark and DuckDB
    val fp = md5(value.cast("binary"))
    val v = conv(substring(fp, 1, 15), 16, 10).cast("long")
    val wBits = shiftright(v, p)
    val rho = when(wBits === 0, lit(s)).otherwise(lit(s) - length(bin(wBits)))
    df.select(groupCols.map(col) ++ Seq(
        v.bitwiseAND(lit((m - 1).toLong)).as("_hll_bucket"),
        rho.as("_hll_rho")): _*)
      .groupBy((groupCols :+ "_hll_bucket").map(col): _*)
      .agg(max("_hll_rho").as("_hll_mrho"))
  }

  /** Fold a [[hllRegisters]] table (same p) into the per-group
    * estimate. */
  def hllEstimate(reg: DataFrame, groupCols: Seq[String], p: Int = 9,
                  outCol: String = "hll_est"): DataFrame = {
    val m = 1 << p
    val s = 61 - p
    val per = reg.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("_hll_present"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), $s - _hll_mrho)"))
        .as("_hll_sumpow"))
    val zeroRegs = lit(m.toLong) - col("_hll_present")
    val raw = lit(scaledAlpha(p)) /
      (col("_hll_sumpow") + zeroRegs * lit(1L << s)).cast("double")
    val est = when(raw <= lit(2.5 * m) && zeroRegs > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeroRegs.cast("double")))
      .otherwise(raw)
    per.select(groupCols.map(col) :+ round(est, 4).as(outCol): _*)
  }

  /** Row hash: 60 bits of md5("row|value") modulo width — independent
    * hashes from the one md5 both engines share, the seed riding the
    * string prefix. Shared by the CMS counters and the bloom filter. */
  private def seededBucket(row: Column, v: Column, width: Int): Column =
    conv(substring(md5(concat(concat(row.cast("string"), lit("|")), v)
      .cast("binary")), 1, 15), 16, 10).cast("long") % width

  /** Count-min sketch counters (Cormode & Muthukrishnan 2005) of the
    * multiset `value`: depth·width integer counters as a
    * (_cms_row, _cms_bucket, _cms_count) relation. Everything is
    * integer sums — deterministic on any partitioning, mergeable by
    * addition, and exactly replayable by a SQL oracle. The exchange is
    * the partially-aggregated counter table: ≤ depth·width rows per map
    * partition no matter the corpus size. */
  def cmsCounters(df: DataFrame, value: Column,
                  depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 8, s"cmsCounters: depth=$depth")
    require(width >= 16, s"cmsCounters: width=$width")
    df.select(value.as("_cms_v"),
        explode(typedlit((0 until depth).toList)).as("_cms_row"))
      .select(col("_cms_row"),
        seededBucket(col("_cms_row"), col("_cms_v"), width).as("_cms_bucket"))
      .groupBy("_cms_row", "_cms_bucket")
      .agg(count(lit(1)).as("_cms_count"))
  }

  /** Point-estimate the frequency of each probe value against a counter
    * table from [[cmsCounters]] (same depth/width): est = min over rows
    * of the addressed counter — the classic CMS upper bound (never an
    * underestimate; over by at most εN w.h.p., ε ≈ e/width). The counter
    * table is ≤ depth·width rows, so it BROADCASTS into the probe side;
    * probes missing from every counter row get 0 (only possible when the
    * sketch saw no data). */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, value: Column,
                  depth: Int = 4, width: Int = 1024,
                  outCol: String = "cms_est"): DataFrame = {
    val keyed = probes.select(probes.columns.map(col) :+
      explode(typedlit((0 until depth).toList)).as("_cms_row"): _*)
      .withColumn("_cms_bucket", seededBucket(col("_cms_row"), value, width))
    keyed.join(broadcast(counters), Seq("_cms_row", "_cms_bucket"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("_cms_count"), lit(0L))).as(outCol))
  }

  /** Bloom filter as a relation: the DISTINCT (hash row, bucket) pairs
    * of `value` under `k` seeded hashes over `bits` buckets — ≤ k·bits
    * rows however large the reference set, built with one distinct
    * aggregate (partial map-side). */
  def bloomSet(df: DataFrame, value: Column,
               k: Int = 3, bits: Int = 65536): DataFrame = {
    require(k >= 1 && k <= 8, s"bloomSet: k=$k")
    require(bits >= 64, s"bloomSet: bits=$bits")
    df.select(value.as("_bf_v"),
        explode(typedlit((0 until k).toList)).as("_bf_row"))
      .select(col("_bf_row"),
        seededBucket(col("_bf_row"), col("_bf_v"), bits).as("_bf_bucket"))
      .distinct()
  }

  /** Membership test against a [[bloomSet]] (same k/bits): true iff ALL
    * k addressed buckets are present — no false negatives, false
    * positives at rate ≈ (1 − e^(−kn/bits))^k. The set relation
    * broadcasts into the probe side; deterministic and SQL-replayable
    * like the other sketches. */
  def bloomMightContain(set: DataFrame, probes: DataFrame, value: Column,
                        k: Int = 3, bits: Int = 65536,
                        outCol: String = "might_contain"): DataFrame = {
    val keyed = probes.select(probes.columns.map(col) :+
      explode(typedlit((0 until k).toList)).as("_bf_row"): _*)
      .withColumn("_bf_bucket", seededBucket(col("_bf_row"), value, bits))
    keyed.join(broadcast(set.withColumn("_bf_hit", lit(1))),
        Seq("_bf_row", "_bf_bucket"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg((sum(coalesce(col("_bf_hit"), lit(0))) === k).as(outCol))
  }
}
