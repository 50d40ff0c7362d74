package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the step that turns a cleaned
  * document corpus into fixed-size training windows: documents are
  * concatenated in a deterministic shuffled order and the token stream
  * is cut every `capacity` tokens. Each chunk is one training sequence;
  * a document that straddles a cut is split across two sequences — the
  * standard GPT-style pretraining packing, which wastes zero tokens to
  * padding (vs. bin-packing variants that trade boundary splits for
  * padding).
  *
  * Spark-first shape: ONE global concat order would serialize the whole
  * corpus through a single window task, so the corpus is first split
  * into `groups` independent packing streams by a deterministic
  * id-derived key — each group packs its own token stream with a
  * per-group running sum: one shuffle, |groups|-way parallel, no global
  * barrier. At 100 TB, `groups` is a small multiple of the executor
  * count and each group's window is an independent sorted run.
  *
  * Determinism: group = `pmod(id, groups)`; order inside a group =
  * (md5(id), id) — a stable document shuffle (packing wants decorrelated
  * neighbors, and file order correlates with source/time), so the same
  * corpus packs identically on any cluster size or file layout, and an
  * append only extends group tails.
  */
object Packing {

  /** Chunk assignment per document: `(id, pack_group, n_tokens,
    * chunk_id, chunk_offset, spans_boundary)` — `chunk_id`/`chunk_offset`
    * locate the document's first token inside its group's chunk stream;
    * `spans_boundary` marks documents split across two sequences.
    * `idCol` must be integral (the group key is `pmod(id, groups)`). */
  def packChunks(docs: DataFrame, idCol: String, tokenCount: Column,
                 capacity: Int, groups: Int = 64): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(groups > 0, s"groups must be positive, got $groups")
    val w = Window.partitionBy(col("pack_group"))
      .orderBy(col("_h"), col(idCol))
    val start = col("cum") - col("n_tokens") // group token offset of token 0
    docs
      .select(col(idCol), tokenCount.as("n_tokens"),
        pmod(col(idCol), lit(groups)).cast("int").as("pack_group"),
        Sampling.idHash(col(idCol)).as("_h"))
      .withColumn("cum", sum(col("n_tokens").cast("long")).over(w))
      .select(col(idCol), col("pack_group"), col("n_tokens"),
        // chunk_id stays LONG: at the trillions of tokens per group the
        // scaladoc promises, an int cast would silently clamp the tail
        // of a group into chunk 2^31-1
        floor(start / capacity).cast("long").as("chunk_id"),
        (start % capacity).cast("int").as("chunk_offset"),
        (floor((col("cum") - 1) / capacity) >
          floor(start / capacity)).as("spans_boundary"))
  }

  /** Length-bucket padding audit — the batching-efficiency statistic a
    * training pipeline computes BEFORE choosing between padded batches
    * and [[packChunks]]-style packing: assign each document to the
    * smallest configured length bucket that holds it, then report per
    * bucket how many tokens the batch pads away
    * (waste = 1 − Σtokens / (n·bucket)).
    *
    * `edges` must be ascending; documents longer than the last edge
    * land in an `overflowEdge` bucket so the waste arithmetic stays
    * well-defined. A document longer even than `overflowEdge` would be
    * TRUNCATED by a real batcher, so the waste numerator clamps each
    * doc's tokens at its bucket width (otherwise sum_tokens > n·bucket
    * and pad_waste goes negative — nonsense for a padding audit); the
    * over-edge population is reported explicitly as `n_over` so the
    * truncation-needed tail is visible rather than silently absorbed.
    * Pure CASE-chain integer assignment (no log2 — exact on any engine)
    * + one partial aggregation; nothing but (bucket, count, sums)
    * crosses the shuffle. */
  def lengthBuckets(docs: DataFrame, tokenCount: Column, edges: Seq[Int],
                    overflowEdge: Int): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted, s"bad edges: $edges")
    require(overflowEdge >= edges.last, "overflow edge below last edge")
    val bucket = edges.foldRight(lit(overflowEdge): Column) { (e, acc) =>
      when(tokenCount <= e, lit(e)).otherwise(acc)
    }
    docs.select(bucket.as("bucket"), tokenCount.as("n_tokens"))
      // a null token count matches no edge and would otherwise land in
      // the overflow bucket, inflating its n_docs while contributing
      // nothing to sum_tokens — rows without a measurable length are
      // out of scope for a padding audit
      .filter(col("n_tokens").isNotNull)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("sum_tokens"),
        // batch-occupancy numerator: tokens the batch actually holds,
        // i.e. each doc clamped at the bucket width
        sum(least(col("n_tokens"), col("bucket")).cast("long"))
          .as("_held"),
        sum(when(col("n_tokens") > col("bucket"), 1L).otherwise(0L))
          .as("n_over"))
      .select(col("bucket"), col("n_docs"), col("sum_tokens"),
        col("n_over"),
        round(lit(1.0) - col("_held") /
          (col("n_docs") * col("bucket")).cast("double"), 6)
          .as("pad_waste"))
  }

  /** Packing-efficiency report — the companion audit to
    * [[lengthBuckets]]: per pack group, the document and token counts,
    * the number of fixed-width sequences the group emits
    * (⌈Σtokens / capacity⌉ — only the final chunk can be partial), how
    * many documents were split across a sequence boundary, and the
    * fill ratio of the emitted chunks (what packing actually achieves
    * vs lengthBuckets' pad_waste for the padded alternative). Runs
    * [[packChunks]] itself so the boundary arithmetic and the
    * chunk-count denominator can never use different capacities. One
    * partial aggregation; nothing but (group, count, sums) crosses the
    * shuffle. */
  def packEfficiency(docs: DataFrame, idCol: String, tokenCount: Column,
                     capacity: Int, groups: Int = 64): DataFrame =
    packEfficiencyOf(packChunks(docs, idCol, tokenCount, capacity, groups),
      capacity)

  /** The aggregation half of [[packEfficiency]]; private so a caller
    * can't pair a chunks frame with a DIFFERENT capacity than the one
    * that packed it. */
  private def packEfficiencyOf(chunks: DataFrame, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    chunks.groupBy("pack_group")
      .agg(count(lit(1)).cast("int").as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        sum(when(col("spans_boundary"), 1L).otherwise(0L)).cast("int")
          .as("n_spanning"))
      .withColumn("n_chunks",
        floor((col("total_tokens") + capacity - 1) / capacity).cast("long"))
      .withColumn("fill_ratio",
        round(col("total_tokens").cast("double") /
          (col("n_chunks") * capacity).cast("double"), 6))
  }

  /** Per-document overlapping chunking — the RAG-indexing sibling of
    * [[packChunks]]: each document is cut into windows of `window`
    * tokens advancing by `window − overlap`, so consecutive chunks
    * share `overlap` tokens of context (retrieval chunking, not
    * training packing — no cross-document concat, a short tail chunk is
    * kept as-is rather than padded or merged).
    *
    * Map-only: chunk count and slices derive from the token array
    * per-row (`sequence` + `slice`, all codegen'd) — no shuffle, no
    * state; at 100 TB this runs at scan speed and the output
    * partitioning inherits the input's. Chunk count =
    * ⌈max(n − window, 0) / stride⌉ + 1: every token is covered, the
    * final chunk starts at most `stride` short of the end, and no chunk
    * is a pure suffix of its predecessor. */
  def ragChunks(docs: DataFrame, idCol: String, textCol: String,
                window: Int, overlap: Int): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(overlap >= 0 && overlap < window,
      s"overlap must be in [0, window), got $overlap")
    val stride = window - overlap
    val n = size(col("t"))
    val nChunks =
      floor((greatest(n - window, lit(0)) + stride - 1) / stride) + 1
    docs
      .select(col(idCol), split(col(textCol), " ").as("t"))
      .select(col(idCol), col("t"),
        explode(sequence(lit(0), (nChunks - 1).cast("int"))).as("chunk_id"))
      .select(col(idCol), col("chunk_id").cast("int").as("chunk_id"),
        slice(col("t"), col("chunk_id") * stride + 1, lit(window)).as("ct"))
      .select(col(idCol), col("chunk_id"),
        size(col("ct")).as("n_tokens"),
        concat_ws(" ", col("ct")).as("chunk"))
  }
}
