package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing invariants: the per-group token
  * stream is gap-free and order-stable, chunk coordinates are
  * consistent, and the packing is independent of physical row order.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs() = (1L to 200L).map(i =>
    (i, 1 + (i * 7 % 23).toInt)).toDF("id", "toks")

  test("chunk coordinates: offsets in range, spans iff overflow, gap-free") {
    val packed = Packing.packChunks(docs(), "id", col("toks"),
      capacity = 50, groups = 4).collect()
    packed.foreach { r =>
      val (n, chunk, off, spans) = (r.getInt(2), r.getLong(3), r.getInt(4),
        r.getBoolean(5))
      assert(off >= 0 && off < 50)
      assert(chunk >= 0)
      // a doc spans a boundary exactly when it overflows its chunk
      assert(spans === (off + n > 50), s"row $r")
    }
    // gap-free concat per group: doc starts tile the token stream
    packed.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      val starts = rows.map(r => r.getLong(3) * 50L + r.getInt(4)).sorted
      val total = rows.map(_.getInt(2).toLong).sum
      // walk: sorted starts must be the running sum of the doc sizes in
      // stream order — i.e. the stream has no holes and no overlaps
      val sizesInOrder = rows.sortBy(r => r.getLong(3) * 50L + r.getInt(4))
        .map(_.getInt(2).toLong)
      val cum = sizesInOrder.scanLeft(0L)(_ + _).init
      assert(starts === cum)
      assert(cum.lastOption.getOrElse(0L) + sizesInOrder.lastOption
        .getOrElse(0L) === total)
    }
  }

  test("packing is independent of physical row order and partitioning") {
    val a = Packing.packChunks(docs(), "id", col("toks"), 50, 4)
      .collect().map(_.toSeq).toSet
    val b = Packing.packChunks(docs().orderBy(col("id").desc).repartition(7),
      "id", col("toks"), 50, 4).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("groups partition the corpus; every doc packed exactly once") {
    val packed = Packing.packChunks(docs(), "id", col("toks"), 50, 4)
    assert(packed.count() === 200)
    assert(packed.select("id").distinct().count() === 200)
    assert(packed.select("pack_group").distinct().count() === 4)
  }

  test("ragChunks: exact boundaries, overlap content, full coverage") {
    val toks = (1 to 150).map(i => s"t$i")
    val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val chunks = Packing.ragChunks(df, "doc_id", "text",
      window = 64, overlap = 16)
      .orderBy("chunk_id").collect()
    // 150 tokens, stride 48: chunks at 0, 48, 96 — tail is 54 tokens
    assert(chunks.map(_.getAs[Int]("chunk_id")).toSeq === Seq(0, 1, 2))
    assert(chunks.map(_.getAs[Int]("n_tokens")).toSeq === Seq(64, 64, 54))
    val texts = chunks.map(_.getAs[String]("chunk").split(" ").toSeq)
    assert(texts(0) === toks.slice(0, 64))
    assert(texts(1) === toks.slice(48, 112))
    assert(texts(2) === toks.slice(96, 150))
    // consecutive chunks share exactly the overlap region
    assert(texts(0).takeRight(16) === texts(1).take(16))
    assert(texts(1).takeRight(16) === texts(2).take(16))
    // every token covered
    assert(texts.flatten.toSet === toks.toSet)
  }

  test("ragChunks: a short document is one unpadded chunk") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val c = Packing.ragChunks(df, "doc_id", "text", 64, 16).collect()
    assert(c.length === 1)
    assert(c(0).getAs[Int]("chunk_id") === 0)
    assert(c(0).getAs[Int]("n_tokens") === 3)
    assert(c(0).getAs[String]("chunk") === "a b c")
  }

  test("length buckets: boundary inclusive, overflow bucket, exact waste") {
    val d = Seq(16, 17, 32, 33, 200).zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("id", "toks")
    val out = Packing.lengthBuckets(d, col("toks"),
        edges = Seq(16, 32), overflowEdge = 256)
      .orderBy("bucket")
      .as[(Int, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (16, 1L, 16L, 0L, 0.0),                   // exactly-full bucket
      (32, 2L, 49L, 0L, 1.0 - 49.0 / 64.0),      // 17 and 32 share it
      (256, 2L, 233L, 0L,
        BigDecimal(1.0 - 233.0 / 512.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("length buckets: docs over the overflow edge clamp, never negative") {
    // 300 and 500 exceed overflowEdge=256: a real batcher truncates
    // them, so held tokens clamp at 256 each and waste stays in [0, 1)
    val d = Seq((1L, 300), (2L, 500), (3L, 100)).toDF("id", "toks")
    val out = Packing.lengthBuckets(d, col("toks"),
        edges = Seq(128), overflowEdge = 256)
      .orderBy("bucket")
      .as[(Int, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (128, 1L, 100L, 0L,
        BigDecimal(1.0 - 100.0 / 128.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      // sum_tokens keeps the RAW total (800 > 512) for visibility, but
      // the waste numerator holds 256+256 and n_over reports the tail
      (256, 2L, 800L, 2L, 0.0)))
    assert(out.forall { case (_, _, _, _, w) => w >= 0.0 && w < 1.0 })
  }

  test("length buckets: misordered edges or low overflow are rejected") {
    val d = Seq((1L, 5)).toDF("id", "toks")
    intercept[IllegalArgumentException] {
      Packing.lengthBuckets(d, col("toks"), Seq(32, 16), 256)
    }
    intercept[IllegalArgumentException] {
      Packing.lengthBuckets(d, col("toks"), Seq(16, 32), 8)
    }
  }
}
