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
}
