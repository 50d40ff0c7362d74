package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ReplacingMergeTree-FINAL parity: latest version wins, deletes are
  * physical, compaction preserves the view (oracle-diff style per
  * SURVEY.md §5: expected DataFrame vs engine, exceptAll both ways).
  */
class GraftTableSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType)))

  private def mkTable() =
    GraftTable(spark, tmpDir("graft-table"), Seq("id"), schema)

  private def assertSame(got: org.apache.spark.sql.DataFrame,
                         want: Seq[(Long, String)]): Unit = {
    val w = want.toDF("id", "v")
    assert(got.exceptAll(w).isEmpty && w.exceptAll(got).isEmpty,
      s"got ${got.collect().mkString(",")} want $want")
  }

  test("readAsOf: full history pre-compact; survivors only post-compact") {
    val t = mkTable()
    t.append(Seq((1L, "a1"), (2L, "b1")).toDF("id", "v"), version = 1)
    t.append(Seq((1L, "a2")).toDF("id", "v"), version = 2)
    t.delete(Seq(Tuple1(2L)).toDF("id"), version = 3)
    // the uncompacted log replays any point in time
    assertSame(t.readAsOf(1), Seq((1L, "a1"), (2L, "b1")))
    assertSame(t.readAsOf(2), Seq((1L, "a2"), (2L, "b1")))
    assertSame(t.readAsOf(3), Seq((1L, "a2")))
    t.compact()
    // compaction keeps each key's SURVIVING image with its original
    // stamp and drops everything older (ReplacingMergeTree merge
    // semantics): key 1's v1 history is gone, key 2 is gone entirely
    assertSame(t.readAsOf(1), Seq())
    assertSame(t.readAsOf(2), Seq((1L, "a2")))
    assertSame(t.read, Seq((1L, "a2")))
  }

  test("upsert semantics: latest _version wins per key") {
    val t = mkTable()
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), version = 1)
    t.append(Seq((1L, "a2"), (3L, "c")).toDF("id", "v"), version = 2)
    assertSame(t.read, Seq((1L, "a2"), (2L, "b"), (3L, "c")))
    assert(t.maxVersion === 2)
  }

  test("delete tombstones remove keys; re-insert at higher version revives") {
    val t = mkTable()
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), version = 1)
    t.delete(Seq(Tuple1(1L)).toDF("id"), version = 2)
    assertSame(t.read, Seq((2L, "b")))
    t.append(Seq((1L, "again")).toDF("id", "v"), version = 3)
    assertSame(t.read, Seq((1L, "again"), (2L, "b")))
  }

  test("delete wins over insert at the same version (tie-break)") {
    val t = mkTable()
    t.append(Seq((1L, "a")).toDF("id", "v"), version = 1)
    t.delete(Seq(Tuple1(1L)).toDF("id"), version = 1)
    assertSame(t.read, Seq())
  }

  test("replayed batch (same version) is idempotent (W1 exactly-once)") {
    val t = mkTable()
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), version = 1)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), version = 1) // replay
    assertSame(t.read, Seq((1L, "a"), (2L, "b")))
  }

  test("compact preserves the FINAL view and drops dead versions") {
    val t = mkTable()
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), version = 1)
    t.append(Seq((1L, "a2")).toDF("id", "v"), version = 2)
    t.delete(Seq(Tuple1(2L)).toDF("id"), version = 3)
    val before = t.read.collect().toSet
    t.compact()
    assert(t.read.collect().toSet === before)
    assert(t.log.count() === 1) // only (1, a2) survives physically
    // still writable after compaction
    t.append(Seq((9L, "z")).toDF("id", "v"), version = 4)
    assertSame(t.read, Seq((1L, "a2"), (9L, "z")))
  }

  test("lookup reaches generations written before the PK became integral") {
    val root = tmpDir("graft-gen")
    // gen 0: string PK → no _bucket= dirs on disk
    val t1 = GraftTable(spark, root, Seq("id"), StructType(Seq(
      StructField("id", StringType), StructField("v", StringType))))
    t1.append(Seq(("1", "old"), ("7", "other")).toDF("id", "v"), version = 1)
    // MODIFY id varchar → bigint: same column ids, new type → new generation
    val t2 = GraftTable(spark, root, Seq("id"), Seq(
      GraftColumn(0, "id", LongType), GraftColumn(1, "v", StringType)))
    t2.append(Seq((2L, "new")).toDF("id", "v"), version = 2)
    // pre-retype rows must come back through the pruned lookup path
    assert(t2.lookup(1L).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "old")))
    assert(t2.lookup(2L).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((2L, "new")))
  }

  test("compact collapses mixed bucketed/unbucketed generations; lookup stays correct") {
    val root = tmpDir("graft-cmpgen")
    val t1 = GraftTable(spark, root, Seq("id"), StructType(Seq(
      StructField("id", StringType), StructField("v", StringType))))
    t1.append(Seq(("1", "old"), ("9000000", "far")).toDF("id", "v"), 1)
    val t2 = GraftTable(spark, root, Seq("id"), Seq(
      GraftColumn(0, "id", LongType), GraftColumn(1, "v", StringType)))
    t2.append(Seq((2L, "new")).toDF("id", "v"), 2)
    t2.compact()
    // one generation left, bucketed now that the PK is integral
    assert(t2.log.count() === 3)
    assert(t2.lookup(1L).collect().map(_.getString(1)).toSeq === Seq("old"))
    assert(t2.lookup(9000000L).collect().map(_.getString(1)).toSeq === Seq("far"))
    assert(t2.lookup(2L).collect().map(_.getString(1)).toSeq === Seq("new"))
  }

  test("reader planned before compaction survives the swap (epoch grace)") {
    val t = mkTable()
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), version = 1)
    // the file listing resolves at construction — this plan holds the
    // pre-compaction epoch's concrete file paths
    val planned = t.read
    t.compact()
    // the swapped-out epoch survives one compaction cycle, so the
    // pre-swap plan still reads complete data (the old in-place dir swap
    // made this read come back EMPTY if it raced the renames)
    assertSame(planned, Seq((1L, "a"), (2L, "b")))
    assertSame(t.read, Seq((1L, "a"), (2L, "b")))
    // writes after the swap land in the new epoch and read back
    t.append(Seq((3L, "c")).toDF("id", "v"), version = 2)
    assertSame(t.read, Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the NEXT compaction garbage-collects the old epoch
    t.compact()
    assertSame(t.read, Seq((1L, "a"), (2L, "b"), (3L, "c")))
    val dirs = new java.io.File(t.root).list().toSeq
      .filter(n => n == "data" || n.startsWith("data-e"))
    assert(dirs.size === 2, s"expected current + one grace epoch, got $dirs")
  }

  test("point lookup reads exactly one _bucket directory (prune regression)") {
    val t = mkTable()
    t.append(Seq((1L, "near"), (9000000L, "far")).toDF("id", "v"), version = 1)
    t.append(Seq((9000000L, "far2")).toDF("id", "v"), version = 2)
    // 9000000 / 4294967 = bucket 2; the scan must list ONLY that
    // partition dir — at 100 TB this is the difference between one
    // partition and a full-table scan under the dedup aggregate
    val files = t.lookup(9000000L).inputFiles
    assert(files.nonEmpty && files.forall(_.contains("_bucket=2/")),
      s"lookup leaked outside _bucket=2: ${files.mkString(",")}")
    assert(t.lookup(9000000L).collect().map(_.getString(1)).toSeq
      === Seq("far2"))
    // pruning survives compaction (files move to a new epoch dir)
    t.compact()
    val files2 = t.lookup(9000000L).inputFiles
    assert(files2.nonEmpty && files2.forall(_.contains("_bucket=2/")),
      s"post-compact lookup leaked outside _bucket=2: ${files2.mkString(",")}")
  }

  test("compactZOrder: per-file boxes narrow in BOTH dims; view kept") {
    val schema2 = StructType(Seq(
      StructField("a", LongType), StructField("b", LongType),
      StructField("payload", StringType)))
    // composite key → non-bucketed, the analytic-table shape
    val t = GraftTable(spark, tmpDir("graft-zorder"), Seq("a", "b"), schema2)
    val rows = for (a <- 0L until 64L; b <- 0L until 64L)
      yield (a, b, s"p$a-$b")
    t.append(rows.toDF("a", "b", "payload"), version = 1)
    t.compactZOrder("a", "b", files = 16)
    // the FINAL view is untouched by the layout rewrite
    assert(t.read.count() === 64L * 64L)
    assert(t.read.filter(col("a") === 5 && col("b") === 9)
      .collect().map(_.getString(2)).toSeq === Seq("p5-9"))
    // per-file [min,max] boxes: a point predicate on EITHER dimension's
    // midpoint must touch a strict minority of files — the property a
    // single-column sort cannot give for the second column
    // per-file stats need a RAW scan: input_file_name() does not
    // survive the FINAL view's aggregate
    val boxes = spark.read.parquet(t.read.inputFiles: _*)
      .select(input_file_name().as("f"), col("a"), col("b"))
      .groupBy("f")
      .agg(min("a").as("na"), max("a").as("xa"),
        min("b").as("nb"), max("b").as("xb"))
      .collect()
    assert(boxes.length >= 8, s"expected ~16 files, got ${boxes.length}")
    val hitA = boxes.count(r => r.getLong(1) <= 31 && 31 <= r.getLong(2))
    val hitB = boxes.count(r => r.getLong(3) <= 31 && 31 <= r.getLong(4))
    assert(hitA <= boxes.length / 2,
      s"a-midpoint touches $hitA/${boxes.length} files — no a-locality")
    assert(hitB <= boxes.length / 2,
      s"b-midpoint touches $hitB/${boxes.length} files — no b-locality")
    // bucketed (single-int-pk) tables refuse: their layout is the CDC
    // delete path's pruning contract
    val bucketed = mkTable()
    bucketed.append(Seq((1L, "x")).toDF("id", "v"), version = 1)
    intercept[IllegalArgumentException] {
      bucketed.compactZOrder("id", "id")
    }
  }

  test("truncate clears data, table stays usable") {
    val t = mkTable()
    t.append(Seq((1L, "a")).toDF("id", "v"), version = 1)
    t.truncate()
    assert(t.read.isEmpty)
    t.append(Seq((2L, "b")).toDF("id", "v"), version = 2)
    assertSame(t.read, Seq((2L, "b")))
  }
}
