package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S1/S3 — parallel snapshot sharding. No live MySQL in the sandbox, so
  * the JDBC reader itself is covered by the generated predicate array
  * (what `spark.read.jdbc` pushes into the remote WHERE clauses) plus a
  * fixture-DataFrame proof that the CRC32 shards are disjoint and
  * complete (mirrors mysql_api.py:110-157).
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("shardPredicates: one pushable WHERE clause per worker") {
    val preds = Snapshot.shardPredicates(Seq("id", "sub"), 4)
    assert(preds.length === 4)
    preds.zipWithIndex.foreach { case (p, w) =>
      assert(p ===
        s"CRC32(CONCAT_WS('|', COALESCE(CAST(id AS CHAR), ''), " +
          s"COALESCE(CAST(sub AS CHAR), ''))) % 4 = $w")
    }
  }

  test("shards are disjoint and complete over a composite PK") {
    val rows = (1 to 1000).map(i => (i.toLong, s"k${i % 7}"))
      .toDF("id", "sub")
    val n = 5
    val counts = (0 until n).map { w =>
      rows.filter(Snapshot.shardPredicate(Seq("id", "sub"), n, w)).count()
    }
    assert(counts.sum === 1000L)        // complete
    assert(counts.forall(_ > 0))        // actually spread
    // disjoint: every row matches exactly one shard id
    val matchedOnce = rows.select(
      (0 until n).map(w =>
        when(Snapshot.shardPredicate(Seq("id", "sub"), n, w), 1)
          .otherwise(0)).reduce(_ + _).as("m"))
      .filter(col("m") === 1).count()
    assert(matchedOnce === 1000L)
  }
}
