package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KeepBestSpec extends SparkSpec {
  import spark.implicits._

  // hand-built pair graph: {1,2,3} one cluster, {10,11} another,
  // 20 isolated
  private val docs = Seq(
    (1L, 0.5), (2L, 0.9), (3L, 0.9), (10L, 0.2), (11L, 0.1), (20L, 0.7)
  ).toDF("doc_id", "q")
  private val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    .toDF("id_a", "id_b")

  test("keeps the max-score member, ties to the smaller id") {
    val out = Dedup.keepBest(docs, "doc_id", pairs, col("q"))
      .as[(Long, Long, Double, Long)].collect().sortBy(_._2)
    assert(out.toSeq == Seq(
      (2L, 1L, 0.9, 3L),   // 2 and 3 tie at 0.9 → smaller id wins
      (10L, 10L, 0.2, 2L),
      (20L, 20L, 0.7, 1L)))
  }

  test("survivor count = clusters + isolated docs") {
    val n = Dedup.keepBest(docs, "doc_id", pairs, col("q")).count()
    assert(n == 3)
  }

  test("corpus diff labels all four statuses; normalization absorbed") {
    val oldSnap = Seq((1L, "a b"), (2L, "x y"), (3L, "gone"))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, "A  B"), (2L, "y x"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val out = Dedup.corpusDiff(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    // case + whitespace normalize away; token reorder is a real change
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("corpus diff classifies null-text docs by presence, not by fp") {
    val oldSnap = Seq((1L, null.asInstanceOf[String]), (2L, "x"))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, null.asInstanceOf[String]), (3L, "y"))
      .toDF("doc_id", "text")
    val out = Dedup.corpusDiff(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    // null text in both dumps = unchanged, not 'added'
    assert(out == Map(1L -> "unchanged", 2L -> "removed", 3L -> "added"))
  }

  test("differential fuzz vs a local union-find keep-best") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val n = 60
      val ids = (0L until n.toLong).toSeq
      val score = ids.map(i => i -> (rnd.nextInt(5) / 10.0)).toMap
      val edgeList = Seq.fill(25)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      // local union-find
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x
        else { val r = find(parent(x)); parent(x) = r; r }
      edgeList.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = ids.groupBy(find).map { case (_, members) =>
        val best = members.minBy(i => (-score(i), i))
        val rep = members.min
        (best, rep, score(best), members.size.toLong)
      }.toSet

      val docsDf = ids.map(i => (i, score(i))).toDF("doc_id", "q")
      val pairsDf = edgeList.toDF("id_a", "id_b")
      val got = Dedup.keepBest(docsDf, "doc_id", pairsDf, col("q"))
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(got == expected, s"trial $trial: ${got.diff(expected)}")
    }
  }
}
