package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EpochShuffleSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (0L until n.toLong).toDF("doc_id")

  test("same epoch is bit-stable across runs") {
    val a = Sampling.epochShuffle(ids(300), "doc_id", epoch = 3, nShards = 4)
      .collect().map(_.toSeq).toSeq
    val b = Sampling.epochShuffle(ids(300), "doc_id", epoch = 3, nShards = 4)
      .collect().map(_.toSeq).toSeq
    assert(a.sortBy(_.toString) == b.sortBy(_.toString))
  }

  test("different epochs permute differently") {
    def orderOf(e: Int) =
      Sampling.epochShuffle(ids(300), "doc_id", e, nShards = 1)
        .orderBy("pos").select("doc_id").as[Long].collect().toSeq
    val o1 = orderOf(1)
    val o2 = orderOf(2)
    assert(o1.toSet == o2.toSet && o1 != o2)
  }

  test("appending rows never reorders surviving pairs within a shard") {
    def layout(n: Int) =
      Sampling.epochShuffle(ids(n), "doc_id", epoch = 1, nShards = 4)
        .select("doc_id", "shard", "pos").as[(Long, Int, Int)]
        .collect().map { case (id, sh, p) => id -> (sh, p) }.toMap
    val small = layout(200)
    val big = layout(400)
    // shard assignment never changes for surviving ids
    small.foreach { case (id, (sh, _)) => assert(big(id)._1 == sh) }
    // within each shard, the relative order of surviving ids holds
    small.groupBy(_._2._1).foreach { case (_, members) =>
      val byOld = members.toSeq.sortBy(_._2._2).map(_._1)
      val byNew = byOld.sortBy(id => big(id)._2)
      assert(byOld == byNew)
    }
  }

  test("shards are hash-balanced and positions contiguous from 1") {
    val rows = Sampling.epochShuffle(ids(500), "doc_id", epoch = 1,
      nShards = 4)
      .select("shard", "pos").as[(Int, Int)].collect()
    val byShard = rows.groupBy(_._1)
    assert(byShard.keySet.subsetOf(Set(0, 1, 2, 3)))
    byShard.foreach { case (_, m) =>
      // expectation 125; a 4-sigma binomial band is ±~40
      assert(m.length > 80 && m.length < 170, m.length.toString)
      assert(m.map(_._2).sorted.toSeq == (1 to m.length))
    }
  }
}
