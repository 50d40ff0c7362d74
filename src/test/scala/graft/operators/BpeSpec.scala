package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** BPE merge learning: hand-computed sequences, tie-breaking, greedy
  * left-to-right rewrite, and early stop. (Engine equality of the
  * corpus-scale path is the t_bpe_merges gate row.)
  */
class BpeSpec extends AnyFunSuite {

  test("hand-computed merge sequence on 'aaab'") {
    val m = Bpe.fit(Seq(("aaab", 2L)), k = 5)
    // (a,a) counts both overlapping positions (4 weighted); the greedy
    // rewrite merges left-to-right → [aa, a, b]; the (aa,a)/(a,b) tie
    // at 2 breaks lexicographically to (a,b); then (aa,ab); then done.
    assert(m === Seq(
      Bpe.Merge(1, "a", "a", 4),
      Bpe.Merge(2, "a", "b", 2),
      Bpe.Merge(3, "aa", "ab", 2)))
  }

  test("classic corpus: the frequent suffix pair wins round one") {
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val m = Bpe.fit(wc, 4)
    // (e,s) and (s,t) both count 9; lexicographic lhs breaks the tie
    assert(m.head === Bpe.Merge(1, "e", "s", 9))
    assert(m.map(_.rank) === (1 to 4))
    assert(m.forall(_.count > 0))
  }

  test("early stop when no adjacent pair remains") {
    assert(Bpe.fit(Seq(("ab", 1L)), k = 5).map(_.rank) === Seq(1))
    assert(Bpe.fit(Seq(("a", 1L)), k = 5).isEmpty)
    assert(Bpe.fit(Nil, k = 5).isEmpty)
  }

  test("segmentCounts applies the merges the trainer learned") {
    val wc = Seq(("aaab", 2L))
    val merges = Bpe.fit(wc, k = 8) // (a,a), (a,b), (aa,ab) — see above
    assert(Bpe.segmentCounts(wc, merges) === Seq(("aaab", 1)))
    // words outside the trainer's alphabet just segment to chars
    assert(Bpe.segmentCounts(Seq(("xyz", 1L)), merges) === Seq(("xyz", 3)))
    // a prefix of the merges yields the intermediate segmentation
    assert(Bpe.segmentCounts(wc, merges.take(1)) === Seq(("aaab", 3)))
  }

  test("frequency weights, not word counts, drive the winner") {
    // 'xy' appears once but weighs 100; 'ab' in three words weighs 3
    val m = Bpe.fit(Seq(("xy", 100L), ("ab", 1L), ("abc", 1L), ("abd", 1L)), 1)
    assert(m.head === Bpe.Merge(1, "x", "y", 100))
  }

  test("fit is independent of word-count input order") {
    // the distributed word-count collect has no canonical order — the
    // learned merges must not depend on it
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 20) {
      val wc = (0 until 30).map { i =>
        (rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString.toLowerCase,
          1L + rnd.nextInt(50))
      }.distinctBy(_._1)
      val a = Bpe.fit(wc, k = 6)
      val b = Bpe.fit(rnd.shuffle(wc), k = 6)
      assert(a === b, s"order-dependent merges on $wc")
    }
  }

  test("unit counts shrink monotonically and stay in [1, |word|]") {
    val rnd = new scala.util.Random(7)
    val wc = (0 until 40).map { i =>
      (rnd.alphanumeric.take(1 + rnd.nextInt(10)).mkString.toLowerCase,
        1L + rnd.nextInt(9))
    }.distinctBy(_._1)
    val merges = Bpe.fit(wc, k = 10)
    var prev = wc.map { case (w, _) => w -> w.length }.toMap
    for (i <- 1 to merges.length) {
      val cur = Bpe.segmentCounts(wc, merges.take(i)).toMap
      wc.foreach { case (w, _) =>
        assert(cur(w) >= 1 && cur(w) <= w.length)
        assert(cur(w) <= prev(w), s"units grew for $w at merge $i")
      }
      prev = cur
    }
  }
}
