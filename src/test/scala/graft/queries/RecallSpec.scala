package graft.queries

import graft.SparkSpec

/** ANN recall floors on the sf0.001 embeddings fixture.
  *
  * The oracle gate proves each approximate plan computes exactly what it
  * claims; recall@3 vs the exact brute-force top-k measures how
  * approximate the answer IS. The fixture embeddings are uniform random
  * vectors — the hardest case for ANN (cosine similarities cluster near
  * 0, so "the" nearest neighbors are separated by hair-thin margins):
  * these floors are regression pins on THIS fixture, not quality claims
  * about the methods. Notably single-bucket sign-LSH (bits=4) and plain
  * PQ (m=8, ksub=16) retain little signal on random data, while
  * multi-probe and IVF cell-probing recover most of it — exactly the
  * recall-lever story the operators' docs tell. Bench reports the same
  * numbers per round (`recall` in bench_full.json) at sf0.1.
  */
class RecallSpec extends SparkSpec {

  private val fixture = "/root/testdata/sf0.001"

  // measured on the fixture (r6): lsh 0.100, lsh_probe 0.467, ivf 0.567,
  // ivf_probe 0.767, pq 0.100, ivfpq 0.167, ivfpq_rerank 0.767 — floors
  // sit one notch below to absorb future re-freezes of the fitted
  // models, and fail loudly on a real collapse
  private val floors = Map(
    "s_ann_lsh" -> 0.05,
    "s_ann_lsh_probe" -> 0.30,
    "s_ann_ivf" -> 0.40,
    "s_ann_ivf_probe" -> 0.60,
    "s_ann_pq" -> 0.05,
    "s_ann_ivfpq" -> 0.10,
    "s_ann_ivfpq_rerank" -> 0.55)

  test("recall@3 of every ANN method clears its recorded floor") {
    assume(new java.io.File(s"$fixture/embeddings.parquet").exists(),
      "testdata fixture not present")
    val recall = SimilarityQueries.annRecall(spark, fixture, k = 3)
    info(recall.toSeq.sortBy(_._1)
      .map { case (m, r) => f"$m=$r%.3f" }.mkString(", "))
    assert(recall.keySet === floors.keySet)
    floors.foreach { case (m, floor) =>
      assert(recall(m) >= floor,
        s"$m recall ${recall(m)} fell below its floor $floor")
    }
    // the recall levers must actually lever: multi-probe beats
    // single-bucket LSH, 4-cell IVF probing beats 2-cell, IVF
    // cell-probe beats code-only PQ, and the exact re-rank beats the
    // raw ADC ranking it shortlists from
    assert(recall("s_ann_lsh_probe") > recall("s_ann_lsh"))
    assert(recall("s_ann_ivf_probe") > recall("s_ann_ivf"))
    assert(recall("s_ann_ivf") > recall("s_ann_pq"))
    assert(recall("s_ann_ivfpq_rerank") > recall("s_ann_ivfpq"))
  }
}
