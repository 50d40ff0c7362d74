package graft.queries

import graft.SparkSpec

/** ANN recall floors on two fixtures: the sf0.001 parquet embeddings
  * (uniform random — the degenerate worst case) and the deterministic
  * clustered fixture (low-rank within-cluster variation — the structure
  * real embedding corpora have and the case IVF cells + residual PQ
  * codes are built for).
  *
  * The oracle gate proves each approximate plan computes exactly what it
  * claims; recall@3 vs the exact brute-force top-k measures how
  * approximate the answer IS. On uniform-random vectors cosines cluster
  * near 0 and coarse centroids sit near the origin, so residuals ≈ raw
  * vectors and EVERY code-based ranking is quantization-noise-bound —
  * those floors are regression pins, not quality claims. The clustered
  * fixture is where the methods' design assumptions hold, and where the
  * residual (IVFADC) encoding's value is asserted directly: residual
  * codes must beat raw-vector codes. Bench reports both families per
  * round (`recall` / `recall_clustered` in bench_full.json).
  */
class RecallSpec extends SparkSpec {

  private val fixture = "/root/testdata/sf0.001"

  // measured on the parquet fixture (r7, residual IVFADC): lsh 0.100,
  // lsh_probe 0.467, ivf 0.567, ivf_probe 0.767, pq 0.100, ivfpq 0.100,
  // ivfpq_rerank 0.767 — floors sit one notch below to absorb future
  // re-freezes of the fitted models, and fail loudly on a real collapse
  private val floors = Map(
    "s_ann_lsh" -> 0.05,
    "s_ann_lsh_probe" -> 0.30,
    "s_ann_ivf" -> 0.40,
    "s_ann_ivf_probe" -> 0.60,
    "s_ann_pq" -> 0.05,
    "s_ann_ivfpq" -> 0.05,
    "s_ann_ivfpq_rerank" -> 0.70,
    // SQ8 is the near-lossless tier: 8 bits per DIMENSION (vs PQ's 4
    // bits per 8-dim subspace) must essentially reproduce the exact
    // ranking even on the degenerate uniform fixture
    "s_ann_sq8" -> 0.90,
    // a rank-8 projection of 64-dim ISOTROPIC data keeps 1/8 of the
    // variance by construction — 0.20 measured is the honest degenerate
    // number (the clustered fixture is where the recipe works)
    "s_ann_pca_rerank" -> 0.10)

  // measured on the clustered fixture (r7): lsh 0.767, lsh_probe 1.000,
  // ivf 1.000, ivf_probe 1.000, pq 0.200, ivfpq 0.633, rerank 1.000
  private val clusteredFloors = Map(
    "s_ann_lsh" -> 0.50,
    "s_ann_lsh_probe" -> 0.80,
    "s_ann_ivf" -> 0.90,
    "s_ann_ivf_probe" -> 0.90,
    "s_ann_pq" -> 0.05,
    "s_ann_ivfpq" -> 0.40,
    "s_ann_ivfpq_rerank" -> 0.90,
    "s_ann_sq8" -> 0.90,
    // low-rank within-cluster structure is exactly what a rank-8
    // projection preserves: measured 1.000
    "s_ann_pca_rerank" -> 0.90)

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
    // 8 bits/dim must beat 4 bits/8-dim-subspace on any fixture
    assert(recall("s_ann_sq8") > recall("s_ann_pq"))
  }

  test("clustered fixture: floors hold and residual codes beat raw codes") {
    val emb = SimilarityQueries.clusteredEmbeddings(spark)
    val recall = SimilarityQueries.annRecallOn(emb, k = 3)
    info(recall.toSeq.sortBy(_._1)
      .map { case (m, r) => f"$m=$r%.3f" }.mkString(", "))
    assert(recall.keySet === clusteredFloors.keySet)
    clusteredFloors.foreach { case (m, floor) =>
      assert(recall(m) >= floor,
        s"$m clustered recall ${recall(m)} fell below its floor $floor")
    }
    // the IVFADC claim, measured: residual codes (trained and scored on
    // v − coarseCentroid(cell), coarse term re-added cross-cell) must
    // beat raw-vector codes ranking the same corpus — on data where
    // coarse cells align with real clusters, raw codes spend their
    // dynamic range re-describing cell centroids
    assert(recall("s_ann_ivfpq") > recall("s_ann_pq"),
      "residual IVFADC did not beat raw-code ADC on clustered data")
    assert(recall("s_ann_ivfpq_rerank") >= recall("s_ann_ivfpq"))
  }
}
