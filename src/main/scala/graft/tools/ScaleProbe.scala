package graft.tools

import org.apache.spark.sql.functions._

/** Production-regime scale probes that the plain Bench-over-ScaleFixture
  * run cannot express (VERDICT r9 task 2):
  *
  *  1. FROZEN-QUERY t_ndcg_eval. ScaleFixture replicates ids with a
  *     constant shift, so the `id % 101 = 0` eval-query sets of BM25
  *     and the dense gold ranking grow WITH the corpus — the probe then
  *     requests |Q|·|C| = 100× work at 10× data by construction. In
  *     production the eval set is fixed. This probe remaps every
  *     replica id (id ≥ 10 000 000) to id·101 + 1 — ≡ 1 (mod 101), so
  *     NO replica doc or vector is ever an eval query, consistently on
  *     both join sides — and times the UNCHANGED gated query: the
  *     sf0.1-sized query set against the full scaled corpus.
  *
  *  2. SCALE-APPROPRIATE k-NN graph build. The gated `s_knn_*` rows fit
  *     IVF with k = 8 cells for a 2 k-vector corpus; per-cell work is
  *     |cell|²·nProbe, so holding k fixed while the corpus grows 10–100×
  *     is the documented anti-pattern (SCALING.md: "thousands of cells
  *     at 100 TB" — k scales with n). This probe refits with
  *     k ≈ √n and times the same `Ivf.knnJoin` cell equi-join, the
  *     configuration a real cluster would run.
  *
  * Usage: runMain graft.tools.ScaleProbe <scaledSfDir> <outJson> [runs]
  * (the frozen variant is materialized next to the input as
  * `<scaledSfDir>-frozen`, documents + embeddings only — the two
  * tables the ndcg pipeline reads).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outJson = args(1)
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)

    // ---- frozen-query fixture variant
    val frozen = s"$sfDir-frozen"
    val marker = new java.io.File(s"$frozen/_done")
    if (!marker.exists()) {
      def remap(table: String, idCol: String): Unit =
        spark.read.parquet(s"$sfDir/$table.parquet")
          .withColumn(idCol, when(col(idCol) >= 10000000L,
            col(idCol) * 101L + 1L).otherwise(col(idCol)))
          .write.mode("overwrite").parquet(s"$frozen/$table.parquet")
      remap("documents", "doc_id")
      remap("embeddings", "vec_id")
      marker.getParentFile.mkdirs()
      java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
    }
    val nDocs = spark.read.parquet(s"$frozen/documents.parquet").count()
    val nQ = spark.read.parquet(s"$frozen/embeddings.parquet")
      .filter(col("vec_id") % 101 === 0).count()

    def time[A](fn: => A): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def stats(name: String, fn: => Unit): (String, Seq[Double]) = {
      graft.queries.clearFitMemo()
      fn // untimed warmup (codegen/JIT/page cache)
      val ts = (0 until runs).map { _ =>
        graft.queries.clearFitMemo()
        spark.catalog.clearCache()
        time(fn)
      }
      println(s"[probe] $name runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      name -> ts
    }

    val ndcg = stats("t_ndcg_eval_frozen", {
      graft.SparkEntry.queries("t_ndcg_eval")(spark, frozen).count(); ()
    })

    // ---- scale-appropriate k-NN graph build on the SCALED corpus
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val kCells = math.max(8, math.sqrt(n.toDouble).toInt)
    val knn = stats(s"knn_graph_k$kCells", {
      val model = graft.operators.Ivf.fit(
        emb, "vec_id", "embedding", k = kCells, iters = 3)
      graft.operators.Ivf.knnJoin(emb, "vec_id", "embedding",
        model, k = 3, nProbe = 2).count()
      ()
    })

    def med(ts: Seq[Double]): Double = {
      val s = ts.sorted; s(s.size / 2)
    }
    val results = Seq(ndcg, knn)
    val json = results.map { case (name, ts) =>
      s""""$name":{"med":${med(ts)},"min":${ts.min},"max":${ts.max},""" +
        s""""runs":[${ts.mkString(",")}]}"""
    }.mkString(
      s"""{"sf_dir":"$sfDir","n_docs":$nDocs,"n_queries":$nQ,""" +
        s""""n_vectors":$n,"k_cells":$kCells,"probes":{""",
      ",", "}}")
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
