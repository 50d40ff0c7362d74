package graft.tools

import org.apache.spark.sql.functions._

/** Scale-probe fixture builder: replicates the driver-generated sf0.1
  * tables `factor`× with key-shifted replicas, producing an sf≈1
  * dataset for the numeric-cap validation run (SURVEY/VERDICT r8 task:
  * no execution above sf0.1 had ever validated the driver union-find
  * edge cap, the capped-collect buffers, or the broadcast thresholds
  * against real data growth).
  *
  * Key shifts keep every table's PK space disjoint per replica while
  * leaving foreign keys into the UNSCALED dimension tables (part,
  * supplier, customer, region, nation — copied verbatim) valid.
  * Text/embedding payloads are cloned deliberately: a 10× corpus where
  * every document has nine twins is a denser near-dup graph than any
  * organic 10× growth, so the dedup caps are stressed HARDER than the
  * real scale-up they guard against.
  *
  * Usage: runMain graft.tools.ScaleFixture <srcSfDir> <outDir> [factor]
  */
object ScaleFixture {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus)

    def load(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def save(t: String)(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // copied verbatim: replica-invariant dimensions
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => save(t)(load(t)))

    def reps(shifts: Map[String, Long])(t: String): Unit = {
      val base = load(t)
      val scaled = (0 until factor).map { k =>
        shifts.foldLeft(base) { case (df, (c, unit)) =>
          df.withColumn(c, col(c) + lit(k * unit))
        }
      }.reduce(_ union _)
      save(t)(scaled)
    }

    reps(Map("doc_id" -> 10000000L))("documents")
    reps(Map("vec_id" -> 10000000L))("embeddings")
    reps(Map("l_orderkey" -> 100000000L))("lineitem")
    reps(Map("o_orderkey" -> 100000000L))("orders")
    reps(Map("event_id" -> 1000000000L))("events")

    Seq("documents", "embeddings", "lineitem", "orders", "events")
      .foreach { t =>
        println(s"[scale] $t rows=" + spark.read
          .parquet(s"$out/$t.parquet").count())
      }
    spark.stop()
  }
}
