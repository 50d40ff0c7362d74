package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Similarity}

/** Embedding similarity search + multimodal plumbing under the oracle
  * gate. Cosines are computed in double with deterministic fold order on
  * both engines, rounded to 4 decimals before ranking.
  */
object SimilarityQueries {

  val defs: Map[String, QueryFn] = Map(
    // Exact ANN baseline: 10 probe vectors × full corpus, broadcast join.
    "s_ann_topk" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id", "sim", "rnk")
        .orderBy("query_id", "rnk")
    },

    // Scale path: sign-LSH bucketing, probe only the query's bucket.
    "s_ann_lsh" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(
        emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding",
        k = 3, bits = 4, dim = 64)
        .select("query_id", "neighbor_id", "sim", "rnk")
        .orderBy("query_id", "rnk")
    },

    // Multi-probe: also search the Hamming-1 buckets — the recall lever.
    "s_ann_lsh_probe" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopKMultiProbe(
        emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding",
        k = 3, bits = 4, dim = 64)
        .select("query_id", "neighbor_id", "sim", "rnk")
        .orderBy("query_id", "rnk")
    },

    // IVF cell-probe ANN: k-means coarse quantizer trained on a sample,
    // corpus partitioned into cells map-side, queries probe 2 cells.
    // k-means iteration means aren't SQL-expressible → rows-only gate;
    // exactness properties (partition recovery, brute-force recall) are
    // asserted in IvfSpec.
    "s_ann_ivf" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val model = graft.operators.Ivf.fit(emb, "vec_id", "embedding",
        k = 8, iters = 3)
      graft.operators.Ivf.topK(
        emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding",
        model, k = 3, nProbe = 2)
        .select("query_id", "neighbor_id", "sim", "rnk")
        .orderBy("query_id", "rnk")
    },

    // Embedding near-dup pairs, candidate-bounded by sign bucket.
    "s_embed_neardup" -> { (s, dir) =>
      Similarity.nearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.3, bits = 4, dim = 64)
        .orderBy("id_a", "id_b")
    },

    // Multimodal: binary payload → per-partition stub decode →
    // per-kind stats. Runs the real mapPartitions plumbing; the decode
    // features are deterministic functions of the payload so the SQL
    // twin is exact.
    "mm_decode_stats" -> { (s, dir) =>
      val media = Multimodal.mediaFromDocuments(s, t(s, dir, "documents"))
      val feats = Multimodal.extractFeatures(media)
      feats.toDF()
        .groupBy("kind")
        .agg(count(lit(1)).as("n"),
          round(avg(col("width")), 6).as("avg_w"),
          round(avg(col("height")), 6).as("avg_h"),
          sum(col("nFrames")).as("total_frames"))
        .orderBy("kind")
    }
  )

  /** The seeded Rademacher bucket, as SQL: per bit, a left-to-right
    * `0.0 ± v[1] ± v[2] …` sum — the exact fold order (and therefore the
    * exact doubles) of `Similarity.signBucket`. COALESCE mirrors the
    * Scala side's short-vector behavior (missing dims contribute 0). */
  private def bucketSqlExpr(bits: Int, dim: Int): String =
    Similarity.hyperplaneSigns(bits, dim).zipWithIndex.map { case (h, i) =>
      val dot = (0 until dim).map(j =>
        s"${if (h(j) > 0) "+" else "-"} " +
          s"COALESCE(CAST(embedding[${j + 1}] AS DOUBLE), 0.0)")
        .mkString("(0.0 ", " ", ")")
      s"(CASE WHEN $dot >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", "\n + ", ")")

  /** DuckDB-side cosine over zipped unnest, all in double. */
  private def cosineSql(queryFilter: String, bucketJoin: Boolean,
                        k: Int, simThreshold: Option[Double],
                        multiProbe: Boolean = false): String = {
    val bucketExpr = bucketSqlExpr(bits = 4, dim = 64)
    val joinCond =
      if (bucketJoin) "q.bucket = c.bucket AND q.query_id <> c.neighbor_id"
      else "q.query_id <> c.neighbor_id"
    val qCte =
      if (multiProbe)
        s"""q AS (SELECT query_id, qv, xor(b0, m) AS bucket
           |  FROM (SELECT vec_id AS query_id, embedding AS qv,
           |          $bucketExpr AS b0 FROM embeddings WHERE $queryFilter),
           |       (SELECT unnest([0, 1, 2, 4, 8]) AS m))""".stripMargin
      else
        s"""q AS (SELECT vec_id AS query_id, embedding AS qv,
           |      $bucketExpr AS bucket FROM embeddings WHERE $queryFilter)""".stripMargin
    s"""WITH $qCte,
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
       |      $bucketExpr AS bucket FROM embeddings),
       |un AS (SELECT query_id, neighbor_id, unnest(qv) AS x, unnest(cv) AS y
       |       FROM q JOIN c ON $joinCond),
       |s AS (SELECT query_id, neighbor_id,
       |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
       |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS nx,
       |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS ny
       |      FROM un GROUP BY 1, 2),
       |ranked AS (SELECT query_id, neighbor_id,
       |        round(dot / sqrt(nx * ny), 4) AS sim,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY round(dot / sqrt(nx * ny), 4) DESC, neighbor_id)
       |          AS INT) AS rnk
       |      FROM s)
       |SELECT query_id, neighbor_id, sim, rnk FROM ranked
       |WHERE rnk <= $k ${simThreshold.map(t => s"AND sim >= $t").getOrElse("")}
       |ORDER BY query_id, rnk""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "s_ann_topk" -> cosineSql("vec_id < 10", bucketJoin = false, k = 5, None),
    "s_ann_lsh" -> cosineSql("vec_id < 10", bucketJoin = true, k = 3, None),
    "s_ann_lsh_probe" -> cosineSql("vec_id < 10", bucketJoin = true, k = 3,
      None, multiProbe = true),

    "s_embed_neardup" ->
      s"""WITH v AS (SELECT vec_id, embedding,
        |    ${bucketSqlExpr(bits = 4, dim = 64)} AS bucket
        |  FROM embeddings),
        |un AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |        unnest(a.embedding) AS x, unnest(b.embedding) AS y
        |       FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
        |s AS (SELECT id_a, id_b,
        |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS nx,
        |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS ny
        |      FROM un GROUP BY 1, 2)
        |SELECT id_a, id_b, round(dot / sqrt(nx * ny), 4) AS sim FROM s
        |WHERE round(dot / sqrt(nx * ny), 4) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,

    "mm_decode_stats" ->
      """WITH m AS (SELECT doc_id,
        |    (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
        |    strlen(text) AS n FROM documents),
        |f AS (SELECT kind,
        |    64 + (n % 448) AS width, 64 + ((n * 7) % 448) AS height,
        |    CASE WHEN kind = 'video' THEN 1 + n % 30 ELSE 1 END AS nFrames
        |  FROM m)
        |SELECT kind, COUNT(*) AS n,
        |  round(avg(width), 6) AS avg_w, round(avg(height), 6) AS avg_h,
        |  CAST(SUM(nFrames) AS BIGINT) AS total_frames
        |FROM f GROUP BY kind ORDER BY kind""".stripMargin
  )
}
