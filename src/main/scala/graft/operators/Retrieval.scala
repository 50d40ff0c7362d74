package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval primitives: fusing a lexical ranking (BM25) with a
  * dense (embedding) ranking — the standard two-tower search recipe for
  * RAG indexes and retrieval training data.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack et al. 2009, public) of two ranked
    * lists, each carrying (query_id, neighbor_id, rnk):
    * `rrf = 1/(kConst + r_lex) + 1/(kConst + r_dense)`, a candidate
    * missing from one list contributing 0 from it — so a corpus slice
    * with no embeddings degrades to lexical-only ranking instead of
    * vanishing. Rank arithmetic only (two integer-derived double
    * divisions in fixed order, rounded at the summands' granularity),
    * so the fusion replays exactly in a SQL oracle.
    *
    * Scale shape: inputs are top-k lists — |Q|·k rows each, never
    * corpus-sized — so the full-outer join and the per-query rank
    * window run over bounded relations regardless of corpus size. */
  def rrfFuse(lex: DataFrame, dense: DataFrame, kConst: Int = 60,
              topK: Int = 5): DataFrame = {
    val l = lex.select(col("query_id"), col("neighbor_id"),
      col("rnk").as("r_lex"))
    val d = dense.select(col("query_id"), col("neighbor_id"),
      col("rnk").as("r_dense"))
    val fused = l.join(d, Seq("query_id", "neighbor_id"), "full_outer")
      .select(col("query_id"), col("neighbor_id"),
        round(
          coalesce(lit(1.0) / (lit(kConst) + col("r_lex")).cast("double"),
            lit(0.0)) +
          coalesce(lit(1.0) / (lit(kConst) + col("r_dense")).cast("double"),
            lit(0.0)), 6).as("rrf"))
    Similarity.rankTopK(fused, col("rrf").desc_nulls_last, topK)
  }
}
