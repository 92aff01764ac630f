package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (RRF) — the standard hybrid-retrieval merge:
  * given N independent rankings of (mostly overlapping) candidate sets,
  * each item scores Σ 1/(k0 + rankᵢ) over the lists it appears in, and
  * the fused ordering is by that score. Rank-based fusion needs no score
  * calibration between rankers (BM25's fixed-point sums and a cosine in
  * [−1, 1] fuse directly), which is why it is the default way to combine
  * lexical and embedding retrieval when assembling RAG / search-relevance
  * training corpora.
  *
  * Exactness discipline: each contribution is snapped per-row to
  * `round(10¹² / (k0 + rank))` — one IEEE division and an exact round,
  * identical on any engine — and the fusion total is a BIGINT sum,
  * order-independent and bit-reproducible (the same reason
  * [[Bm25]] sums fixed-point scores, not doubles).
  *
  * Scale shape: input rankings are top-k lists (already
  * TakeOrderedAndProject-bounded), so the union/aggregate here runs over
  * N·k rows per query — driver-sized at any corpus scale. Fusing
  * FULL rankings would be an anti-pattern (RRF weight decays as 1/rank;
  * beyond a few hundred ranks contributions vanish), so callers pass the
  * retrievers' existing top-k outputs.
  */
object RankFusion {

  private val FP = 1e12

  /** Fuse per-item rankings. Each input must carry `idCol` and
    * `rankCol` (1-based). Output: (idCol, rrf_fp, n_lists, fused_rank),
    * top `topK` by exact fixed-point RRF score, ties by id.
    */
  def reciprocalRankFusion(
      rankings: Seq[DataFrame], idCol: String, rankCol: String,
      k0: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val contrib = rankings.map { r =>
      r.select(col(idCol),
        round(lit(FP) / (lit(k0) + col(rankCol))).cast("long")
          .as("contrib_fp"))
    }.reduce(_ unionByName _)
    contrib.groupBy(col(idCol))
      .agg(sum(col("contrib_fp")).as("rrf_fp"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_fp").desc, col(idCol))
      .limit(topK)
      .withColumn("fused_rank", row_number().over(
        Window.orderBy(col("rrf_fp").desc, col(idCol))).cast("long"))
  }
}
