package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Per-user top-k neighbors by SHARED DISTINCT ITEMS — the similar-user
  * stage of the top-missed-recordings flow
  * (top_missed_recordings.py:19-32 feeds a 3-neighbor table into the
  * playlist query), bounded for the 100 TB tier by HIERARCHICAL top-k
  * (the q101 shape applied to the shared-count metric).
  *
  * The naive form persists the full co-listen pair aggregate — every
  * (u, u') sharing ≥1 item, Θ(Σ_it d_it²) rows (856M at the 100× probe,
  * a 5+ GB partial write re-read twice by the mirror) — before a
  * window cuts top-3. Here each [[ChunkedPairs]] chunk job reduces its
  * complete, disjoint pair aggregate to ≤ k rows per user (mirror +
  * row_number INSIDE the chunk, so Spark's WindowGroupLimit prunes to
  * k per user map-side before the window exchange), and a global
  * window over the ≤ k·users·chunks union finishes. Exact: a user's
  * globally-top pair is top within the one chunk that holds it (chunks
  * route on u1 = min(u, u'), orderings identical), so every global
  * top-k row survives its chunk's cut. The full pair space exists only
  * transiently inside one chunk job's shuffle — the ChunkedPairs
  * out-of-core contract — and nothing pair-space-sized is ever
  * written, pinned, or re-read.
  *
  * Round-12 negative result, recorded so it is not retried: a
  * min-shared threshold inside the chunk (the q281 τ analog for
  * integer dot, with an exact restricted recompute for users left
  * under k survivors) prunes the PERSISTED pairs 21× at sf0.1 — and
  * still measured SLOWER than the naive form at both 1× (14.2 s vs
  * 8.5) and 100× (424 s vs 346.7). The pair-space cost q100 pays is
  * the chunk jobs' join+aggregate shuffle, which no output-side filter
  * touches, while the coverage/tail machinery added three
  * corpus-sized exchanges (presence anti-join, tail join, symmetric
  * pin). The threshold wins only where the OUTPUT feeds further
  * joins (q281's re-scoring); for a top-k consumer the per-chunk
  * window cut is the same-size output bound with none of the side
  * machinery.
  */
object SharedNeighbors {

  /** `(user_id, other_user_id)` — for every user in `cp`, the top-`k`
    * co-listeners by (shared distinct items DESC, other_user_id ASC),
    * row_number semantics, EXACT over the full pair space. `cp` must
    * be the distinct `(uCol, itCol)` presence, pre-pinned by the
    * caller (it is scanned once per chunk job). */
  def topK(
      cp: DataFrame, uCol: String, itCol: String, k: Int,
      pairChunks: Int = ChunkedPairs.Auto): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = cp.select(col(uCol).as("u"), col(itCol).as("it"),
      lit(1L).as("c"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("shared").desc, col("other_user_id"))
    def topkOf(pairs: DataFrame): DataFrame =
      mirror(pairs.select(col("u1"), col("u2"), col("dot").as("shared")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k).drop("__rn")
    ChunkedPairs.dots(counts, "u", "it", "c", pairChunks, post = topkOf)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("user_id"), col("other_user_id"))
  }

  /** Mirror u1<u2 pairs to both directions with ONE generator pass —
    * NOT a self-union: a union's two branches each contain the full
    * upstream subtree, and inside a chunk job that re-runs the chunk's
    * final aggregate pass per branch (the exchange is reused, the
    * post-shuffle aggregation is not — measured +100 s across the 23
    * chunk jobs of the 100× probe vs this explode form). */
  private def mirror(half: DataFrame): DataFrame =
    half.select(col("shared"), explode(array(
        struct(col("u1").as("user_id"), col("u2").as("other_user_id")),
        struct(col("u2").as("user_id"), col("u1").as("other_user_id"))))
        .as("e"))
      .select(col("e.user_id"), col("e.other_user_id"), col("shared"))
}
