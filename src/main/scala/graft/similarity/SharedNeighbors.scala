package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Per-user top-k neighbors by SHARED DISTINCT ITEMS — the similar-user
  * stage of the top-missed-recordings flow
  * (top_missed_recordings.py:19-32 feeds a 3-neighbor table into the
  * playlist query), bounded for the 100 TB tier.
  *
  * The naive form is the full co-listen pair aggregate: every (u, u')
  * sharing ≥1 item, Θ(Σ_it d_it²) join output AND output-sized state —
  * the last production path in the engine that still absorbed the
  * whole quadratic pair space (346.7 s at the 100× probe). The q281
  * lesson applies because shared-count is an integer dot (Σ 1·1 over
  * the distinct presence): a MIN-SHARED threshold is the τ analog, and
  * filtering `dot ≥ minShared` INSIDE each [[ChunkedPairs]] chunk job
  * keeps the accumulated partials at would-be-kept volume — pairs
  * sharing a single item are the overwhelming bulk of the quadratic
  * blow-up (they arise through every popular item) and are exactly the
  * rows a top-k consumer almost never keeps.
  *
  * Unlike q281's thresholded CONTRACT (neighbors under τ are dropped),
  * this operator's contract is EXACT top-k over the unthresholded pair
  * space: the threshold is an optimization, not a semantic. Exactness
  * holds by coverage: a user with ≥ k surviving neighbors has their
  * true top-k among the survivors (every pruned pair's shared <
  * minShared ≤ every survivor's, and the tiebreak is only consulted
  * between equal shared counts, which never straddle the threshold).
  * Every OTHER user — the tail — gets an exact recompute restricted to
  * their rows: one item-keyed join of tail-presence × full presence,
  * Σ_it d_tail,it·d_it output, i.e. the quadratic term scaled by the
  * tail's item-degree share. The tail is the low-overlap population by
  * construction (fewer than k others sharing ≥ minShared items), so
  * its degree share is small where the threshold is chosen sanely;
  * minShared = 1 degenerates to the exact sweep (empty tail).
  */
object SharedNeighbors {

  /** `(user_id, other_user_id)` — for every user in `cp`, the top-`k`
    * co-listeners by (shared distinct items DESC, other_user_id ASC),
    * row_number semantics, EXACT over the full pair space. `cp` must
    * be the distinct `(uCol, itCol)` presence, pre-pinned by the
    * caller (it is scanned once per chunk job plus once for the tail).
    */
  def topK(
      cp: DataFrame, uCol: String, itCol: String, k: Int,
      minShared: Long = 2L,
      pairChunks: Int = ChunkedPairs.Auto): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val u = col(uCol)
    val counts = cp.select(u.as("u"), col(itCol).as("it"),
      lit(1L).as("c"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("shared").desc, col("other_user_id"))
    if (minShared <= 1L) {
      // no threshold to exploit — the plain hierarchical sweep
      val half = ChunkedPairs.dots(counts, "u", "it", "c", pairChunks)
        .select(col("u1"), col("u2"), col("dot").as("shared"))
      return mirror(half)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k)
        .select(col("user_id"), col("other_user_id"))
    }
    // finder: thresholded sweep — partials hold only pairs a top-k
    // consumer could keep
    val half = ChunkedPairs.dots(counts, "u", "it", "c", pairChunks,
        post = df => df.filter(col("dot") >= minShared))
      .select(col("u1"), col("u2"), col("dot").as("shared"))
    val sym = mirror(half).transform(graft.core.Pin.apply)
    val coveredUsers = sym.groupBy(col("user_id"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= k).select(col("user_id"))
    val coveredTop = sym
      .join(coveredUsers, Seq("user_id"), "left_semi")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("user_id"), col("other_user_id"))
    // tail: users the threshold may have cost a neighbor — exact
    // recompute restricted to their presence rows. Window top-k rides
    // directly on the aggregate (nothing tail-sized is persisted).
    val tailPres = cp.select(u.as("tu"), col(itCol).as("it"))
      .join(coveredUsers.select(col("user_id").as("tu")),
        Seq("tu"), "left_anti")
    val tailShared = tailPres
      .join(cp.select(u.as("ou"), col(itCol).as("it")), Seq("it"))
      .filter(col("tu") =!= col("ou"))
      .groupBy(col("tu").as("user_id"), col("ou").as("other_user_id"))
      .agg(count(lit(1)).as("shared"))
    val tailTop = tailShared
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("user_id"), col("other_user_id"))
    val out = coveredTop.unionByName(tailTop)
      .transform(graft.core.Pin.apply)
    graft.core.Pin.unpin(sym)
    out
  }

  private def mirror(half: DataFrame): DataFrame =
    half.select(col("u1").as("user_id"), col("u2").as("other_user_id"),
        col("shared"))
      .unionByName(half.select(col("u2").as("user_id"),
        col("u1").as("other_user_id"), col("shared")))
}
