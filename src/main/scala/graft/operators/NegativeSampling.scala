package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic negative sampling for implicit-feedback training —
  * the standard companion of the ALS/BPR pipelines ([[graft.recs.Als]];
  * reference: recommender model training over listen interactions):
  * for every user, draw `m` candidate items uniformly from the item
  * domain by COUNTER, drop the ones the user actually interacted with
  * (anti-join), and keep the first `k` survivors in draw order.
  *
  * The naive formulation is `users × items` minus positives — a cross
  * product that is exactly what cannot exist at 100 TB. Here the
  * generated frame is O(users × m) rows, the anti-join shuffles on
  * (user, item) like any fact join, and the final cut is a window
  * over ≤ m rows per user — every stage is bounded by the SAMPLE
  * size, not the domain product.
  *
  * Determinism: candidates come from a counter-based mixer (the
  * Squares/Philox idea reduced to 31-bit lanes) — two
  * multiply-xorshift rounds mod 2^31, all intermediates < 2^63 so the
  * arithmetic never overflow-wraps, which makes the stream exactly
  * replayable in ANY engine with `*`, `%`, `xor`, `>>` on 64-bit ints
  * (DuckDB included — that is what lets q237 hash-match; engines with
  * wrap-around semantics could use a full SplitMix64, but DuckDB
  * RAISES on bigint overflow, so the 31-bit lane is the portable
  * choice). Same draw stream on every run, every partitioning, every
  * engine — the reproducible-training-set requirement.
  */
object NegativeSampling {

  /** 2^31 — the mixer's lane modulus. */
  val Mod: Long = 1L << 31

  /** Counter-based uniform value in [0, 2^31): two rounds of
    * multiply + xorshift over the (user, draw, salt) counter. */
  def mix(user: Column, draw: Column, salt: Long): Column = {
    val h0 = pmod(
      pmod(user.cast("long"), lit(Mod)) * lit(2654435761L) +
        draw.cast("long") * lit(97L) + lit(salt),
      lit(Mod))
    val h1 = pmod(
      h0.bitwiseXOR(shiftright(h0, 15)) * lit(2246822519L), lit(Mod))
    h1.bitwiseXOR(shiftright(h1, 13))
  }

  /** First-k surviving negative draws per user.
    *
    * @param users     one row per user (`userCol`)
    * @param positives observed (user, item) interactions to exclude
    * @param itemCount dense item-domain size: items are ids
    *                  [0, itemCount) (at scale, produce dense ids the
    *                  Als.denseIds way and join back to natural keys)
    * @param k         negatives wanted per user
    * @param m         candidate draws per user (k + headroom for
    *                  positive/duplicate collisions; users whose
    *                  survivors fall short of k keep what survived —
    *                  deterministically)
    * @return (user, item, draw, rnk) — `draw` is the surviving
    *         candidate's counter, `rnk` its 1-based order
    */
  def negatives(
      users: DataFrame, userCol: Column,
      positives: DataFrame, posUserCol: Column, posItemCol: Column,
      itemCount: Long, k: Int, m: Int, salt: Long = 20240801L)
      : DataFrame = {
    require(k >= 1 && m >= k, s"need m >= k >= 1, got k=$k m=$m")
    require(itemCount >= 1, s"itemCount must be >= 1, got $itemCount")
    val cand = users
      .select(userCol.cast("long").as("user"))
      .select(col("user"),
        explode(sequence(lit(1L), lit(m.toLong))).as("draw"))
      .withColumn("item",
        pmod(mix(col("user"), col("draw"), salt), lit(itemCount)))
    val pos = positives.select(
      posUserCol.cast("long").as("user"), posItemCol.cast("long").as("item"))
    val survivors = cand
      .join(pos, Seq("user", "item"), "left_anti")
      // the same item can be drawn twice for a user: keep the first
      .groupBy(col("user"), col("item"))
      .agg(min(col("draw")).as("draw"))
    // ≤ m rows per user — the window frame is bounded by the draw
    // count, never by the item domain
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user")).orderBy(col("draw"))
    survivors
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}
