package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** word2vec-style frequency subsampling (Mikolov et al. 2013 §2.3) —
  * the corpus-curation gate that discards occurrences of very frequent
  * items with probability tied to their corpus share, so the pair
  * generator ([[SkipGrams]]) spends its budget on informative
  * co-occurrences instead of stop-word-like fillers.
  *
  * Keep rule per OCCURRENCE of item i with corpus count c_i out of N:
  * `P_keep = sqrt(t·N/c_i) + t·N/c_i` (≥ 1 for items at or below the
  * frequency floor t — those always survive). The draw is the engine's
  * deterministic-uniform discipline: `u = first 8 hex chars of
  * md5(occurrence-key ":" salt)` compared AS A STRING against the
  * threshold `lpad(hex(floor(P_keep · 2³²)), 8, '0')` — fixed-width
  * lowercase hex compares lexicographically exactly as the numbers do,
  * so the decision replays bit-identically in any engine with md5 and
  * printf-style hex (no hex→int conversion, which SQL dialects
  * disagree on). P_keep itself is IEEE-deterministic: one multiply,
  * one divide, one correctly-rounded sqrt, one add, in a fixed order.
  *
  * Scale (100 TB): counts are ONE map-side-combinable aggregate whose
  * shuffle carries the vocabulary; the keep decision is a vocab-sized
  * dimension join back (AQE broadcasts when it fits) + a map-only
  * filter. No sort, no window, no per-row state.
  */
object FrequencySubsample {

  private val Scale = 4294967296L // 16^8: 8 hex chars of uniform

  /** The input rows that survive subsampling, with the audit columns
    * `item_count` (corpus count) and `keep_thr` (the integer
    * threshold, 0..2³²) attached.
    *
    * @param itemCol item identity (frequency is counted over this)
    * @param occKey  unique, stable per-occurrence key (e.g. event id)
    *                — the thing the uniform draw hashes
    * @param t       frequency floor; items with share ≤ t always kept
    */
  def subsample(
      df: DataFrame, itemCol: Column, occKey: Column,
      t: Double = 1e-4, salt: String = "ss"): DataFrame = {
    val dim = thresholds(df, itemCol, t)
    val uHex = substring(
      md5(concat(occKey.cast("string"), lit(":" + salt)).cast("binary")),
      1, 8)
    df.join(dim, itemCol === col("__item"))
      .filter(col("keep_thr") === lit(Scale) ||
        uHex < lpad(format_string("%x", col("keep_thr")), 8, "0"))
      .drop("__item")
  }

  /** Production draw family (the q218/q268/q278 two-family precedent):
    * identical `keep_thr` algebra to [[subsample]], but the uniform is
    * the UNSIGNED TOP 32 BITS of `xxhash64(occKey || ':' || salt)` —
    * one codegen'd 8-byte hash and a long compare, instead of an md5
    * digest rendered to hex and a per-row `format_string`/`lpad`
    * threshold string build. xxhash64 is not DuckDB-replayable, so the
    * driver gate is the q279 envelope (exact per-item counts and
    * thresholds, floor items kept exactly, subsampled items inside a
    * 5σ binomial band); FrequencySubsampleSpec replays every draw
    * against the clean-room TestXxHash64. */
  def subsampleFast(
      df: DataFrame, itemCol: Column, occKey: Column,
      t: Double = 1e-4, salt: String = "ss"): DataFrame = {
    val dim = thresholds(df, itemCol, t)
    val u = shiftrightunsigned(
      xxhash64(concat(occKey.cast("string"), lit(":" + salt))), 32)
    df.join(dim, itemCol === col("__item"))
      .filter(col("keep_thr") === lit(Scale) || u < col("keep_thr"))
      .drop("__item")
  }

  /** `(__item, item_count, keep_thr)` vocabulary dimension shared by
    * both draw families — keep_thr = min(floor(P_keep · 2³²), 2³²). */
  private def thresholds(
      df: DataFrame, itemCol: Column, t: Double): DataFrame = {
    require(t > 0 && t < 1, s"t must be in (0,1), got $t")
    val counts = df.groupBy(itemCol.as("__item"))
      .agg(count(lit(1)).as("item_count"))
    val total = counts.agg(sum(col("item_count")).as("n"))
      .select(col("n").cast("double")).collect()(0).getDouble(0)
    // P_keep in the exact operand order the scaladoc promises:
    // sqrt(t*N/c) + t*N/c, every step double-typed
    val tn = lit(t) * lit(total)
    val keepP = sqrt(tn / col("item_count").cast("double")) +
      tn / col("item_count").cast("double")
    counts.withColumn("keep_thr",
      least(floor(keepP * lit(Scale.toDouble)).cast("long"), lit(Scale)))
  }
}
