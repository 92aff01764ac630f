package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic balanced shard assignment — the workload-planning
  * primitive (route N weighted items onto B workers/shards so loads
  * come out even) as a pure DataFrame program: items rank by
  * descending size and snake across the bins
  * (`0,1,…,B−1,B−1,…,1,0,0,1,…` — boustrophedon), the classic
  * greedy-quality layout that is ORDER-DERIVED rather than
  * state-derived, so unlike true greedy/LPT (inherently sequential)
  * it distributes and replays exactly. Every round of 2B consecutive
  * ranks gives each bin exactly two items whose sizes bracket each
  * other, which is what keeps loads within an item of each other on
  * descending input.
  *
  * Rank assignment never plans a global window: the cross-size rank
  * base comes from a [[PrefixSum.runningTotal]] range exchange over
  * per-size counts (distinct sizes on the wire), and the within-size
  * offset from a window PARTITIONED by size (md5-then-id order —
  * seeded, engine-replayable). Pure integer algebra end to end.
  */
object ShardPlan {

  /** `(id, size, rank, bin)` — rank 1-based over (size desc, md5(id),
    * id); `bin` ∈ [0, bins) by the snake rule.
    *
    * @param bins number of shards B, >= 1
    */
  def assign(
      df: DataFrame, id: Column, size: Column, bins: Int,
      salt: String = "shard"): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val d = df.select(id.as("id"), size.cast("long").as("size"))
      .withColumn("ord",
        md5(concat(col("id").cast("string"), lit(s":$salt"))))
    val perSize = d.groupBy(col("size")).agg(count(lit(1)).as("cnt"))
    // cum over DESCENDING size: larger sizes rank first
    val cum = PrefixSum.runningTotal(perSize,
      Seq(col("size").desc), col("cnt"), out = "cum")
    val base = cum.select(col("size"),
      (col("cum") - col("cnt")).as("rank_base"))
    val withRank = d
      .join(base, Seq("size"))
      .withColumn("rank", col("rank_base") + row_number().over(
        Window.partitionBy(col("size"))
          .orderBy(col("ord"), col("id"))))
    val b = bins.toLong
    withRank
      .withColumn("r0", pmod(col("rank") - 1L, lit(2L * b)))
      .withColumn("bin",
        when(col("r0") < b, col("r0")).otherwise(lit(2L * b - 1L) - col("r0")))
      .select(col("id"), col("size"), col("rank"), col("bin"))
  }
}
