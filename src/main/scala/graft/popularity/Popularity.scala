package graft.popularity

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Popularity datasets (reference popularity/common.py: entity popularity =
  * total listen count + exact unique listener count per entity; per-artist
  * variants group by (artist, entity)).
  *
  * Scale: one hash aggregation keyed by the entity; `countDistinct(user)`
  * plans as a two-stage exact distinct (partial per entity+user, then
  * merge) — the same shape the reference runs over the 27B-listen MLHD
  * dataset chunk-wise.
  */
object Popularity {

  /** (entityCols…, total_listen_count, total_user_count). */
  def entity(listens: DataFrame, userCol: String, entityCols: Seq[String]): DataFrame =
    listens
      .groupBy(entityCols.map(col): _*)
      .agg(
        count(lit(1)).as("total_listen_count"),
        countDistinct(col(userCol)).as("total_user_count"))

  /** Top-k entities within each group (the per-artist popularity shape:
    * groupCols = artist, entityCols = recording/release). */
  def perGroup(
      listens: DataFrame, userCol: String,
      groupCols: Seq[String], entityCols: Seq[String], top: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("total_listen_count").desc +: entityCols.map(col): _*)
    listens
      .groupBy((groupCols ++ entityCols).map(col): _*)
      .agg(
        count(lit(1)).as("total_listen_count"),
        countDistinct(col(userCol)).as("total_user_count"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= top)
  }

  /** [[graft.engine.StatsProvider]] form of [[entity]], giving popularity
    * the engine's aggregate/combine/stats contract so it can run through
    * [[graft.engine.ChunkedRunner]] — the reference's MLHD popularity
    * path (popularity/main.py:15-29 routes `mlhd=True` to MlhdStatsEngine,
    * mlhd.py:19-60, the partial-aggregate engine over the 27B-listen
    * corpus).
    *
    * `combine` is ADDITIVE in both counts, exactly like the reference's
    * combine query (popularity/listens.py:57-76 sums total_listen_count
    * and total_user_count across partials). Summed listener counts are
    * EXACT when partials partition by user — the MLHD chunk layout,
    * where each user lives in exactly one hex-prefix chunk — and match
    * the reference's (over-counting) semantics when partials slice by
    * time and a listener spans slices.
    */
  final case class PopularityStats(userCol: String, entityCols: Seq[String])
      extends graft.engine.StatsProvider {
    def filterKeys: Seq[String] = entityCols
    def aggregate(listens: DataFrame): DataFrame =
      entity(listens, userCol, entityCols)
    def combine(partials: DataFrame): DataFrame =
      partials.groupBy(entityCols.map(col): _*)
        .agg(sum(col("total_listen_count")).as("total_listen_count"),
          sum(col("total_user_count")).as("total_user_count"))
    def stats(partial: DataFrame): DataFrame = partial
  }

  /** Approximate variant for the regime where exact distinct is the
    * bottleneck (the reference's MLHD popularity over 27B listens):
    * HyperLogLog++ (`approx_count_distinct`) replaces the exact two-stage
    * distinct — one pass, a fixed-size mergeable sketch per entity, so the
    * shuffle carries sketches instead of (entity, user) pairs. `rsd` is
    * the standard deviation bound (Spark default 5%); exact stays the
    * oracled path (q76-q78), this is the documented scale escape hatch. */
  def entityApprox(
      listens: DataFrame, userCol: String, entityCols: Seq[String],
      rsd: Double = 0.05): DataFrame =
    listens
      .groupBy(entityCols.map(col): _*)
      .agg(
        count(lit(1)).as("total_listen_count"),
        approx_count_distinct(col(userCol), rsd).as("approx_user_count"))
}
