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
