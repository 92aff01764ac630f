package graft.playlists

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Playlist generation (reference troi/periodic_jams.py and the YIM
  * playlist family):
  *
  *   - [[periodicJams]] — each user's top entities over a recent window,
  *     minus anything they marked hated (feedback = -1, an anti join),
  *     shuffled with a seeded rank-over-random (the reference's ORDER BY
  *     RANDOM(), W10 — seeded here so tests are deterministic), capped per
  *     playlist.
  *   - [[topDiscoveries]] — entities first listened inside the target year
  *     with enough plays (the HAVING min(listened_at) pattern of
  *     top_discoveries.py:83-84).
  */
object Playlists {

  /** @param feedback (userCol, entityCol, score) with score == -1 for hated */
  def periodicJams(
      listens: DataFrame, feedback: DataFrame,
      userCol: String, entityCol: String,
      maxPerPlaylist: Int, seed: Long): DataFrame = {
    val wShuffle = Window.partitionBy(col(userCol)).orderBy(rand(seed))
    jamsWithShuffle(listens, feedback, userCol, entityCol, maxPerPlaylist,
      wShuffle, pinPartitions = true)
  }

  /** [[periodicJams]] with a CALLER-SUPPLIED shuffle ordering — a
    * deterministic hash key makes the whole playlist cross-engine
    * reproducible (the oracled q113 path); seeded `rand` keeps the
    * reference's RANDOM() character. */
  def periodicJamsDeterministic(
      listens: DataFrame, feedback: DataFrame,
      userCol: String, entityCol: String,
      maxPerPlaylist: Int, shuffleKey: Column): DataFrame =
    jamsWithShuffle(listens, feedback, userCol, entityCol, maxPerPlaylist,
      Window.partitionBy(col(userCol)).orderBy(shuffleKey),
      pinPartitions = false)

  private def jamsWithShuffle(
      listens: DataFrame, feedback: DataFrame,
      userCol: String, entityCol: String, maxPerPlaylist: Int,
      wShuffle: org.apache.spark.sql.expressions.WindowSpec,
      pinPartitions: Boolean): DataFrame = {
    val hated = feedback.filter(col("score") === -1)
      .select(col(userCol), col(entityCol))
    val counts = listens
      .join(hated, Seq(userCol, entityCol), "left_anti")
      .groupBy(col(userCol), col(entityCol))
      .agg(count(lit(1)).as("listen_count"))
    val base = // pin RNG streams to partitions for the seeded-rand path
      if (pinPartitions) counts.repartition(col(userCol)) else counts
    base
      .withColumn("position", row_number().over(wShuffle))
      .filter(col("position") <= maxPerPlaylist)
  }

  /** Entities whose FIRST listen falls inside [yearStart, yearEnd) and
    * that accumulated at least minPlays overall. */
  def topDiscoveries(
      listens: DataFrame, userCol: String, entityCol: String, tsCol: String,
      yearStart: String, yearEnd: String, minPlays: Long, top: Int): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("play_count").desc, col(entityCol))
    listens
      .groupBy(col(userCol), col(entityCol))
      .agg(min(col(tsCol)).as("first_listen"),
        count(lit(1)).as("play_count"))
      .filter(col("first_listen") >= lit(yearStart).cast("timestamp") &&
        col("first_listen") < lit(yearEnd).cast("timestamp") &&
        col("play_count") >= minPlays)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= top)
  }
}
