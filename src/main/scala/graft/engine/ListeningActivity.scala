package graft.engine

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Listening-activity stat: per-user listen counts over a densified
  * time-bucket grid whose granularity depends on the stats range
  * (reference stats/common/listening_activity.py:58-185 — the time-range
  * table generation the survey flags as subtle):
  *
  *   - week / this_week   → one bucket per day (7)
  *   - month / this_month → one bucket per day (28–31)
  *   - quarter            → one bucket per week
  *   - half_yearly        → one bucket per month (6)
  *   - year / this_year   → one bucket per month (12)
  *   - all_time           → one bucket per year
  *
  * Every (user × bucket) cell is present with a zero count when silent —
  * the densification that lets clients chart gaps. The bucket grid is
  * generated from the range window (a handful of rows) and broadcast
  * against the distinct-user frame; counts join on (user, bucket start).
  */
object ListeningActivity {

  private def bucketUnit(range: String): String = range match {
    case "week" | "this_week" | "month" | "this_month" => "day"
    case "quarter" => "week"
    case "half_yearly" | "year" | "this_year" => "month"
    case "all_time" => "year"
    case other => throw new IllegalArgumentException(s"unknown range: $other")
  }

  /** (userCol, bucket_start: timestamp, listen_count) densified. */
  def compute(
      listens: DataFrame, userCol: String, tsCol: String,
      range: String, maxListenedAt: Timestamp): DataFrame = {
    val (from, to) = StatsRange.window(range, maxListenedAt)
    computeWindow(listens, userCol, tsCol, from, to, bucketUnit(range))
  }

  /** Same densified grid over an explicit [from, to) window with an
    * explicit bucket unit — the from/to-selector path that serves YIM
    * listens_per_day (reference year_in_music/listens_per_day.py: the
    * listening-activity entity under a FromTo selector at day
    * granularity). */
  def computeWindow(
      listens: DataFrame, userCol: String, tsCol: String,
      from: Timestamp, to: Timestamp, unit: String): DataFrame = {
    val spark = listens.sparkSession
    val inRange = listens.filter(
      col(tsCol) >= lit(from) && col(tsCol) < lit(to))

    // bucket grid: sequence over the window at the range's granularity;
    // tiny by construction (≤ number of buckets), broadcast everywhere
    val grid = spark.range(1).select(
        explode(sequence(
          lit(from).cast("timestamp"), lit(to).cast("timestamp"),
          expr(s"interval 1 $unit"))).as("bucket_start"))
      .filter(col("bucket_start") < lit(to))
      .select(date_trunc(unit, col("bucket_start")).as("bucket_start"))
      .distinct()

    val users = inRange.select(col(userCol)).distinct()
    val counts = inRange
      .groupBy(col(userCol),
        date_trunc(unit, col(tsCol)).as("bucket_start"))
      .agg(count(lit(1)).as("listen_count"))

    users.crossJoin(broadcast(grid))
      .join(counts, Seq(userCol, "bucket_start"), "left")
      .select(col(userCol), col("bucket_start"),
        coalesce(col("listen_count"), lit(0L)).as("listen_count"))
  }
}
