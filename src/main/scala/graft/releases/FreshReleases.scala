package graft.releases

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fresh releases per user (reference fresh_releases/fresh_releases.py:
  * 44-120): a user cares about a recently- or soon-to-be-released record
  * if they listened to one of its credited artists recently; how much
  * they listened is the match's CONFIDENCE.
  *
  *   - the listens side is windowed to the `days` before the anchor
  *     (main():118-123 — from_date = to_date - days, else all history);
  *   - the release list is windowed to DATED releases within ±`days` of
  *     the anchor — the reference's release feed is already limited to
  *     such a window (its days=90 endpoint spans past and future release
  *     dates), so here the window is an explicit operator knob, with
  *     `is_future` exposing which side of the anchor a release falls on;
  *   - both sides explode their artist-mbid arrays and match by EQUI-join
  *     on the single mbid (get_query():46-72) — never arrays_overlap;
  *   - confidence = exploded-listen count per (user, release)
  *     (get_query():55-71), thresholded (:113);
  *   - per user the releases nest sorted by confidence descending
  *     (the array_sort comparator of get_query():88-109).
  */
object FreshReleases {

  /** Flat (user_id, release_mbid, release_name, release_date, is_future,
    * confidence) — the pre-nesting shape, deterministically orderable and
    * therefore the oracle surface. `releases` needs (release_mbid,
    * release_name, `artistCol`: array<string>) and, when `days` is set, a
    * `release_date` timestamp column; an undated list passes through
    * un-windowed with is_future = false. */
  def forUsers(
      listens: DataFrame, releases: DataFrame,
      anchor: Timestamp, days: Option[Int], threshold: Long,
      artistCol: String = "artist_mbids"): DataFrame = {
    val dated = releases.columns.contains("release_date")
    val windowedListens = days match {
      case Some(d) =>
        val from = Timestamp.valueOf(anchor.toLocalDateTime.minusDays(d))
        listens.filter(col("listened_at") >= lit(from) &&
          col("listened_at") <= lit(anchor))
      case None => listens
    }
    val windowedReleases = (days, dated) match {
      case (Some(d), true) =>
        val from = Timestamp.valueOf(anchor.toLocalDateTime.minusDays(d))
        val to = Timestamp.valueOf(anchor.toLocalDateTime.plusDays(d))
        releases.filter(col("release_date").isNotNull &&
          col("release_date") >= lit(from) && col("release_date") <= lit(to))
      case _ => releases
    }
    val futureFlag: Column =
      if (dated) col("release_date") > lit(anchor) else lit(false)

    // pre-aggregate per (user, artist) BEFORE the release join: the
    // reference counts raw exploded-listen × release join rows
    // (get_query():55-71), which fans every listen out once per matching
    // release; summing per-artist counts after the join is the same
    // algebra with the join input shrunk from |listens| to |user×artist|
    // and the post-join aggregate shrunk to the output size
    val artistCounts = windowedListens
      .filter(col("artist_credit_mbids").isNotNull)
      .select(col("user_id"),
        explode(col("artist_credit_mbids")).as("artist_mbid"))
      .groupBy(col("user_id"), col("artist_mbid"))
      .agg(count(lit(1)).as("artist_listens"))
    val explodedReleases = windowedReleases
      .select(col("release_mbid"), col("release_name"),
        (if (dated) col("release_date")
         else lit(null).cast("timestamp")).as("release_date"),
        futureFlag.as("is_future"),
        explode(col(artistCol)).as("artist_mbid"))

    // The release list is a bounded feed (a days-window of releases),
    // small at any listen scale → broadcast, never a shuffled join on the
    // low-cardinality artist key. Repartitioning the SMALL per-(user,
    // artist) counts by user_id first means hash(user_id) already
    // satisfies the (user, release) grouping distribution, so the join's
    // user×release fan-out — the one big intermediate — aggregates in
    // place and never crosses the wire.
    // explicit partition count: the counts frame is tiny, and AQE would
    // otherwise coalesce it to one partition — serializing the fan-out,
    // which is the expensive part downstream of this exchange
    val parallelism = listens.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    artistCounts.repartition(parallelism, col("user_id"))
      .join(broadcast(explodedReleases), Seq("artist_mbid"))
      .groupBy(col("user_id"), col("release_mbid"), col("release_name"),
        col("release_date"), col("is_future"))
      .agg(sum(col("artist_listens")).as("confidence"))
      .filter(col("confidence") >= threshold)
  }

  /** Nest [[forUsers]] per user, confidence-descending with release_mbid
    * as the deterministic tiebreak (the reference's comparator orders by
    * confidence alone and leaves ties to sort stability). */
  def nested(flat: DataFrame): DataFrame =
    flat
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(
        (-col("confidence")).as("neg_confidence"),
        col("release_mbid"), col("release_name"),
        col("release_date"), col("is_future"),
        col("confidence")))).as("sorted"))
      .select(col("user_id"),
        transform(col("sorted"), x => struct(
          x("release_mbid").as("release_mbid"),
          x("release_name").as("release_name"),
          x("release_date").as("release_date"),
          x("is_future").as("is_future"),
          x("confidence").as("confidence"))).as("releases"))
}
