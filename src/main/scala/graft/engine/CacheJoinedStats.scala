package graft.engine

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stat families that enrich listens through a dimension cache before
  * aggregating — the genre/era activity pattern (reference
  * stats/incremental/user/genre_activity.py, era_activity.py): caches are
  * parquet snapshots imported from the metadata database (see
  * graft.ingest.JdbcCache), joined by mbid at aggregation time.
  *
  * Scale: caches are entity-keyed and orders of magnitude smaller than the
  * fact table, but recording/release-keyed caches are NOT guaranteed to
  * fit a broadcast at catalog scale — so the join is left declarative and
  * Catalyst picks broadcast under autoBroadcastJoinThreshold, shuffle
  * hash/sort-merge beyond it (locally these caches always broadcast; the
  * plan degrades gracefully instead of OOMing the driver at 100 TB). The
  * join key (recording/release mbid) is uniform, so no skew handling is
  * needed. The cache join lives INSIDE aggregate(), so
  * the partial/combine algebra still holds as long as the cache snapshot
  * is fixed for a stat run (the reference pins cache imports the same way).
  */
object CacheJoinedStats {

  /** Per-user genre listening: join the (recording_mbid, genre) cache —
    * inner join, so unmapped/untagged listens drop out (the reference's
    * genre stats behave the same) — then top-k genres per user. */
  final case class GenreActivity(genreCache: DataFrame, top: Int = 20)
    extends StatsProvider {
    override def filterKeys: Seq[String] = Seq("user_id")

    override def aggregate(listens: DataFrame): DataFrame =
      listens
        .join(genreCache.select(col("recording_mbid"), col("genre")),
          Seq("recording_mbid"))
        .groupBy(col("user_id"), col("genre"))
        .agg(count(lit(1)).as("listen_count"))

    override def combine(partials: DataFrame): DataFrame =
      partials.groupBy(col("user_id"), col("genre"))
        .agg(sum(col("listen_count")).as("listen_count"))

    override def stats(partial: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("listen_count").desc, col("genre"))
      partial.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= top)
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(struct(col("listen_count"), col("genre"))),
          asc = false).as("genres"))
    }
  }

  /** Per-user era activity: left join the release cache for the release
    * year — LEFT, so listens with no release mapping are retained under a
    * null year (the explode_outer-keeps-unmapped semantic) — then listen
    * counts per (user, year). */
  final case class EraActivity(releaseCache: DataFrame)
    extends StatsProvider {
    override def filterKeys: Seq[String] = Seq("user_id")

    override def aggregate(listens: DataFrame): DataFrame =
      listens
        .join(releaseCache.select(col("release_mbid"),
          col("first_release_date_year")),
          Seq("release_mbid"), "left")
        .groupBy(col("user_id"),
          col("first_release_date_year").as("year"))
        .agg(count(lit(1)).as("listen_count"))

    override def combine(partials: DataFrame): DataFrame =
      partials.groupBy(col("user_id"), col("year"))
        .agg(sum(col("listen_count")).as("listen_count"))

    override def stats(partial: DataFrame): DataFrame = partial
  }

  /** Era activity through the two-hop metadata chain (reference
    * stats/incremental/user/era_activity.py:27-45): listen → release →
    * release group → first_release_date_year, keeping only dated years
    * >= 1800 (the reference's bad-metadata floor). Left joins feed the
    * year filter exactly as the reference writes it; the filter then makes
    * them effectively inner, and Catalyst rewrites them so — the declared
    * plan stays faithful while the executed plan is the cheap one.
    *
    * releaseCache: (release_mbid, release_group_mbid);
    * releaseGroupCache: (release_group_mbid, first_release_date_year). */
  final case class EraActivityChained(
      releaseCache: DataFrame, releaseGroupCache: DataFrame)
    extends StatsProvider {
    override def filterKeys: Seq[String] = Seq("user_id")

    override def aggregate(listens: DataFrame): DataFrame =
      listens
        .join(releaseCache.select(col("release_mbid"),
          col("release_group_mbid")), Seq("release_mbid"), "left")
        .join(releaseGroupCache.select(col("release_group_mbid"),
          col("first_release_date_year")),
          Seq("release_group_mbid"), "left")
        .filter(col("first_release_date_year").isNotNull &&
          col("first_release_date_year") >= 1800)
        .groupBy(col("user_id"), col("first_release_date_year").as("year"))
        .agg(count(lit(1)).as("listen_count"))

    override def combine(partials: DataFrame): DataFrame =
      partials.groupBy(col("user_id"), col("year"))
        .agg(sum(col("listen_count")).as("listen_count"))

    /** Nested (year, listen_count) ascending, the reference's
      * SORT_ARRAY(COLLECT_LIST(STRUCT(year, listen_count))). */
    override def stats(partial: DataFrame): DataFrame =
      partial.groupBy(col("user_id"))
        .agg(sort_array(collect_list(struct(col("year"),
          col("listen_count")))).as("era_activity"))
  }

  /** Total listening time per user: track lengths from the
    * recording-length cache, missing metadata defaulting to 180 s — the
    * reference's default-track-length constant (similarity/recording/
    * common.py:17, year_in_music/listening_time.py:22; BASELINE.md). */
  final case class ListeningTime(recordingLengthCache: DataFrame)
    extends StatsProvider {
    override def filterKeys: Seq[String] = Seq("user_id")

    override def aggregate(listens: DataFrame): DataFrame =
      listens
        .join(recordingLengthCache.select(col("recording_mbid"),
          col("length")),
          Seq("recording_mbid"), "left")
        .groupBy(col("user_id"))
        .agg(sum(coalesce(col("length") / 1000, lit(180L)).cast("long"))
          .as("listening_time_s"),
          count(lit(1)).as("listen_count"))

    override def combine(partials: DataFrame): DataFrame =
      partials.groupBy(col("user_id"))
        .agg(sum(col("listening_time_s")).as("listening_time_s"),
          sum(col("listen_count")).as("listen_count"))

    override def stats(partial: DataFrame): DataFrame = partial
  }

  /** Artist origin map: listener counts per country through the
    * artist→country cache (reference stats/user/artist_map.py shape). */
  final case class ArtistMap(countryCache: DataFrame)
    extends StatsProvider {
    override def filterKeys: Seq[String] = Seq("user_id")

    override def aggregate(listens: DataFrame): DataFrame =
      listens
        .select(col("user_id"),
          explode_outer(col("artist_credit_mbids")).as("artist_mbid"))
        // artist-keyed: genuinely small, but the same let-Catalyst-pick
        // rule applies (it broadcasts under the threshold anyway)
        .join(countryCache.select(col("artist_mbid"),
          col("country_code")),
          Seq("artist_mbid"))
        .groupBy(col("user_id"), col("country_code"))
        .agg(count(lit(1)).as("listen_count"))

    override def combine(partials: DataFrame): DataFrame =
      partials.groupBy(col("user_id"), col("country_code"))
        .agg(sum(col("listen_count")).as("listen_count"))

    override def stats(partial: DataFrame): DataFrame = partial
  }
}
