package graft.api

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine._

/** Request dispatch — the engine's API surface, mirroring the reference's
  * query_map.py:45-96 (name → handler) and request_queries.json (name →
  * params): a stat request names a query family, an entity, and a stats
  * range; the handler resolves the range against the data's high-water
  * mark and runs the matching provider through the incremental engine.
  */
final class Dispatch(spark: SparkSession, store: ListenStore, engine: IncrementalStatsEngine) {

  /** A parsed stat request (the JSON request body's fields). */
  final case class StatRequest(
      query: String, entity: String = "artists",
      statsRange: String = "all_time", onlyInc: Boolean = false)

  private def entityProvider(entity: String, top: Int): StatsProvider =
    entity match {
      case "artists" => UserArtistStats(top)
      case other => TopEntityStats("user_id", Seq(other), top)
    }

  private def anchor(): Timestamp = {
    val row = store.baseListens.unionByName(store.incrementalListens)
      .agg(max(col("listened_at"))).collect()(0)
    Option(row.getTimestamp(0))
      .getOrElse(new Timestamp(System.currentTimeMillis()))
  }

  /** Resolve and run a request; returns the result frame. Families mirror
    * query_map.py: stats.* run through the incremental engine with cached
    * partials; popularity/similarity/playlist jobs run directly over the
    * windowed listens (as the reference's non-stats jobs do). */
  def handle(req: StatRequest): DataFrame = {
    val (from, to) = StatsRange.window(req.statsRange, anchor())
    def windowed: DataFrame = store.listens(from, to)
    req.query match {
      case "stats.user.entity" =>
        engine.run(s"user_${req.entity}_${req.statsRange}",
          entityProvider(req.entity, top = 1000), store, from, to, req.onlyInc)
      case "stats.user.artist_evolution" =>
        engine.run(s"artist_evolution_${req.statsRange}",
          ArtistEvolutionStats(), store, from, to)
      case "stats.user.daily_activity" =>
        engine.run(s"daily_activity_${req.statsRange}",
          DailyActivityStats("user_id", "listened_at"), store, from, to)
      case "stats.user.listening_activity" =>
        ListeningActivity.compute(
          windowed, "user_id", "listened_at", req.statsRange, anchor())
      case "stats.sitewide.entity" =>
        engine.run(s"sitewide_${req.entity}_${req.statsRange}",
          SitewideEntityStats("user_id", Seq(req.entity)), store, from, to)
      case "stats.listener.entity" =>
        engine.run(s"listener_${req.entity}_${req.statsRange}",
          ListenerStats("user_id", Seq(req.entity)), store, from, to)
      case "datasets.missing_mb_data" =>
        MissingMbData(windowed)
      case "popularity.entity" =>
        graft.popularity.Popularity.entity(
          windowed, "user_id", Seq(req.entity))
      case "similarity.sessions" =>
        graft.similarity.SessionSimilarity(
          windowed, "user_id", "listened_at", req.entity,
          gapSeconds = 1800L, perUserCap = 10L, minScore = 2L, topK = 1000)
      case "playlists.periodic_jams" =>
        // feedback comes from the store's cache; empty when never written
        val feedbackSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("user_id",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField(req.entity,
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("score",
            org.apache.spark.sql.types.IntegerType)))
        graft.playlists.Playlists.periodicJams(
          windowed, store.feedback(feedbackSchema), "user_id", req.entity,
          maxPerPlaylist = 50, seed = 42L)
      case other =>
        throw new IllegalArgumentException(s"unknown query: $other")
    }
  }
}
