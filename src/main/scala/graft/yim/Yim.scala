package graft.yim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Year-in-Music stat family (reference year_in_music modules) — the yearly
  * retrospective jobs. Each function is the data flow of one query_map
  * entry, parameterized over the listen/cache frames instead of fixed HDFS
  * paths; Dispatch wires them to the store.
  *
  * Determinism: where the reference orders by RANDOM() (playlist shuffle),
  * these take a deterministic shuffle key expression so results are
  * reproducible and oracle-verifiable; where it relies on implicit
  * first-wins ordering, ties are broken on the entity key.
  */
object Yim {

  /** Top genres per user (top_genres.py:29-62): a three-source priority
    * union — recording genres (1) beat release-group genres (2) beat
    * artist genres (3) for the same (user, recording, genre) — then genre
    * counts summed per user, a share-of-user percentage, and the top-k by
    * count kept as a desc-sorted nested list.
    *
    * Each genre source: (recording_mbid, genre, genre_count).
    * Listens: (user_id, recording_mbid).
    * Output: (user_id, data: array<struct<genre_count, genre,
    * genre_count_ppm>>) — share snapped to ppm for cross-engine hashing.
    */
  def topGenres(
      listens: DataFrame, recordingGenres: DataFrame,
      releaseGroupGenres: DataFrame, artistGenres: DataFrame,
      topN: Int = 25): DataFrame = {
    // The priority winner for a (recording, genre) pair is the same for
    // every user — the reference's per-(user, recording, genre) dedup
    // (top_genres.py:43-49) factors through the dimension side. Resolving
    // it on the genre caches BEFORE touching listens turns three
    // fact-table joins + a fact-sized row_number window into one
    // cache-sized window + a single join: at 100 TB the window input drops
    // from |listens ⋈ genres| to |genre caches|.
    def tagged(genres: DataFrame, priority: Int): DataFrame =
      genres.select(col("recording_mbid"), col("genre"),
        col("genre_count"), lit(priority).as("priority"))
    val byPriority = Window
      .partitionBy(col("recording_mbid"), col("genre"))
      .orderBy(col("priority"))
    val resolved = tagged(recordingGenres, 1)
      .unionByName(tagged(releaseGroupGenres, 2))
      .unionByName(tagged(artistGenres, 3))
      .withColumn("rn", row_number().over(byPriority))
      .filter(col("rn") === 1)
      .select(col("recording_mbid"), col("genre"), col("genre_count"))
    // one genre contribution per (user, recording) regardless of listen
    // multiplicity — the reference's rn=1 collapses repeat listens too;
    // distinct's map-side partial dedup replaces the fact-sized window
    val together = listens.filter(col("recording_mbid").isNotNull)
      .select(col("user_id"), col("recording_mbid")).distinct()
      .join(resolved, Seq("recording_mbid"))
      .groupBy(col("user_id"), col("genre"))
      .agg(sum(col("genre_count")).as("genre_count"))
    val byUser = Window.partitionBy(col("user_id"))
    val ranked = together
      .withColumn("genre_count_ppm",
        round(col("genre_count") * 1000000.0 /
          sum(col("genre_count")).over(byUser)).cast("long"))
      .withColumn("ranking",
        rank().over(byUser.orderBy(col("genre_count").desc)))
      .filter(col("ranking") <= topN)
    ranked
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(
        col("genre_count"), col("genre"), col("genre_count_ppm"))),
        asc = false).as("data"))
  }

  /** Most-listened release year per user (most_listened_year.py:40-44):
    * listen counts grouped by the release's first-release year, emitted as
    * a year→count map. Years come from a release-metadata cache
    * (release_mbid, first_release_date_year); unmapped/undated releases
    * drop out, matching the reference's WHERE year IS NOT NULL. */
  def mostListenedYear(listens: DataFrame, releaseYears: DataFrame): DataFrame =
    listens
      .join(releaseYears, Seq("release_mbid"))
      .filter(col("first_release_date_year").isNotNull)
      .groupBy(col("user_id"),
        col("first_release_date_year").as("year"))
      .agg(count(lit(1)).as("listen_count"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("year"), col("listen_count"))))).as("data"))

  /** Yearly listen count for every user as one map row
    * (listen_count.py:16-31). */
  def listenCount(listens: DataFrame): DataFrame =
    listens
      .groupBy(col("user_id"))
      .agg(count(col("listened_at")).as("listen_count"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("user_id"), col("listen_count")))))
        .as("yearly_listen_counts"))

  /** Top-k similar users per user from exact sparse cosine over play
    * counts (similar_users.py:9-20 via similarity/user.py): pairs expanded
    * symmetrically, ranked per user by similarity. Output: (user_id,
    * similar_users: array<struct<other_user_id, similarity>>). */
  def similarUsers(
      listens: DataFrame, userCol: String, itemCol: String,
      k: Int = 25, maxItemListeners: Option[Long] = None,
      pairChunks: Int = graft.similarity.ChunkedPairs.Auto,
      tau: Option[Double] = None): DataFrame = {
    // the co-listen pair space is the engine's largest single working
    // set. tau = None: exactTopK runs it through ChunkedPairs with
    // per-chunk top-k pushdown (hierarchical top-k — exact over ALL
    // pairs), so neither the pair set nor its global sort ever
    // materializes: the 4 GiB probe shape. tau = Some(τ): the
    // production-scale dispatch route — a normalized-counts
    // ChunkedPairs sweep finds the pairs with cosine ≥ τ (the τ
    // filter runs INSIDE each chunk job, so partials hold only
    // would-be-kept pairs; deterministic, no sampling — DIMSUM's
    // magnitude cutoff prunes nothing at this corpus shape, see
    // UserCosine.dimsumTopK's scaladoc for the measured cliff) and
    // integer-dot recovery scores the found pairs bit-identically to
    // the exact path; neighbors below τ are dropped by contract.
    val topk = tau match {
      case Some(t) => graft.similarity.UserCosine
        .dimsumTopK(listens, userCol, itemCol, k, t)
      case None => graft.similarity.UserCosine
        .exactTopK(listens, userCol, itemCol, k, maxItemListeners,
          pairChunks)
    }
    topk
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(
        col("similarity"), col("other_user_id"))), asc = false)
        .as("similar_users"))
  }

  /** Tracks-of-the-year scoring (top_discoveries.py:72-88): per-user play
    * counts of recordings FIRST listened in the target year, keeping
    * counts > minPlays. */
  def tracksOfYear(listens: DataFrame, year: Int, minPlays: Int = 3): DataFrame =
    listens
      .filter(col("recording_mbid").isNotNull)
      .groupBy(col("user_id"), col("recording_mbid"))
      .agg(count(lit(1)).as("score"), min(col("listened_at")).as("first_at"))
      .filter(org.apache.spark.sql.functions.year(col("first_at")) === year &&
        col("score") > minPlays)
      .drop("first_at")

  /** Artist-capped playlist selection shared by top_discoveries and
    * top_missed_recordings (top_discoveries.py:19-48): explode each
    * scored recording's artists, keep each recording only while its
    * artists have < maxPerArtist better-scored picks, dedupe recordings,
    * then cut the playlist with a shuffle ranking — deterministic here via
    * `shuffleKey` where the reference uses RANDOM().
    *
    * scored: (user_id, recording_mbid, score);
    * recordingArtists: (recording_mbid, artist_mbids: array<string-like>).
    */
  def artistCappedPlaylist(
      scored: DataFrame, recordingArtists: DataFrame,
      shuffleKey: Column, maxPerArtist: Int = 2,
      maxTracks: Int = 50): DataFrame = {
    val exploded = scored
      .join(recordingArtists, Seq("recording_mbid"))
      .select(col("user_id"), col("recording_mbid"), col("score"),
        explode(col("artist_mbids")).as("artist_mbid"))
    val perArtist = Window
      .partitionBy(col("user_id"), col("artist_mbid"))
      .orderBy(col("score").desc, col("recording_mbid"))
    val limited = exploded
      .withColumn("per_artist_position", rank().over(perArtist))
      .filter(col("per_artist_position") <= maxPerArtist)
      .groupBy(col("user_id"), col("recording_mbid"))
      .agg(count(lit(1)).as("_dup"))
      .withColumn("ranking", rank().over(
        Window.partitionBy(col("user_id")).orderBy(shuffleKey)))
      .filter(col("ranking") <= maxTracks)
    limited
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("recording_mbid"))).as("recordings"))
  }

  /** Top missed recordings (top_missed_recordings.py:43-103): score each
    * recording by how many of the user's similar users listened to it in
    * the window, drop recordings the user already knows (anti join on the
    * user's own listens), keep the global top-k per user, then apply the
    * artist-capped playlist cut and attach the similar-user list. Scoring
    * counts only listens at/after `scoreFrom` (the reference's
    * time_filter); the anti join retracts against the FULL history.
    *
    * similarUsers: (user_id, other_user_id). */
  def topMissedRecordings(
      listens: DataFrame, similarUsers: DataFrame,
      recordingArtists: DataFrame, shuffleKey: Column,
      scoreFrom: java.sql.Timestamp,
      topTracks: Int = 200): DataFrame = {
    val intermediate = similarUsers
      .join(listens.select(col("user_id").as("other_user_id"),
        col("recording_mbid"), col("listened_at")), Seq("other_user_id"))
      .filter(col("recording_mbid").isNotNull &&
        col("listened_at") >= lit(scoreFrom))
      .groupBy(col("user_id"), col("recording_mbid"))
      .agg(count(lit(1)).as("score"))
    val unheard = intermediate.join(
      listens.select(col("user_id"), col("recording_mbid")),
      Seq("user_id", "recording_mbid"), "left_anti")
    val topk = unheard
      .withColumn("ranking", rank().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("score").desc, col("recording_mbid"))))
      .filter(col("ranking") <= topTracks)
      .drop("ranking")
    val playlists = artistCappedPlaylist(
      topk, recordingArtists, shuffleKey)
    playlists.join(
      similarUsers.groupBy(col("user_id"))
        .agg(sort_array(collect_list(col("other_user_id")))
          .as("similar_users")),
      Seq("user_id"))
  }

  /** Most-active weekday per user (day_of_week.py): argmax over per-day
    * counts, tie-broken deterministically via the struct-max pattern. */
  def dayOfWeek(listens: DataFrame): DataFrame =
    listens
      .groupBy(col("user_id"),
        date_format(col("listened_at"), "EEEE").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(max(struct(col("cnt"), col("day"))).as("best"))
      .select(col("user_id"), col("best.day").as("day_of_week"))

  /** Count of artists FIRST listened inside [from, to) per user
    * (new_artists_discovered.py:29-40: HAVING on min(listened_at)). */
  def newArtistsDiscovered(
      listens: DataFrame, from: java.sql.Timestamp,
      to: java.sql.Timestamp): DataFrame =
    listens
      .select(col("user_id"), col("listened_at"),
        explode_outer(col("artist_credit_mbids")).as("artist_mbid"))
      .filter(col("artist_mbid").isNotNull)
      .groupBy(col("user_id"), col("artist_mbid"))
      .agg(min(col("listened_at")).as("first_listen"))
      .filter(col("first_listen") >= lit(from) && col("first_listen") < lit(to))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("new_artists_discovered"))

  /** New releases by each user's top artists
    * (new_releases_of_top_artists.py:39-42 — the reference's documented
    * 90× rewrite: EQUI-join on the exploded artist mbid, never
    * arrays_overlap/BNLJ): top-k artists per user by listen count, matched
    * to releases in the window via the release's exploded artist credits.
    *
    * releases: (release_mbid, release_name, artist_credit_mbids). */
  def newReleasesOfTopArtists(
      listens: DataFrame, releases: DataFrame, topArtists: Int = 50): DataFrame = {
    val counts = listens
      .filter(col("artist_credit_mbids").isNotNull)
      .groupBy(col("user_id"), col("artist_credit_mbids"))
      .agg(count(lit(1)).as("listen_count"))
    val top = counts
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("user_id"))
        .orderBy(col("listen_count").desc, col("artist_credit_mbids"))))
      .filter(col("rn") <= topArtists)
      .select(col("user_id"),
        explode(col("artist_credit_mbids")).as("artist_mbid"))
      .distinct()
    val released = releases
      .select(col("release_mbid"), col("release_name"),
        explode(col("artist_credit_mbids")).as("artist_mbid"))
    top.join(released, Seq("artist_mbid")) // equi-join on the credit key
      .groupBy(col("user_id"), col("release_mbid"))
      .agg(first(col("release_name")).as("release_name"))
  }

  /** Genre activity by hour (genre_activity.py:31-66): listen counts per
    * (user, genre, hour-of-day) through the genre cache, top-k genres per
    * (user, hour), nested per user. genres: (recording_mbid, genre). */
  def genreHourActivity(
      listens: DataFrame, genres: DataFrame,
      topPerHour: Int = 10): DataFrame = {
    val counts = listens
      .join(genres, Seq("recording_mbid"), "left")
      .filter(col("genre").isNotNull)
      .groupBy(col("user_id"), col("genre"),
        hour(col("listened_at")).as("hour"))
      .agg(count(lit(1)).as("listen_count"))
    val w = Window.partitionBy(col("user_id"), col("hour"))
      .orderBy(col("listen_count").desc, col("genre"))
    counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topPerHour)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(
        col("genre"), col("hour"), col("listen_count")))).as("data"))
  }
}
